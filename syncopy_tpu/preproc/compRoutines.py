# -*- coding: utf-8 -*-
#
# Preprocessing compute routines.
#
# Parity target: reference syncopy/preproc/compRoutines.py:26-883.

import numpy as np

import jax.numpy as jnp

from ..engine.routine import ComputationalRoutine
from ..ops.filtering import (
    apply_fir,
    butter_sos,
    design_wsinc,
    downsample,
    hilbert,
    minphaserceps,
    resample_poly,
    _resample_kernel,
)
from ..ops.spectral import detrend, spectral_convert

__all__ = [
    "SincFiltering",
    "ButFiltering",
    "Rectify",
    "Hilbert",
    "Downsample",
    "Resample",
    "Detrending",
    "Standardize",
]


class _PreprocRoutine(ComputationalRoutine):
    """Shared metadata: same-shape AnalogData output, properties carried.

    Filtering/detrending routines report a per-trial ``has_nan`` flag
    through the engine's aux side-channel (reference compRoutines.py:256,
    718 collects the same metadata per worker); the frontend exposes it as
    ``out.info['nan_trials']``."""

    aux_per_trial = frozenset({"has_nan"})

    def extra_cache_key(self):
        # apply_fir/hilbert gate on the filter-GEMM knob at trace time
        from ..ops.filtering import filter_gemm_fingerprint

        return filter_gemm_fingerprint()

    @staticmethod
    def _nan_info(trial):
        return {"has_nan": jnp.any(jnp.isnan(trial))}

    def process_metadata(self, data, out):
        sel = self.selector
        if self.keeptrials:
            out.trialdefinition = np.array(sel.trialdefinition)
        else:
            out.trialdefinition = np.array(sel.trialdefinition[:1])
        out.samplerate = data.samplerate
        self.propagate_properties(data, out)


class SincFiltering(_PreprocRoutine):
    """FIR windowed-sinc filtering (reference compRoutines.py:26-172;
    kernel firws.py). Direction 'twopass' runs forward+reverse passes for
    zero phase; 'onepass-minphase' uses the causal minimum-phase kernel."""

    valid_kws = ["filter_class", "filter_type", "freq", "order", "direction",
                 "window", "polyremoval"]

    def __init__(self, samplerate=1.0, filter_type="lp", freq=None, order=1000,
                 direction="twopass", window="hamming", polyremoval=None):
        f_c = np.asarray(freq, dtype=float) / samplerate
        if f_c.size == 1:
            f_c = float(f_c)
        kernel = design_wsinc(window, int(order), f_c, filter_type)
        if direction == "onepass-minphase":
            kernel = minphaserceps(kernel)
        super().__init__(
            samplerate=samplerate, kernel=kernel, direction=direction,
            polyremoval=polyremoval,
        )

    def process_single_trial(self, trial, **cfg):
        x = detrend(trial.astype(jnp.float32), cfg["polyremoval"], axis=0)
        kernel = cfg["kernel"]
        if cfg["direction"] == "twopass":
            y = apply_fir(x, kernel)
            y = apply_fir(y[::-1], kernel)[::-1]
        else:
            y = apply_fir(x, kernel)
        return y, self._nan_info(trial)


class ButFiltering(_PreprocRoutine):
    """Butterworth IIR filtering (reference compRoutines.py:174-300); the
    biquad cascade runs as a parallel associative scan on device."""

    valid_kws = ["filter_class", "filter_type", "freq", "order", "direction",
                 "polyremoval"]

    def __init__(self, samplerate=1.0, filter_type="lp", freq=None, order=4,
                 direction="twopass", polyremoval=None):
        sos = butter_sos(int(order), freq, filter_type, samplerate)
        super().__init__(
            samplerate=samplerate, sos=sos, direction=direction, polyremoval=polyremoval
        )

    def process_single_trial(self, trial, **cfg):
        from ..ops.filtering import sosfilt, sosfiltfilt

        x = detrend(trial.astype(jnp.float32), cfg["polyremoval"], axis=0)
        if cfg["direction"] == "twopass":
            y = sosfiltfilt(cfg["sos"], x).astype(jnp.float32)
        else:
            y = sosfilt(cfg["sos"], x).astype(jnp.float32)
        return y, self._nan_info(trial)


class Rectify(_PreprocRoutine):
    """Full-wave rectification (reference compRoutines.py:302-362)."""

    valid_kws = ["rectify"]

    def __init__(self):
        super().__init__()

    def process_single_trial(self, trial, **cfg):
        return jnp.abs(trial.astype(jnp.float32))


class Hilbert(_PreprocRoutine):
    """Hilbert transform / analytic signal (reference compRoutines.py:364-443)."""

    valid_kws = ["hilbert"]

    def __init__(self, output="abs"):
        super().__init__(output=output)

    def process_single_trial(self, trial, **cfg):
        return spectral_convert(hilbert(trial.astype(jnp.float32)), cfg["output"])


class _ResamplingRoutine(_PreprocRoutine):
    """Shared trialdefinition rescaling for down/resampling
    (reference compRoutines.py:858-881)."""

    def process_metadata(self, data, out):
        sel = self.selector
        factor = self.cfg["new_samplerate"] / self.cfg["samplerate"]
        n_out = [oshp[0] for oshp in self._per_trial_out_shapes_ordered]
        if not self.keeptrials:
            n_out = n_out[:1]
        bounds = np.concatenate([[0], np.cumsum(n_out)])
        old_trl = sel.trialdefinition
        trl = np.zeros((len(n_out), old_trl.shape[1]))
        trl[:, 0] = bounds[:-1]
        trl[:, 1] = bounds[1:]
        trl[:, 2] = old_trl[: len(n_out), 2] * factor
        if old_trl.shape[1] > 3:
            trl[:, 3:] = old_trl[: len(n_out), 3:]
        out.trialdefinition = trl
        self.propagate_properties(data, out)
        out.samplerate = self.cfg["new_samplerate"]


class Downsample(_ResamplingRoutine):
    """Integer-factor downsampling (reference compRoutines.py:446-538)."""

    valid_kws = ["resamplefs", "method"]

    def __init__(self, samplerate=1.0, new_samplerate=1.0):
        super().__init__(samplerate=samplerate, new_samplerate=new_samplerate)

    def process_single_trial(self, trial, **cfg):
        skipped = int(cfg["samplerate"] // cfg["new_samplerate"])
        return downsample(trial, skipped)


class Resample(_ResamplingRoutine):
    """Polyphase rational resampling with windowed-sinc anti-aliasing
    (reference compRoutines.py:541-655, kernel resampling.py:15-87)."""

    valid_kws = ["resamplefs", "method", "lpfreq", "order"]

    def __init__(self, samplerate=1.0, new_samplerate=1.0, lpfreq=None, order=None):
        from .resampledata import _get_updn

        up, down = _get_updn(samplerate, new_samplerate)
        super().__init__(
            samplerate=samplerate, new_samplerate=new_samplerate,
            up=up, down=down, lpfreq=lpfreq, order=order,
        )

    def process_single_trial(self, trial, **cfg):
        kernel = _resample_kernel(
            cfg["up"], cfg["down"], trial.shape[0], cfg["lpfreq"], cfg["order"], cfg["samplerate"]
        )
        return resample_poly(trial.astype(jnp.float32), cfg["up"], cfg["down"], kernel)


class Detrending(_PreprocRoutine):
    """De-meaning / linear detrending (reference compRoutines.py:657-762)."""

    valid_kws = ["polyremoval"]

    def __init__(self, polyremoval=0):
        super().__init__(polyremoval=polyremoval)

    def process_single_trial(self, trial, **cfg):
        y = detrend(trial.astype(jnp.float32), cfg["polyremoval"], axis=0)
        return y, self._nan_info(trial)


class Standardize(_PreprocRoutine):
    """Per-channel z-scoring after optional detrending
    (reference compRoutines.py:764-856)."""

    valid_kws = ["polyremoval", "zscore"]

    def __init__(self, polyremoval=None):
        super().__init__(polyremoval=polyremoval)

    def process_single_trial(self, trial, **cfg):
        x = detrend(trial.astype(jnp.float32), cfg["polyremoval"], axis=0)
        mean = jnp.mean(x, axis=0, keepdims=True)
        std = jnp.std(x, axis=0, keepdims=True)
        return (x - mean) / std, self._nan_info(trial)
