# -*- coding: utf-8 -*-
#
# Spectral-estimation compute routines: the glue binding the jittable
# kernels in ops/ into the engine.
#
# Parity target: reference syncopy/specest/compRoutines.py (cF/CR pairs).
# Here each CR exposes `process_single_trial` — a pure jit-safe function the
# engine vmaps over the (sharded) trial batch — instead of the reference's
# `computeFunction` + Dask worker pairs.

import numpy as np

import jax.numpy as jnp

from ..engine.routine import ComputationalRoutine
from ..ops.spectral import detrend, mtmfft, spectral_convert
from ..ops.windows import make_tapers

__all__ = ["MultiTaperFFT"]


class MultiTaperFFT(ComputationalRoutine):
    """
    (Multi-)tapered Fourier transform of AnalogData trials
    (reference compRoutines.py:59-236, kernel mtmfft.py:16-129).

    Output per trial: ``(1, nTaper|1, nFreq, nChannel)``; tapers are
    averaged unless ``keeptapers=True``.
    """

    valid_kws = [
        "taper",
        "taper_opt",
        "tapsmofrq",
        "nTaper",
        "keeptapers",
        "demean_taper",
        "pad",
        "foi",
        "foilim",
        "output",
        "polyremoval",
        "ft_compat",
    ]

    def __init__(self, samplerate=1.0, nfft=None, taper="hann", taper_opt=None,
                 demean_taper=False, output="pow", keeptapers=False,
                 polyremoval=0, freq_idx=None, ft_compat=False):
        super().__init__(
            samplerate=samplerate, nfft=nfft, taper=taper, taper_opt=taper_opt,
            demean_taper=demean_taper, output=output, keeptapers=keeptapers,
            polyremoval=polyremoval,
            freq_idx=None if freq_idx is None else np.asarray(freq_idx, dtype=int),
            ft_compat=ft_compat,
        )

    def process_single_trial(self, trial, **cfg):
        nfft = cfg["nfft"] or trial.shape[0]
        x = detrend(trial.astype(jnp.float32), cfg["polyremoval"], axis=0)
        tapers = jnp.asarray(
            make_tapers(
                cfg["taper"], cfg["taper_opt"], trial.shape[0], nfft,
                cfg["samplerate"], cfg["ft_compat"],
            )
        )
        ftr = mtmfft(x, tapers, nfft, demean_taper=cfg["demean_taper"])
        if cfg["freq_idx"] is not None:
            ftr = jnp.take(ftr, jnp.asarray(cfg["freq_idx"]), axis=1)
        spec = spectral_convert(ftr, cfg["output"])
        if not cfg["keeptapers"]:
            spec = jnp.mean(spec, axis=0, keepdims=True)
        return spec[None]  # (1, nTaper|1, nFreq, nChannel)

    def process_metadata(self, data, out):
        out.trialdefinition = self._spectral_trialdefinition(data)
        out.samplerate = data.samplerate
        self.propagate_properties(data, out)
        nfft = self.cfg["nfft"]
        freqs = np.fft.rfftfreq(nfft, 1.0 / self.cfg["samplerate"])
        if self.cfg["freq_idx"] is not None:
            freqs = freqs[self.cfg["freq_idx"]]
        out.freq = freqs
        n_taper = out.data.shape[out.dimord.index("taper")]
        name = self.cfg["taper"] or "boxcar"
        out.taper = [name] * n_taper

    def _spectral_trialdefinition(self, data):
        """One spectral sample per trial; offsets carried from the input
        (reference compRoutines.py:215-235)."""
        trl_sel = self.selector.trialdefinition
        n_out = trl_sel.shape[0] if self.keeptrials else 1
        trl = np.zeros((n_out, trl_sel.shape[1]))
        trl[:, 0] = np.arange(n_out)
        trl[:, 1] = np.arange(n_out) + 1
        trl[:, 2] = trl_sel[:n_out, 2]
        if trl_sel.shape[1] > 3:
            trl[:, 3:] = trl_sel[:n_out, 3:]
        return trl
