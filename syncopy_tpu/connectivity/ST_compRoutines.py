# -*- coding: utf-8 -*-
#
# Single-trial connectivity compute routines.
#
# Parity target: reference syncopy/connectivity/ST_compRoutines.py:29-640.

import numpy as np

import jax
import jax.numpy as jnp

from ..engine.routine import ComputationalRoutine
from ..ops.connectivity import (
    ccov_batch_sum,
    cross_covariance_trial,
    cross_spectra_trial,
    spectral_dyadic_product,
)

__all__ = ["CrossSpectra", "PPCSpectra", "SpectralDyadicProduct",
           "CrossCovariance"]


def _take_labels(labels, indexer):
    labels = np.asarray(labels)
    if indexer is None:
        return labels
    if isinstance(indexer, slice):
        return labels[indexer]
    return labels[np.asarray(indexer, dtype=int)]


class _CrossRoutine(ComputationalRoutine):
    """Shared metadata propagation for CrossSpectralData outputs."""

    dimord = ["time", "freq", "channel_i", "channel_j"]

    def _cross_trialdefinition(self, n_times):
        if not self.keeptrials:
            n_times = n_times[:1]
        bounds = np.concatenate([[0], np.cumsum(n_times)])
        trl = np.zeros((len(n_times), 3))
        trl[:, 0] = bounds[:-1]
        trl[:, 1] = bounds[1:]
        return trl

    def process_metadata(self, data, out):
        sdim = 0
        n_times = [oshp[sdim] for oshp in self._per_trial_out_shapes_ordered]
        out.trialdefinition = self._cross_trialdefinition(n_times)
        out.samplerate = data.samplerate
        sel = self.selector
        chan = _take_labels(data.channel, getattr(sel, "channel", None))
        out.channel_i = chan
        out.channel_j = chan
        if self.cfg.get("foi") is not None:
            out.freq = self.cfg["foi"]


class CrossSpectra(_CrossRoutine):
    """
    Single-trial (multi-)tapered cross spectra of AnalogData
    (reference ST_compRoutines.py:270-463): implicit mtmfft + channel
    outer product, tapers averaged. Output per trial ``(1, nFreq, N, N)``.
    """

    valid_kws = ["taper", "taper_opt", "tapsmofrq", "nTaper", "pad", "foi", "foilim",
                 "polyremoval", "demean_taper", "output"]

    def __init__(self, samplerate=1.0, nSamples=None, taper="hann", taper_opt=None,
                 demean_taper=False, polyremoval=0, freq_idx=None, foi=None,
                 exact_fft=False):
        # exact_fft: factorization-grade CSD — compensated double-float32
        # DFT + Gram (ops/connectivity.csd_sum_df32). Required for Granger
        # on TPU: the hardware FFT's error structure leaves the averaged
        # CSD without an exact Wilson factorization.
        super().__init__(
            samplerate=samplerate, nSamples=nSamples, taper=taper, taper_opt=taper_opt,
            demean_taper=demean_taper, polyremoval=polyremoval,
            freq_idx=None if freq_idx is None else np.asarray(freq_idx, dtype=int),
            foi=foi, exact_fft=bool(exact_fft),
        )
        # prime the pallas probe NOW (host-side): process_batch_sum runs
        # under jit, where the probe cannot execute and would otherwise
        # conservatively report False (see pallas_kernels.pallas_supported)
        from ..ops.pallas_kernels import pallas_supported

        pallas_supported()

    def process_single_trial(self, trial, **cfg):
        nfft = cfg["nSamples"] or trial.shape[0]
        return cross_spectra_trial(
            trial, cfg["samplerate"], nfft, taper=cfg["taper"], taper_opt=cfg["taper_opt"],
            demean_taper=cfg["demean_taper"], polyremoval=cfg["polyremoval"],
            freq_idx=cfg["freq_idx"],
        )

    @staticmethod
    def _tapered_batch(batch, cfg):
        """(B, K, T, C) detrended+tapered trial batch and the taper count."""
        from ..ops.spectral import detrend
        from ..ops.windows import make_tapers

        nfft = cfg["nSamples"] or batch.shape[1]
        x = detrend(batch.astype(jnp.float32), cfg["polyremoval"], axis=1)
        tapers = jnp.asarray(
            make_tapers(cfg["taper"], cfg["taper_opt"], batch.shape[1], nfft, cfg["samplerate"])
        )
        tapered = tapers[None, :, :, None] * x[:, None, :, :]  # (B, K, T, C)
        if cfg["demean_taper"]:
            tapered = tapered - jnp.mean(tapered, axis=2, keepdims=True)
        return tapered, tapers.shape[0], nfft

    @staticmethod
    def _batch_spectra(tapered, nfft, cfg, use_matmul_dft):
        """(B, K, F, C) one-sided spectra of a tapered batch."""
        from ..ops.fft import tpu_rfft

        if use_matmul_dft:
            # MXU-resident DFT for non-pow2 lengths: the platform FFT is
            # the slowest stage of this program there (~10x its traffic
            # bound, profiled in benchmarks/diagnostics/
            # coh_stage_profile.py) — the two-GEMM Cooley-Tukey transform
            # replaces it at ~1.5e-7 relative error
            spec = tpu_rfft(tapered, nfft, axis=2)  # (B, K, F, C)
        else:
            spec = jnp.fft.rfft(tapered, n=nfft, axis=2)
        if cfg["freq_idx"] is not None:
            spec = jnp.take(spec, jnp.asarray(cfg["freq_idx"]), axis=2)
        return spec

    def process_batch_sum(self, batch, n_valid, **cfg):
        """
        Fused trial-summed cross spectra: the whole (masked) trial x taper
        stack collapses in ONE batched contraction on the MXU instead of
        materializing per-trial (nFreq, N, N) matrices — the engine's
        `keeptrials=False` fast path.
        """
        tapered, K, nfft = self._tapered_batch(batch, cfg)

        if cfg.get("exact_fft") and batch.shape[1] <= 1024:
            # factorization-grade CSD: compensated double-f32 DFT + Gram —
            # the hardware FFT's error structure otherwise floors Wilson's
            # elementwise-relative error ~100x above the spectral noise
            from ..ops.connectivity import csd_sum_df32

            mask = (jnp.arange(tapered.shape[0]) < n_valid)[:, None, None, None]
            tapered = jnp.where(mask, tapered, jnp.zeros((), tapered.dtype))
            cs_sum = csd_sum_df32(tapered, nfft, freq_idx=cfg["freq_idx"]) / K
            return cs_sum[None].astype(jnp.complex64)

        C = tapered.shape[-1]

        from ..ops.connectivity import csd_sum_compensated
        from ..ops.pallas_kernels import (
            csd_accumulate_tiled,
            pallas_supported,
            tiled_blocks_for,
        )

        blocks = tiled_blocks_for(C)
        # exact_fft asked for a factorization-grade CSD; when the trial is
        # too long for the df32 branch above, fall back to the compensated
        # XLA sum — the pallas tile's in-group serial MXU error
        # (<= row_block*eps, ~3e-5 worst at row_block=256) is the same
        # order as the plain-f32 accumulation noise that makes CSDs
        # un-factorizable (ops/connectivity.py docstrings)
        use_pallas = (blocks is not None and not cfg.get("exact_fft")
                      and pallas_supported())
        spec = self._batch_spectra(tapered, nfft, cfg, use_pallas)
        B, Kt, F, C = spec.shape

        if use_pallas:
            # production MXU path: ONE tiled pallas pass over the spectrum
            # — per-frequency row-group contractions on the MXU, in-kernel
            # n_valid masking, cross-group TwoSum into (hi, lo) f32 pairs.
            # Replaces the XLA compensated einsum, which materializes
            # (G, F, C, C) partials in HBM (~3 GB for a 1000-trial slab)
            # and re-reads them through a G-step fori_loop. Accumulation
            # error <= row_block*eps (in-group MXU serial) — ~1e-6 typical
            # on the CSD, invisible at coherence level; this path never
            # feeds Wilson (Granger uses exact_fft / csd_sum_compensated).
            rb, fb = blocks
            slab = spec.reshape(B * Kt, F, C)
            cs_sum = csd_accumulate_tiled(
                jnp.real(slab), jnp.imag(slab), n_valid * Kt,
                row_block=rb, freq_block=fb,
            ) / K
        else:
            # where-mask (not multiply): resident-input padding rows can be
            # kernel(0) garbage incl. NaN, and NaN * 0 would poison the sum
            mask = (jnp.arange(spec.shape[0]) < n_valid)[:, None, None, None]
            spec = jnp.where(mask, spec, jnp.zeros((), spec.dtype))
            # many-trial sums need compensated accumulation: plain serial
            # f32 accumulation noise (~3e-5 at 1000 trials) makes the CSD
            # un-factorizable — see ops/connectivity.csd_sum_compensated
            cs_sum = csd_sum_compensated(spec) / K
        return cs_sum[None].astype(jnp.complex64)


class PPCSpectra(CrossSpectra):
    """
    Fused single-pass pairwise phase consistency from AnalogData: the
    single-trial cross spectra AND the unit-phasor resultant reduction
    (Vinck 2010 Eq. 14; reference connectivity_analysis.py:624-667)
    collapse into ONE engine pass — the per-trial CSD stack that the
    two-pass path materializes (its HBM and readback bound) never exists.
    ``process_batch_sum`` returns the resultant SUM of unit CSDs; the
    frontend's fused post computes ``(|U|^2 - n) / (n (n - 1))``.

    On TPU the reduction runs in the pallas kernel
    :func:`~syncopy_tpu.ops.pallas_kernels.ppc_accumulate_tiled` (the
    unit normalization happens in VMEM per trial); elsewhere an XLA
    per-chunk stack fallback computes the identical sum.
    """

    def process_single_trial(self, trial, **cfg):
        cs = super().process_single_trial(trial, **cfg)
        # same semantics as PPCReduction.process_single_trial: exact-zero
        # bins are 0/0 — production inputs are tapered spectra of real
        # data where this cannot occur off the padding (which the batch
        # paths mask by n_valid)
        return cs / jnp.abs(cs)

    def device_bytes_per_trial(self, shp, out_shp, out_dt):
        """Per-trial footprint: tapered copy + spectrum, plus — on the XLA
        fallback only — the per-chunk (F, C, C) unit-CSD stack the pallas
        kernel avoids."""
        from ..ops.pallas_kernels import pallas_supported, tiled_blocks_for

        T, C = shp[0], shp[1]
        nfft = self.cfg["nSamples"] or T
        fi = self.cfg["freq_idx"]
        F = (nfft // 2 + 1) if fi is None else len(fi)
        K = int(((self.cfg.get("taper_opt") or {}).get("Kmax", 1)) or 1)
        spec = K * T * C * 4 + K * F * C * 8
        if tiled_blocks_for(C) is not None and pallas_supported():
            return spec
        return spec + F * C * C * 8

    def process_batch_sum(self, batch, n_valid, **cfg):
        tapered, K, nfft = self._tapered_batch(batch, cfg)
        C = tapered.shape[-1]

        from ..ops.pallas_kernels import (
            pallas_supported,
            ppc_accumulate_tiled,
            tiled_blocks_for,
        )

        blocks = tiled_blocks_for(C)
        use_pallas = blocks is not None and pallas_supported()
        spec = self._batch_spectra(tapered, nfft, cfg, use_pallas)

        if use_pallas:
            _, fb = blocks
            U = ppc_accumulate_tiled(
                jnp.real(spec), jnp.imag(spec), n_valid, freq_block=fb
            )
        else:
            cs = jnp.einsum(
                "bkfi,bkfj->bfij", spec, jnp.conj(spec),
                precision=jax.lax.Precision.HIGHEST,
            )
            mag = jnp.abs(cs)
            unit = jnp.where(mag > 0, cs / jnp.where(mag > 0, mag, 1.0), 0.0)
            mask = (jnp.arange(unit.shape[0]) < n_valid)[:, None, None, None]
            U = jnp.sum(jnp.where(mask, unit, jnp.zeros((), unit.dtype)), axis=0)
        return U[None].astype(jnp.complex64)


class SpectralDyadicProduct(_CrossRoutine):
    """
    Single-trial cross spectra from complex SpectralData: channel outer
    product, tapers averaged (reference ST_compRoutines.py:29-152).
    Optional (senders x receivers) restriction via `send_idx`/`rec_idx`.
    """

    valid_kws = ["send_idx", "rec_idx", "output"]

    def __init__(self, send_idx=None, rec_idx=None):
        super().__init__(
            send_idx=None if send_idx is None else np.asarray(send_idx, dtype=int),
            rec_idx=None if rec_idx is None else np.asarray(rec_idx, dtype=int),
            foi=None,
        )

    def process_single_trial(self, trial, **cfg):
        return spectral_dyadic_product(trial, cfg["send_idx"], cfg["rec_idx"])

    def process_batch_sum(self, batch, n_valid, **cfg):
        """Fused masked trial sum with COMPENSATED accumulation: the
        averaged CSD feeds Wilson downstream (granger on SpectralData
        input), where plain serial f32 accumulation noise destroys
        factorizability (see ops/connectivity.csd_sum_compensated)."""
        from ..ops.connectivity import csd_sum_compensated

        # batch: (B, nTime, K, F, C) complex
        if cfg["send_idx"] is not None:
            a = jnp.take(batch, jnp.asarray(cfg["send_idx"]), axis=4)
            b = jnp.take(batch, jnp.asarray(cfg["rec_idx"]), axis=4)
            mask = (jnp.arange(batch.shape[0]) < n_valid)[:, None, None, None, None]
            a = jnp.where(mask, a, jnp.zeros((), a.dtype))
            b = jnp.where(mask, b, jnp.zeros((), b.dtype))
            cs = jnp.einsum(
                "btkfi,btkfj->tfij", a, jnp.conj(b),
                precision=jax.lax.Precision.HIGHEST,
            ) / batch.shape[2]
            return cs.astype(jnp.complex64)
        mask = (jnp.arange(batch.shape[0]) < n_valid)[:, None, None, None, None]
        x = jnp.where(mask, batch, jnp.zeros((), batch.dtype))
        B, T, K, F, C = x.shape
        per_time = jax.vmap(
            lambda s: csd_sum_compensated(s), in_axes=1, out_axes=0
        )(x.reshape(B, T, K, F, C))
        return (per_time / K).astype(jnp.complex64)

    def process_metadata(self, data, out):
        sdim = 0
        n_times = [oshp[sdim] for oshp in self._per_trial_out_shapes_ordered]
        out.trialdefinition = self._cross_trialdefinition(n_times)
        out.samplerate = data.samplerate
        sel = self.selector
        chan = _take_labels(data.channel, getattr(sel, "channel", None))
        if self.cfg["send_idx"] is not None:
            out.channel_i = np.asarray(data.channel)[self.cfg["send_idx"]]
            out.channel_j = np.asarray(data.channel)[self.cfg["rec_idx"]]
        else:
            out.channel_i = chan
            out.channel_j = chan
        freqs = np.asarray(data.freq)
        fsel = getattr(sel, "freq", None)
        out.freq = _take_labels(freqs, fsel)


class CrossCovariance(_CrossRoutine):
    """
    Single-trial cross-covariance at non-negative lags
    (reference ST_compRoutines.py:465-640). Output per trial
    ``(nLags, 1, N, N)``; the lag axis rides on the time dimension.
    """

    valid_kws = ["norm", "polyremoval"]

    def __init__(self, samplerate=1.0, polyremoval=0, norm=False):
        super().__init__(samplerate=samplerate, polyremoval=polyremoval, norm=norm, foi=None)

    def device_bytes_per_trial(self, shp, out_shp, out_dt):
        """Per-trial footprint. Fused keeptrials=False path: one (L_fft, C)
        complex spectrum row per trial (the (L_fft, C, C) Gram is a fixed
        per-chunk cost, charged to the first trial's share conservatively
        via the output term the engine already adds). keeptrials=True on
        accelerators runs the lag-GEMM path (ops/connectivity.py::
        _ccov_lags_gemm): a (lag_block, T, C) shifted workspace + the
        (nLags, C, C) output. CPU keeps the FFT correlation with its
        (fft_len, C, C) spectrum product."""
        T, C = shp[0], shp[1]
        L = 1 << int(2 * T - 1).bit_length()
        if not self.keeptrials:
            return T * C * 4 + (L // 2 + 1) * C * 8
        if jax.default_backend() != "cpu":
            n_lags = T // 2 + 1
            return 64 * T * C * 4 + n_lags * C * C * 4
        return L * C * C * 16

    def process_single_trial(self, trial, **cfg):
        return cross_covariance_trial(trial, polyremoval=cfg["polyremoval"], norm=cfg["norm"])

    def process_batch_sum(self, batch, n_valid, **cfg):
        """Fused masked trial sum: frequency-domain Gram accumulation +
        one inverse FFT (ops/connectivity.py::ccov_batch_sum). `norm`
        is per-trial (divides by each trial's own stds) and cannot fuse —
        fall back to summing per-trial outputs in that case (the corr
        frontend never averages normed trials: norm=bool(keeptrials))."""
        if cfg["norm"]:
            per_trial = jax.vmap(
                lambda t: cross_covariance_trial(
                    t, polyremoval=cfg["polyremoval"], norm=True)
            )(batch)
            mask = (jnp.arange(batch.shape[0]) < n_valid)[:, None, None, None, None]
            return jnp.sum(
                jnp.where(mask, per_trial, jnp.zeros((), per_trial.dtype)), axis=0
            )
        return ccov_batch_sum(batch, n_valid, polyremoval=cfg["polyremoval"])

    def process_metadata(self, data, out):
        sdim = 0
        n_lags = [oshp[sdim] for oshp in self._per_trial_out_shapes_ordered]
        # lags are encoded on the time axis with offset 0 (the 0-lag)
        out.trialdefinition = self._cross_trialdefinition(n_lags)
        out.samplerate = data.samplerate
        sel = self.selector
        chan = _take_labels(data.channel, getattr(sel, "channel", None))
        out.channel_i = chan
        out.channel_j = chan
