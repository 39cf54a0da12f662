# -*- coding: utf-8 -*-
#
# MXU-resident FFT: a two-stage Cooley-Tukey DFT evaluated as batched
# matmuls.
#
# Why: XLA's TPU FFT runs on the VPU and is the single slowest stage of
# the spectral pipelines here — profiled at 58 ms for the headline
# coherence shape (192k rows of length 1000), ~10x above its HBM traffic
# bound, more than the CSD Gram and normalization combined. Splitting
# N = N1*N2 turns the transform into two skinny GEMMs (contraction N1,
# then N2) plus an elementwise twiddle — N*(N1+N2) MACs instead of
# N log N, but on the MXU at ~100x the effective rate of the TPU FFT, and
# bandwidth-bound at these batch sizes anyway.
#
#   X[N1*s + r] = sum_q F2[s,q] * ( T[r,q] * sum_p F1[r,p] x[p*N2 + q] )
#
# with F1 = DFT(N1), F2 = DFT(N2), T[r,q] = exp(-2i pi r q / N).
#
# Accuracy: float32 GEMMs at HIGHEST precision — ~1e-6 relative (vs the
# TPU FFT's ~2.4e-7). Used for coherence/welch-style power paths where
# estimator noise is orders of magnitude larger; the factorization-grade
# Granger CSD keeps the compensated double-float32 DFT
# (ops/connectivity.rfft_df32), and parity-sensitive `fourier` outputs
# keep the platform FFT.

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["rfft_via_matmul", "matmul_fft_split", "tpu_rfft"]

# module-level constant (one process per setting, like the other SPY_TPU_*
# engine knobs): SPY_TPU_MATMUL_FFT=0 reverts every gated call site to the
# platform FFT
_USE_MATMUL_FFT = os.environ.get("SPY_TPU_MATMUL_FFT", "1") != "0"
# GEMM precision for the DFT stages: "highest" = exact f32 (6-pass bf16),
# "high" = bf16_3x (~2^-21 per-op relative error, ~2x the matmul rate).
# Power/TFR magnitude paths tolerate "high" easily (estimator noise is
# orders of magnitude larger); default stays exact.
_MATMUL_PRECISION = os.environ.get("SPY_TPU_MATMUL_FFT_PRECISION", "highest")


def _prefer_matmul(N):
    """Measured rule (v5e, 2026-08-19): the matmul transform wins for
    NON-power-of-two lengths, where the platform FFT pays mixed-radix
    overheads far above its traffic bound (N=1000 rfft: 58 -> 32 ms on
    the coherence path). For power-of-two lengths the platform radix-2
    FFT wins (L=2048 wavelet ifft: matmul REGRESSED 1768 -> 1012
    trials/s) — keep it there. Padded-convolution lengths are pow2 by
    construction (preferred_fft_len), so in practice this fires for
    analysis lengths fixed by the data (mtmfft/stft nfft)."""
    return _USE_MATMUL_FFT and N & (N - 1) != 0 and jax.default_backend() != "cpu"


def preferred_fft_len(n):
    """Smallest 'fast' transform length >= `n` for a padded convolution:
    the next power of two.

    Measured dead end (v5e, 2026-08-19, superlet bank 15 scales x 64
    trials x 64 ch): {2,3}-smooth lengths through :func:`ifft_via_matmul`
    DID beat a single common pow2 length (467 vs 359 trials/s at
    L=3456 vs 4096) — but per-scale length BUCKETING (ops/wavelet.py::
    _scale_buckets) beats both, and under bucketing the pow2 platform
    ifft wins decisively: 590 trials/s vs 419 (matmul exact-f32) / 434
    (matmul bf16_3x). Once every scale runs near its minimal length, the
    radix-2 platform FFT's rate advantage at pow2 outweighs any further
    {2,3}-smooth length saving. The matmul DFT remains the right tool for
    NON-pow2 analysis lengths fixed by the data (tpu_rfft: N=1000 rfft
    58 -> 32 ms)."""
    n = int(n)
    return 1 << max((n - 1).bit_length(), 0)


def tpu_rfft(x, nfft, axis=-2):
    """``jnp.fft.rfft``, or :func:`rfft_via_matmul` on accelerator
    backends for non-power-of-two lengths (see :func:`_prefer_matmul`).
    Backend choice happens at trace time."""
    if _prefer_matmul(int(nfft)):
        return rfft_via_matmul(x, nfft, axis=axis)
    return jnp.fft.rfft(x, n=nfft, axis=axis)


def tpu_ifft_crop(X, axis, n_out):
    """First `n_out` samples of ``jnp.fft.ifft(X, axis=axis)``: platform
    ifft + slice, or :func:`ifft_via_matmul` on accelerators for
    non-power-of-two lengths (which never computes the cropped-away
    samples — wavelet banks keep only the first nSamples of an L-point
    circular convolution)."""
    if _prefer_matmul(int(X.shape[axis])):
        return ifft_via_matmul(X, axis=axis, n_out=n_out)
    idx = [slice(None)] * X.ndim
    idx[axis] = slice(0, n_out)
    return jnp.fft.ifft(X, axis=axis)[tuple(idx)]


@functools.lru_cache(maxsize=32)
def _ct_plan_inv(N, n_out):
    split = matmul_fft_split(N)
    if split is None:
        return None
    N1, N2 = split
    # inverse decimation: k = N1*s + r, n = N2*p + q
    #   y[N2 p + q] = (1/N) sum_r W1+[p,r] ( T+[q,r] sum_s W2+[q,s] X[N1 s + r] )
    s = np.arange(N2)
    q = np.arange(N2)
    G2 = np.exp(2j * np.pi * np.outer(q, s) / N2)
    r = np.arange(N1)
    T = np.exp(2j * np.pi * np.outer(q, r) / N)
    p_max = (int(n_out) - 1) // N2
    p = np.arange(p_max + 1)
    G1 = np.exp(2j * np.pi * np.outer(p, r) / N1) / N
    return N1, N2, G2.astype(np.complex64), T.astype(np.complex64), G1.astype(np.complex64)


def ifft_via_matmul(X, axis, n_out=None):
    """
    The first `n_out` samples of the length-N inverse DFT of complex `X`
    along `axis`, as two batched MXU GEMM stages (complex einsums — XLA
    decomposes them into real MXU matmuls). Restricting the output range
    drops the p-blocks past ``n_out`` entirely — wavelet convolutions pad
    to L >> nSamples and discard the tail, so roughly half of stage 2
    never runs. Falls back to platform ifft for unfactorable lengths.
    """
    N = X.shape[axis]
    if n_out is None:
        n_out = N
    plan = _ct_plan_inv(int(N), int(n_out))
    if plan is None:
        idx = [slice(None)] * X.ndim
        idx[axis] = slice(0, n_out)
        return jnp.fft.ifft(X, axis=axis)[tuple(idx)]
    N1, N2, G2, T, G1 = plan

    X = jnp.moveaxis(X, axis, -2).astype(jnp.complex64)
    lead = X.shape[:-2]
    C = X.shape[-1]
    Xsr = X.reshape(lead + (N2, N1, C))  # [s, r] with k = N1*s + r
    g2 = jnp.asarray(G2)
    tw = jnp.asarray(T)[:, :, None]
    g1 = jnp.asarray(G1)
    with jax.default_matmul_precision(_MATMUL_PRECISION):
        Z = jnp.einsum("qs,...src->...qrc", g2, Xsr)
        Z = Z * tw
        Y = jnp.einsum("pr,...qrc->...pqc", g1, Z)  # (..., p, q, c)
    y = Y.reshape(lead + (-1, C))[..., :n_out, :]
    return jnp.moveaxis(y, -2, axis)


def matmul_fft_split(N, max_factor=512):
    """Pick (N1, N2) with ``N1 * N2 == N`` minimizing the GEMM cost
    ``2*N1 + 4*N2`` (stage 1 runs 2 real GEMMs on the real input, stage 2
    runs 4); None when N has no usable split (prime or factors too
    large)."""
    best = None
    for n1 in range(2, min(N, max_factor + 1)):
        if N % n1:
            continue
        n2 = N // n1
        if n2 > max_factor:
            continue
        cost = 2 * n1 + 4 * n2
        if best is None or cost < best[0] or (cost == best[0] and n1 > best[1]):
            best = (cost, n1, n2)
    if best is None:
        return None
    return best[1], best[2]


@functools.lru_cache(maxsize=32)
def _ct_plan(N):
    split = matmul_fft_split(N)
    if split is None:
        return None
    N1, N2 = split
    F = N // 2 + 1
    r = np.arange(N1)
    p = np.arange(N1)
    F1 = np.exp(-2j * np.pi * np.outer(r, p) / N1)
    # one-sided output: k = N1*s + r <= N//2 needs s <= N//2 // N1 only
    s_max = (N // 2) // N1
    s = np.arange(s_max + 1)
    q = np.arange(N2)
    F2 = np.exp(-2j * np.pi * np.outer(s, q) / N2)
    T = np.exp(-2j * np.pi * np.outer(r, q) / N)
    as32 = lambda a: (a.real.astype(np.float32), a.imag.astype(np.float32))
    return N1, N2, F, as32(F1), as32(F2), as32(T)


def rfft_via_matmul(x, nfft, axis=-2):
    """
    One-sided DFT of real input via two batched MXU GEMM stages.

    Parameters
    ----------
    x : real array, transformed along `axis` (zero-padded/truncated to
        `nfft` samples)
    nfft : int transform length
    axis : transform axis

    Returns
    -------
    complex64 spectrum with ``nfft//2 + 1`` bins along `axis` — matches
    ``jnp.fft.rfft(x, n=nfft, axis=axis)`` to float32 GEMM rounding.
    Falls back to ``jnp.fft.rfft`` when `nfft` has no usable
    factorization.
    """
    plan = _ct_plan(int(nfft))
    if plan is None:
        return jnp.fft.rfft(x, n=nfft, axis=axis)
    N1, N2, F, (F1r, F1i), (F2r, F2i), (Tr, Ti) = plan

    x = jnp.moveaxis(x, axis, -2).astype(jnp.float32)
    T = x.shape[-2]
    if T < nfft:
        pad = [(0, 0)] * x.ndim
        pad[-2] = (0, nfft - T)
        x = jnp.pad(x, pad)
    elif T > nfft:
        x = x[..., :nfft, :]
    lead = x.shape[:-2]
    C = x.shape[-1]
    x5 = x.reshape(lead + (N1, N2, C))  # n = p*N2 + q

    f1r, f1i = jnp.asarray(F1r), jnp.asarray(F1i)
    f2r, f2i = jnp.asarray(F2r), jnp.asarray(F2i)
    tr = jnp.asarray(Tr)[:, :, None]
    ti = jnp.asarray(Ti)[:, :, None]
    with jax.default_matmul_precision(_MATMUL_PRECISION):
        Yr = jnp.einsum("rp,...pqc->...rqc", f1r, x5)
        Yi = jnp.einsum("rp,...pqc->...rqc", f1i, x5)
        Zr = Yr * tr - Yi * ti
        Zi = Yr * ti + Yi * tr
        Xr = (jnp.einsum("sq,...rqc->...src", f2r, Zr)
              - jnp.einsum("sq,...rqc->...src", f2i, Zi))
        Xi = (jnp.einsum("sq,...rqc->...src", f2r, Zi)
              + jnp.einsum("sq,...rqc->...src", f2i, Zr))
    X = jax.lax.complex(Xr, Xi).reshape(lead + (-1, C))[..., :F, :]
    return jnp.moveaxis(X, -2, axis)
