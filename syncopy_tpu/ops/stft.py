# -*- coding: utf-8 -*-
#
# Sliding-window (multi-)tapered Fourier transform — the mtmconvol/STFT
# kernel.
#
# Parity targets: reference syncopy/specest/stft.py:16-200 and
# specest/mtmconvol.py:17-152. Redesign: the strided-view + per-taper host
# loop becomes a single gather (window framing at arbitrary centers) and
# one batched rfft over (nTime, nTaper, nperseg, nChannel) — arbitrary
# window centers make the reference's equidistant/non-equidistant split
# unnecessary on device.

import jax.numpy as jnp

from .spectral import detrend, spectral_convert

__all__ = ["mtmconvol"]


def mtmconvol(
    data,
    tapers,
    centers,
    nperseg,
    polyremoval=None,
    output="fourier",
    keeptapers=True,
    freq_idx=None,
):
    """
    Tapered STFT of a single trial at arbitrary window centers.

    Parameters
    ----------
    data : (nSamples, nChannels) real array
    tapers : (nTaper, nperseg) float32 — normalized taper bank
        (:func:`~syncopy_tpu.ops.windows.make_tapers` with
        ``signal_length = pad_length = nperseg``)
    centers : (nTime,) int array — window-center sample indices into `data`
        (windows reaching past the edges are zero-extended, the reference's
        ``boundary='zeros'``)
    nperseg : int — window length in samples
    polyremoval : None/0/1 — per-segment detrending (reference stft.py
        ``detrend`` semantics)
    output : str — spectral output conversion
    keeptapers : bool — keep the taper axis or average it out
    freq_idx : optional int array — subselect frequency bins

    Returns
    -------
    spec : (nTime, nTaper|1, nFreq, nChannels)
    """
    halfWin = nperseg // 2
    x = jnp.pad(data.astype(jnp.float32), ((halfWin, nperseg), (0, 0)))
    starts = centers.astype(jnp.int32)  # center c -> padded window [c, c+nperseg)
    idx = starts[:, None] + jnp.arange(nperseg)[None, :]
    frames = x[idx]  # (nTime, nperseg, C) gather
    frames = detrend(frames, polyremoval, axis=1)
    tapered = frames[:, None, :, :] * tapers[None, :, :, None]
    ftr = jnp.fft.rfft(tapered, axis=2)
    if freq_idx is not None:
        ftr = jnp.take(ftr, jnp.asarray(freq_idx), axis=2)
    spec = spectral_convert(ftr, output)
    if not keeptapers:
        spec = jnp.mean(spec, axis=1, keepdims=True)
    return spec
