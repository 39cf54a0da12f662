# -*- coding: utf-8 -*-
#
# Minimal stand-in for the parts of MNE-Python that syncopy_tpu's
# converters touch (mne.create_info, mne.io.RawArray, mne.EpochsArray,
# mne.EvokedArray). Used by tests/test_mne_conv.py when the real 'mne'
# package is not installed, so the converter mapping logic (channel
# names, sfreq, data layout, first_samp/tmin round-trips) actually
# executes. Mirrors the real API's signatures and validation strictly
# enough that a converter bug (wrong axis order, missing offset) fails
# here the same way it would against real MNE.

import numpy as np

from . import io

__all__ = ["create_info", "io", "EpochsArray", "EvokedArray", "Info"]

STUB = True  # lets tests distinguish this from real MNE


class Info(dict):
    """Measurement info: dict with 'sfreq', 'ch_names', 'nchan' keys."""


def create_info(ch_names, sfreq, ch_types="misc"):
    if isinstance(ch_names, (int, np.integer)):
        ch_names = [str(i) for i in range(int(ch_names))]
    ch_names = [str(c) for c in ch_names]
    if float(sfreq) <= 0:
        raise ValueError("sfreq must be positive")
    return Info(sfreq=float(sfreq), ch_names=ch_names, nchan=len(ch_names),
                ch_types=str(ch_types))


class EvokedArray:
    """Single-epoch view: data is (n_channels, n_times)."""

    def __init__(self, data, info, tmin=0.0):
        data = np.asarray(data)
        if data.ndim != 2 or data.shape[0] != info["nchan"]:
            raise ValueError(
                f"EvokedArray data must be (n_channels={info['nchan']}, "
                f"n_times), got {data.shape}"
            )
        self._data = data.astype(np.float64)
        self.info = info
        self.tmin = float(tmin)

    @property
    def ch_names(self):
        return list(self.info["ch_names"])

    def get_data(self):
        return self._data


class EpochsArray:
    """Epoched data: (n_epochs, n_channels, n_times), times start at tmin."""

    def __init__(self, data, info, tmin=0.0, events=None):
        data = np.asarray(data)
        if data.ndim != 3 or data.shape[1] != info["nchan"]:
            raise ValueError(
                f"EpochsArray data must be (n_epochs, n_channels="
                f"{info['nchan']}, n_times), got {data.shape}"
            )
        self._data = data.astype(np.float64)
        self.info = info
        self.tmin = float(tmin)
        self.events = events

    @property
    def ch_names(self):
        return list(self.info["ch_names"])

    @property
    def times(self):
        n = self._data.shape[2]
        return self.tmin + np.arange(n) / self.info["sfreq"]

    def get_data(self):
        return self._data

    def iter_evoked(self):
        for ep in self._data:
            yield EvokedArray(ep, self.info, tmin=self.tmin)
