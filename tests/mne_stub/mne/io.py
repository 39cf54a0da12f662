# -*- coding: utf-8 -*-
#
# mne.io stand-in: RawArray with the (n_channels, n_times) layout and
# first_samp semantics of the real class.

import numpy as np


class RawArray:
    def __init__(self, data, info, first_samp=0):
        data = np.asarray(data)
        if data.ndim != 2 or data.shape[0] != info["nchan"]:
            raise ValueError(
                f"RawArray data must be (n_channels={info['nchan']}, "
                f"n_times), got {data.shape}"
            )
        self._data = data.astype(np.float64)
        self.info = info
        self.first_samp = int(first_samp)

    @property
    def ch_names(self):
        return list(self.info["ch_names"])

    @property
    def n_times(self):
        return self._data.shape[1]

    def get_data(self):
        return self._data
