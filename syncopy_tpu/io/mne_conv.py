# -*- coding: utf-8 -*-
#
# MNE-Python interop converters.
#
# Parity target: reference syncopy/io/mne_conv.py:20-142.

import numpy as np

from ..shared.errors import SPYError, SPYTypeError

__all__ = [
    "raw_adata_to_mne_raw",
    "raw_mne_to_adata",
    "tldata_to_mne_epochs",
    "mne_epochs_to_tldata",
]


def _require_mne():
    try:
        import mne

        return mne
    except ImportError:
        raise SPYError(
            "MNE conversion requires the optional dependency 'mne'; install it "
            "to use the converters."
        )


def raw_adata_to_mne_raw(adata):
    """AnalogData (single trial) -> mne.io.RawArray."""
    mne = _require_mne()
    from ..datatype.continuous_data import AnalogData

    if not isinstance(adata, AnalogData):
        raise SPYTypeError(adata, varname="adata", expected="AnalogData")
    info = mne.create_info(
        ch_names=[str(c) for c in adata.channel],
        sfreq=float(adata.samplerate),
        ch_types="misc",
    )
    # mne: [channel x time], volts
    return mne.io.RawArray(np.asarray(adata.data).T, info)


def raw_mne_to_adata(ar):
    """mne.io.RawArray -> AnalogData (one trial)."""
    _require_mne()
    from ..datatype.continuous_data import AnalogData

    data = ar.get_data().T.astype(np.float32)
    adata = AnalogData(data=data, samplerate=float(ar.info["sfreq"]))
    adata.channel = [str(c) for c in ar.ch_names]
    return adata


def tldata_to_mne_epochs(tldata):
    """TimeLockData -> mne.EpochsArray."""
    mne = _require_mne()
    from ..datatype.continuous_data import TimeLockData

    if not isinstance(tldata, TimeLockData):
        raise SPYTypeError(tldata, varname="tldata", expected="TimeLockData")
    info = mne.create_info(
        ch_names=[str(c) for c in tldata.channel],
        sfreq=float(tldata.samplerate),
        ch_types="misc",
    )
    trials = np.stack([np.asarray(t).T for t in tldata.trials])  # [trial x chan x time]
    tmin = float(tldata.trialdefinition[0, 2]) / tldata.samplerate
    return mne.EpochsArray(trials, info, tmin=tmin)


def mne_epochs_to_tldata(ep):
    """mne.Epochs -> TimeLockData."""
    _require_mne()
    from ..datatype.continuous_data import TimeLockData

    data = ep.get_data()  # [trial x chan x time]
    sr = float(ep.info["sfreq"])
    n_trials, n_chan, n_time = data.shape
    stacked = np.concatenate([d.T for d in data], axis=0).astype(np.float32)
    tl = TimeLockData(data=stacked, samplerate=sr)
    offset = int(round(ep.tmin * sr))
    trl = np.zeros((n_trials, 3))
    trl[:, 0] = np.arange(n_trials) * n_time
    trl[:, 1] = trl[:, 0] + n_time
    trl[:, 2] = offset
    tl.trialdefinition = trl
    tl.channel = [str(c) for c in ep.ch_names]
    return tl
