# -*- coding: utf-8 -*-
#
# MNE interop round-trips. Assertions ported from the reference suite
# (syncopy/tests/test_mne_conv.py:17-158). The real 'mne' package is not
# required: when absent, a minimal API-faithful stand-in
# (tests/mne_stub/) is put on sys.path so the converter mapping logic
# (axis order, channel names, sfreq, first_samp/tmin offsets) actually
# executes.

import sys
from pathlib import Path

import numpy as np
import pytest

try:
    import mne  # noqa: F401
except ImportError:
    sys.path.insert(0, str(Path(__file__).parent / "mne_stub"))
    import mne  # noqa: F401

import syncopy_tpu as spy
from syncopy_tpu.shared.errors import SPYTypeError, SPYValueError
from syncopy_tpu.synthdata import white_noise

N_CHANNELS = 16
N_TRIALS = 5
N_SAMPLES = 250


@pytest.fixture(scope="module")
def adata():
    return white_noise(
        nTrials=N_TRIALS, nChannels=N_CHANNELS, nSamples=N_SAMPLES, seed=42
    )


@pytest.fixture(scope="module")
def adata_notrials():
    return white_noise(
        nTrials=1, nChannels=N_CHANNELS, nSamples=N_SAMPLES, seed=43
    )


class TestSpyToMNERaw:
    def test_analog_raw_to_mne(self, adata_notrials):
        ar = spy.raw_adata_to_mne_raw(adata_notrials)
        assert isinstance(ar, mne.io.RawArray)
        assert np.allclose(np.asarray(adata_notrials.data[()]).T, ar.get_data())
        assert all(adata_notrials.channel == ar.ch_names)
        assert adata_notrials.samplerate == ar.info["sfreq"]

    def test_multitrial_rejected(self, adata):
        with pytest.raises(SPYValueError, match="single trial|no trial"):
            spy.raw_adata_to_mne_raw(adata)

    def test_wrong_type_rejected(self):
        with pytest.raises(SPYTypeError):
            spy.raw_adata_to_mne_raw(np.zeros((10, 2)))
        with pytest.raises(SPYTypeError):
            spy.raw_mne_to_adata(np.zeros((2, 10)))

    def test_raw_roundtrip(self, adata_notrials):
        ar = spy.raw_adata_to_mne_raw(adata_notrials)
        back = spy.raw_mne_to_adata(ar)
        assert isinstance(back, spy.AnalogData)
        assert all(adata_notrials.channel == back.channel)
        assert np.allclose(np.asarray(adata_notrials.data[()]), back.data[()])
        assert np.allclose(adata_notrials.time[0], back.time[0])
        assert adata_notrials.samplerate == back.samplerate

    def test_raw_roundtrip_with_offset(self, adata_notrials):
        shifted = adata_notrials.copy()
        trl = np.array(shifted.trialdefinition)
        trl[0, 2] = 100
        shifted.trialdefinition = trl
        ar = spy.raw_adata_to_mne_raw(shifted)
        assert ar.first_samp == 100
        back = spy.raw_mne_to_adata(ar)
        assert np.allclose(shifted.time[0], back.time[0])


class TestSpyToMNEEpochs:
    def test_tldata_to_mne(self, adata):
        tldata = spy.timelockanalysis(adata, latency="maxperiod", keeptrials=True)
        assert isinstance(tldata, spy.TimeLockData)
        epoched = spy.tldata_to_mne_epochs(tldata)
        assert isinstance(epoched, mne.EpochsArray)
        n_epochs, n_channels, n_times = epoched.get_data().shape
        assert n_times == tldata.trials[0].shape[0]
        assert n_epochs == len(tldata.trials)
        assert n_channels == len(tldata.channel)

    def test_timelocked_analog_to_mne(self, adata):
        assert adata.is_time_locked
        epoched = spy.tldata_to_mne_epochs(adata)
        assert isinstance(epoched, mne.EpochsArray)
        assert epoched.get_data().shape == (N_TRIALS, N_CHANNELS, N_SAMPLES)
        for ea in epoched.iter_evoked():
            assert isinstance(ea, mne.EvokedArray)
            assert ea.get_data().shape == (N_CHANNELS, N_SAMPLES)

    def test_not_timelocked_rejected(self, adata):
        ragged = adata.copy()
        trl = np.array(ragged.trialdefinition)
        trl[0, 1] -= 10  # shorten the first trial
        ragged.trialdefinition = trl
        with pytest.raises(SPYValueError, match="time_locked"):
            spy.tldata_to_mne_epochs(ragged)

    def test_epochs_roundtrip(self, adata):
        epoched = spy.tldata_to_mne_epochs(adata)
        back = spy.mne_epochs_to_tldata(epoched)
        # the reference returns time-locked AnalogData here, not
        # TimeLockData (ref mne_conv.py:142-186)
        assert isinstance(back, spy.AnalogData)
        assert back.is_time_locked
        assert len(back.trials) == N_TRIALS
        assert all(adata.channel == back.channel)
        assert np.allclose(np.asarray(adata.data[()]), back.data[()])
        assert np.allclose(np.asarray(adata.time), np.asarray(back.time))

    def test_epochs_roundtrip_nonzero_tmin(self, adata):
        shifted = adata.copy()
        trl = np.array(shifted.trialdefinition)
        trl[:, 2] = -50  # pre-stimulus window: t0 = -50/fs
        shifted.trialdefinition = trl
        epoched = spy.tldata_to_mne_epochs(shifted)
        # our tmin matches the syncopy time axis (t0 = offset/fs); the
        # reference mirrors the sign both ways — see mne_conv.py header
        assert epoched.tmin == pytest.approx(-50.0 / shifted.samplerate)
        back = spy.mne_epochs_to_tldata(epoched)
        assert np.allclose(np.asarray(shifted.time), np.asarray(back.time))
        assert np.allclose(np.asarray(shifted.data[()]), back.data[()])
