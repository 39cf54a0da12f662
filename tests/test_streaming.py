# -*- coding: utf-8 -*-
# Larger-than-memory streaming: HDF5-backed inputs stream through the
# engine trial-chunk-wise; outputs exceeding the host budget land in HDF5
# (the analog of the reference's VDS pipeline,
# computational_routine.py:750-804).

import h5py
import numpy as np
import pytest

import syncopy_tpu as spy
import syncopy_tpu.engine.routine as routine


@pytest.fixture()
def hdf5_backed(tmp_path):
    fname = str(tmp_path / "big.analog")
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(20 * 500, 8)).astype("f4")
    with h5py.File(fname, "w") as f:
        f.create_dataset("data", data=arr)
    ad = spy.AnalogData(data=fname, samplerate=1000)
    trl = np.zeros((20, 3))
    trl[:, 0] = np.arange(20) * 500
    trl[:, 1] = trl[:, 0] + 500
    ad.trialdefinition = trl
    return ad, arr


class TestHDF5Input:
    def test_freqanalysis_from_disk(self, hdf5_backed):
        ad, arr = hdf5_backed
        spec = spy.freqanalysis(ad, method="mtmfft", taper="hann")
        assert spec.data.shape[0] == 20
        # matches the in-memory result
        ad_mem = spy.AnalogData(data=arr.copy(), samplerate=1000)
        ad_mem.trialdefinition = ad.trialdefinition
        spec_mem = spy.freqanalysis(ad_mem, method="mtmfft", taper="hann")
        assert np.allclose(np.asarray(spec.data), np.asarray(spec_mem.data), atol=1e-6)

    def test_selection_from_disk(self, hdf5_backed):
        ad, arr = hdf5_backed
        spec = spy.freqanalysis(
            ad, method="mtmfft", taper="hann", select={"trials": [1, 3], "channel": [0, 2]}
        )
        assert spec.data.shape == (2, 1, 251, 2)


class TestHDF5Output:
    def test_large_output_lands_on_disk(self, hdf5_backed, monkeypatch):
        ad, _ = hdf5_backed
        monkeypatch.setattr(routine, "DEFAULT_HOST_BUDGET", 1024)  # 1 KB budget
        spec = spy.freqanalysis(ad, method="mtmfft", taper="hann")
        # results stay device-resident until touched; shape is free
        assert spec.data.shape[0] == 20
        # first element access materializes — and the over-budget payload
        # must land in a disk-backed HDF5 dataset, not host RAM
        arr = np.asarray(spec.trials[0])
        assert arr.shape == (1, 1, 251, 8)
        assert isinstance(spec.data, h5py.Dataset)

    def test_disk_output_roundtrip(self, hdf5_backed, monkeypatch, tmp_path):
        ad, _ = hdf5_backed
        monkeypatch.setattr(routine, "DEFAULT_HOST_BUDGET", 1024)
        spec = spy.freqanalysis(ad, method="mtmfft", taper="hann")
        spy.save(spec, container=str(tmp_path / "diskspec"))
        loaded = spy.load(str(tmp_path / "diskspec.spy"))
        assert loaded == spec


class TestRaggedTrials:
    def test_mtmfft_ragged_pads_to_maxperlen(self):
        rng = np.random.default_rng(1)
        trls = [rng.normal(size=(n, 2)).astype("f4") for n in (400, 500, 450)]
        ad = spy.AnalogData(data=trls, samplerate=1000)
        spec = spy.freqanalysis(ad, method="mtmfft", taper="hann")
        # all trials share the padded frequency grid of the longest trial
        assert spec.freq.size == 251
        assert spec.data.shape[0] == 3

    def test_ragged_keeptrials_false_works_after_padding(self):
        rng = np.random.default_rng(2)
        trls = [rng.normal(size=(n, 2)).astype("f4") for n in (400, 500, 450)]
        ad = spy.AnalogData(data=trls, samplerate=1000)
        spec = spy.freqanalysis(ad, method="mtmfft", taper="hann", keeptrials=False)
        assert spec.data.shape[0] == 1

    def test_padding_nextpow2(self):
        rng = np.random.default_rng(3)
        ad = spy.AnalogData(data=rng.normal(size=(3 * 300, 2)).astype("f4"), samplerate=1000)
        trl = np.zeros((3, 3))
        trl[:, 0] = np.arange(3) * 300
        trl[:, 1] = trl[:, 0] + 300
        ad.trialdefinition = trl
        spec = spy.freqanalysis(ad, method="mtmfft", taper="hann", pad="nextpow2")
        assert spec.freq.size == 512 // 2 + 1

    def test_padding_absolute(self):
        rng = np.random.default_rng(4)
        ad = spy.AnalogData(data=rng.normal(size=(300, 2)).astype("f4"), samplerate=1000)
        spec = spy.freqanalysis(ad, method="mtmfft", taper="hann", pad=0.5)
        assert spec.freq.size == 251
