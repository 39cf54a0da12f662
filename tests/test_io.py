# -*- coding: utf-8 -*-
# I/O interop tests (modeled on reference tests/test_spyio.py and
# tests/test_nwb.py): FieldTrip .mat import (pre-7.3 and v7.3), NWB layout
# reader, TDT .sev reader, storage hygiene.

import os
import struct

import h5py
import numpy as np
import pytest
from scipy.io import savemat

import syncopy_tpu as spy


class TestFieldTrip:
    def _mk_ft_struct(self):
        nTrials, T, C = 3, 100, 2
        rng = np.random.default_rng(0)
        trials = np.empty((nTrials,), dtype=object)
        times = np.empty((nTrials,), dtype=object)
        for k in range(nTrials):
            trials[k] = rng.normal(size=(C, T))  # FT: [channel x time]
            times[k] = (np.arange(T) - 10) / 1000.0
        return {
            "trial": trials,
            "time": times,
            "label": np.array(["chanA", "chanB"], dtype=object),
            "fsample": 1000.0,
        }

    def test_pre73(self, tmp_path):
        fname = str(tmp_path / "ftdata.mat")
        savemat(fname, {"data": self._mk_ft_struct()})
        out = spy.load_ft_raw(fname)
        assert "data" in out
        adata = out["data"]
        assert isinstance(adata, spy.AnalogData)
        assert len(adata.trials) == 3
        assert np.asarray(adata.trials[0]).shape == (100, 2)
        assert list(adata.channel) == ["chanA", "chanB"]
        assert adata.samplerate == 1000.0
        # offset reconstructed from the time axis
        assert adata.trialdefinition[0, 2] == -10

    def test_list_only(self, tmp_path):
        fname = str(tmp_path / "ftdata2.mat")
        savemat(fname, {"mydata": self._mk_ft_struct()})
        names = spy.load_ft_raw(fname, list_only=True)
        assert "mydata" in names

    def test_v73_layout(self, tmp_path):
        """Emulate MATLAB v7.3 HDF5 layout with object references."""
        fname = str(tmp_path / "ft73.mat")
        nTrials, T, C = 2, 50, 2
        rng = np.random.default_rng(1)
        with h5py.File(fname, "w", userblock_size=512) as f:
            grp = f.create_group("data")
            refs = f.create_group("#refs#")
            trial_refs, time_refs, label_refs = [], [], []
            for k in range(nTrials):
                # MATLAB stores transposed: [time x chan] on disk for [chan x time]
                d = refs.create_dataset("t{}".format(k), data=rng.normal(size=(T, C)))
                trial_refs.append(d.ref)
                tv = refs.create_dataset("tv{}".format(k), data=(np.arange(T) / 1000.0)[None, :])
                time_refs.append(tv.ref)
            for k, lab in enumerate(["c1", "c2"]):
                l = refs.create_dataset("l{}".format(k), data=np.array([[ord(c)] for c in lab]))
                label_refs.append(l.ref)
            grp.create_dataset("trial", data=np.array(trial_refs, dtype=h5py.ref_dtype)[None, :])
            grp.create_dataset("time", data=np.array(time_refs, dtype=h5py.ref_dtype)[None, :])
            grp.create_dataset("label", data=np.array(label_refs, dtype=h5py.ref_dtype)[:, None])
            grp.create_dataset("fsample", data=np.array([[1000.0]]))
        # write MAT v7.3 magic into the userblock so h5py/scipy agree on type
        out = spy.load_ft_raw(fname)
        adata = out["data"]
        assert len(adata.trials) == 2
        assert np.asarray(adata.trials[0]).shape == (50, 2)
        assert list(adata.channel) == ["c1", "c2"]


class TestNWB:
    def test_acquisition_roundtrip(self, tmp_path):
        fname = str(tmp_path / "fake.nwb")
        rng = np.random.default_rng(2)
        raw = rng.normal(size=(500, 3)).astype("f4")
        with h5py.File(fname, "w") as f:
            acq = f.create_group("acquisition")
            series = acq.create_group("ElectricalSeries")
            d = series.create_dataset("data", data=raw)
            d.attrs["conversion"] = 1.0
            st = series.create_dataset("starting_time", data=0.0)
            st.attrs["rate"] = 1000.0
            trials = f.create_group("intervals/trials")
            trials.create_dataset("start_time", data=np.array([0.0, 0.25]))
            trials.create_dataset("stop_time", data=np.array([0.25, 0.5]))
        obj = spy.load_nwb(fname)
        assert isinstance(obj, spy.AnalogData)
        assert obj.samplerate == 1000.0
        assert len(obj.trials) == 2
        assert np.allclose(np.asarray(obj.data), raw, atol=1e-6)

    def test_units(self, tmp_path):
        fname = str(tmp_path / "units.nwb")
        with h5py.File(fname, "w") as f:
            units = f.create_group("units")
            units.create_dataset("spike_times", data=np.array([0.01, 0.02, 0.05, 0.07]))
            units.create_dataset("spike_times_index", data=np.array([2, 4]))
        obj = spy.load_nwb(fname, default_spike_data_samplerate=1000.0)
        assert isinstance(obj, spy.SpikeData)
        arr = np.asarray(obj.data)
        assert arr.shape[0] == 4
        assert set(arr[:, 2]) == {0, 1}


class TestTDT:
    def test_sev_reader(self, tmp_path):
        d = tmp_path / "block"
        d.mkdir()
        fs = 1017.25
        sig = np.sin(np.arange(1000) / 10).astype("f4")
        for ch in (1, 2):
            header = bytearray(40)
            header[24:25] = struct.pack("<B", 0)  # float32
            header[32:36] = struct.pack("<f", fs)
            with open(d / "stream_ch{}.sev".format(ch), "wb") as f:
                f.write(bytes(header))
                sig.tofile(f)
        obj = spy.load_tdt(str(d))
        assert isinstance(obj, spy.AnalogData)
        assert obj.data.shape == (1000, 2)
        assert obj.samplerate == pytest.approx(fs, rel=1e-5)
        assert np.allclose(np.asarray(obj.data)[:, 0], sig)


class TestStorage:
    def test_cleanup_removes_stale(self, tmp_path, monkeypatch):
        import syncopy_tpu.datatype.util as dutil

        monkeypatch.setattr(dutil, "storage_dir", lambda: str(tmp_path))
        import syncopy_tpu.io.utils as ioutils

        stale = tmp_path / "spy_deadbeef_x.analog"
        stale.write_bytes(b"0")
        os.utime(stale, (0, 0))  # ancient mtime
        fresh = tmp_path / "spy_new.analog"
        fresh.write_bytes(b"0")
        removed = spy.cleanup(older_than=24)
        assert str(stale) in removed
        assert fresh.exists()

    def test_hash_file_stability(self, tmp_path, adata_equal):
        fname = spy.save(adata_equal, container=str(tmp_path / "h"))
        from syncopy_tpu.io.utils import hash_file

        h1 = hash_file(fname)
        with h5py.File(fname, "r+"):
            pass
        assert hash_file(fname) == h1


class TestMNEGated:
    def test_mne_raises_without_mne(self, adata_equal):
        try:
            import mne  # noqa: F401

            pytest.skip("mne installed")
        except ImportError:
            pass
        with pytest.raises(spy.SPYError):
            spy.raw_adata_to_mne_raw(adata_equal)


class TestContainerMultiObject:
    def test_dict_load(self, tmp_path, adata_equal):
        container = str(tmp_path / "sess")
        spy.save(adata_equal, container=container, tag="raw")
        spec = spy.freqanalysis(adata_equal, method="mtmfft", taper="hann")
        spy.save(spec, container=container, tag="spec")
        loaded = spy.load(container + ".spy")
        assert isinstance(loaded, dict) and len(loaded) == 2
        classes = {type(v).__name__ for v in loaded.values()}
        assert classes == {"AnalogData", "SpectralData"}

    def test_dataclass_filter(self, tmp_path, adata_equal):
        container = str(tmp_path / "sess2")
        spy.save(adata_equal, container=container, tag="raw")
        spec = spy.freqanalysis(adata_equal, method="mtmfft", taper="hann")
        spy.save(spec, container=container, tag="spec")
        only_spec = spy.load(container + ".spy", dataclass="SpectralData")
        assert isinstance(only_spec, spy.SpectralData)


class TestTDTBlock:
    def test_tsq_tev_with_trials(self, tmp_path):
        """Synthetic .tsq/.tev block: stream records + scalar trigger codes
        (reference io/load_tdt.py block layout)."""
        d = tmp_path / "block2"
        d.mkdir()
        fs = 1017.25
        npts = 256
        code = struct.unpack("<I", b"LFPs")[0]
        start_code = struct.unpack("<I", b"TRG_")[0]
        size_field = npts * 4 // 4 + 10  # float32: size quads incl. header
        rec_dt = np.dtype([("size", "<i4"), ("type", "<i4"), ("code", "<u4"),
                           ("channel", "<u2"), ("sortcode", "<u2"),
                           ("timestamp", "<f8"), ("offset", "<u8"),
                           ("format", "<i4"), ("frequency", "<f4")])
        recs, payload = [], []
        offset = 0
        t0 = 100.0
        rng = np.random.default_rng(3)
        for blk in range(3):
            for ch in (1, 2):
                sig = rng.normal(size=npts).astype("f4")
                payload.append(sig)
                recs.append((size_field, 0x8101, code, ch, 0,
                             t0 + blk * npts / fs, offset, 0, fs))
                offset += npts * 4
        # two trial triggers (scalar events)
        for k in range(2):
            recs.append((10, 0x0201, start_code, 0, 0, t0 + 0.1 + 0.3 * k, 0, 0, 0.0))
        arr = np.array(recs, dtype=rec_dt)
        arr.tofile(d / "block2.tsq")
        np.concatenate(payload).tofile(d / "block2.tev")

        obj = spy.load_tdt(str(d), start_code="TRG_")
        assert obj.samplerate == pytest.approx(fs, rel=1e-5)
        assert obj.data.shape == (3 * npts, 2)
        assert list(obj.channel) == ["LFPs_1", "LFPs_2"]
        assert obj.trialdefinition.shape[0] == 2
        # first trial starts 0.1 s after stream onset
        assert obj.trialdefinition[0, 0] == pytest.approx(0.1 * fs, abs=1)
