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


class TestFieldTripStreaming:
    """mem_use-bounded MAT v7.3 import (reference load_ft.py:211-366)."""

    def _write_v73(self, fname, nTrials=4, T=200, C=3, seed=5):
        rng = np.random.default_rng(seed)
        payload = [rng.normal(size=(T, C)).astype("f8") for _ in range(nTrials)]
        with h5py.File(fname, "w", userblock_size=512) as f:
            grp = f.create_group("data")
            refs = f.create_group("#refs#")
            trial_refs, time_refs, label_refs = [], [], []
            for k, arr in enumerate(payload):
                d = refs.create_dataset("t{}".format(k), data=arr)
                trial_refs.append(d.ref)
                tv = refs.create_dataset(
                    "tv{}".format(k), data=((np.arange(T) - 20) / 1000.0)[None, :]
                )
                time_refs.append(tv.ref)
            for k in range(C):
                l = refs.create_dataset(
                    "l{}".format(k), data=np.array([[ord(c)] for c in "ch{}".format(k)])
                )
                label_refs.append(l.ref)
            grp.create_dataset("trial", data=np.array(trial_refs, dtype=h5py.ref_dtype)[None, :])
            grp.create_dataset("time", data=np.array(time_refs, dtype=h5py.ref_dtype)[None, :])
            grp.create_dataset("label", data=np.array(label_refs, dtype=h5py.ref_dtype)[:, None])
            grp.create_dataset("fsample", data=np.array([[1000.0]]))
            grp.create_dataset("trialinfo", data=np.arange(nTrials, dtype="f8")[None, :] + 7)
        return payload

    def test_streamed_equals_in_memory(self, tmp_path):
        fname = str(tmp_path / "big73.mat")
        payload = self._write_v73(fname)
        # tiny budget -> disk-backed streaming; generous budget -> in-RAM
        streamed = spy.load_ft_raw(fname, mem_use=0.015)["data"]
        in_ram = spy.load_ft_raw(fname, mem_use=4000)["data"]
        assert isinstance(streamed.data, h5py.Dataset)
        assert isinstance(in_ram.data, np.ndarray)
        assert np.allclose(np.asarray(streamed.data), np.asarray(in_ram.data))
        assert np.allclose(np.asarray(streamed.trials[1]), payload[1].astype("f4"))
        # offsets + trialinfo survive both paths
        for obj in (streamed, in_ram):
            assert obj.trialdefinition[0, 2] == -20
            assert obj.trialdefinition[2, 3] == 9.0
            assert obj.samplerate == 1000.0

    def test_single_trial_must_fit(self, tmp_path):
        fname = str(tmp_path / "huge_trial.mat")
        self._write_v73(fname, nTrials=1, T=2000, C=4)
        with pytest.raises(spy.shared.errors.SPYValueError, match="mem_use"):
            spy.load_ft_raw(fname, mem_use=0.05)

    def test_streamed_analysis_runs(self, tmp_path):
        fname = str(tmp_path / "big73b.mat")
        self._write_v73(fname)
        streamed = spy.load_ft_raw(fname, mem_use=0.015)["data"]
        spec = spy.freqanalysis(streamed, method="mtmfft", taper="hann")
        assert np.all(np.isfinite(np.asarray(spec.data)))


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


class TestNWBDepth:
    """memuse streaming, electrode labels, channel gains, TTL -> EventData,
    trials offset column (reference load_nwb.py:44-410)."""

    def _write_nwb(self, fname, T=400, C=3, rate=500.0, with_ttl=True):
        rng = np.random.default_rng(6)
        raw = rng.normal(size=(T, C)).astype("f4")
        with h5py.File(fname, "w") as f:
            acq = f.create_group("acquisition")
            series = acq.create_group("ElectricalSeries")
            d = series.create_dataset("data", data=raw)
            d.attrs["conversion"] = 2.0
            series.create_dataset("channel_conversion", data=np.array([1.0, 0.5, 2.0], "f4"))
            st = series.create_dataset("starting_time", data=0.0)
            st.attrs["rate"] = rate
            series.create_dataset("electrodes", data=np.arange(C))
            etable = f.create_group("general/extracellular_ephys/electrodes")
            etable.create_dataset("label", data=np.array([b"elecA", b"elecB", b"elecC"]))
            if with_ttl:
                ttl = acq.create_group("TTL_pulses")
                ttl.create_dataset("data", data=np.array([7, 9, 7]))
                ts = ttl.create_dataset("timestamps", data=np.array([0.1, 0.3, 0.5]))
                ts.attrs["resolution"] = 1.0 / rate
            trials = f.create_group("intervals/trials")
            trials.create_dataset("start_time", data=np.array([0.0, 0.4]))
            trials.create_dataset("stop_time", data=np.array([0.4, 0.8]))
            trials.create_dataset("offset", data=np.array([-0.1, -0.1]))
        return raw

    def test_gains_labels_ttl_offsets(self, tmp_path):
        fname = str(tmp_path / "deep.nwb")
        raw = self._write_nwb(fname)
        objs = spy.load_nwb(fname)
        adata = objs["ElectricalSeries"]
        evt = objs["TTL_pulses"]
        assert isinstance(evt, spy.EventData)
        assert list(np.asarray(evt.data)[:, 1]) == [7, 9, 7]
        assert np.asarray(evt.data)[0, 0] == 50  # 0.1 s at 500 Hz
        # conversion x per-channel gains applied
        expected = raw * 2.0 * np.array([1.0, 0.5, 2.0])[None, :]
        assert np.allclose(np.asarray(adata.data), expected, atol=1e-5)
        assert list(adata.channel) == ["elecA", "elecB", "elecC"]
        # trials with the offset column
        assert adata.trialdefinition.shape[0] == 2
        assert adata.trialdefinition[0, 2] == -50

    def test_memuse_streaming_matches(self, tmp_path):
        fname = str(tmp_path / "big.nwb")
        self._write_nwb(fname, with_ttl=False)
        streamed = spy.load_nwb(fname, memuse=0.001)
        in_ram = spy.load_nwb(fname, memuse=3000)
        assert isinstance(streamed.data, h5py.Dataset)
        assert isinstance(in_ram.data, np.ndarray)
        assert np.allclose(np.asarray(streamed.data), np.asarray(in_ram.data))
        assert list(streamed.channel) == list(in_ram.channel)

    def test_units_rate_from_series(self, tmp_path):
        fname = str(tmp_path / "units2.nwb")
        self._write_nwb(fname, with_ttl=False)
        with h5py.File(fname, "a") as f:
            units = f.create_group("units")
            units.create_dataset("spike_times", data=np.array([0.01, 0.02, 0.05]))
            units.create_dataset("spike_times_index", data=np.array([2, 3]))
        objs = spy.load_nwb(fname)
        spk = objs["units"]
        assert isinstance(spk, spy.SpikeData)
        # samplerate inherited from the recorded series (500 Hz), not a default
        assert spk.samplerate == 500.0
        assert np.asarray(spk.data)[0, 0] == 5  # 0.01 s at 500 Hz


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

    def _write_multistore_block(self, d, fs=1000.0, npts=128):
        """Two stream stores + Mark strobes + an epoc on/offset pair + a
        snippet store (reference tank layout, io/load_tdt.py:124-455)."""
        rec_dt = np.dtype([("size", "<i4"), ("type", "<i4"), ("code", "<u4"),
                           ("channel", "<u2"), ("sortcode", "<u2"),
                           ("timestamp", "<f8"), ("offset", "<u8"),
                           ("format", "<i4"), ("frequency", "<f4")])
        size_field = npts * 4 // 4 + 10
        lfp_code = struct.unpack("<I", b"LFPs")[0]
        eeg_code = struct.unpack("<I", b"EEGx")[0]
        mark_code = struct.unpack("<I", b"Mark")[0]
        pdi_on = struct.unpack("<I", b"PDi/")[0]
        pdi_off = struct.unpack("<I", b"PDi\\")[0]
        snip_code = struct.unpack("<I", b"eNeu")[0]
        t0 = 50.0
        rng = np.random.default_rng(11)
        recs, payload = [], []
        offset = 0
        for blk in range(4):
            for ch in (1, 2):
                sig = rng.normal(size=npts).astype("f4")
                payload.append(sig)
                recs.append((size_field, 0x8101, lfp_code, ch, 0,
                             t0 + blk * npts / fs, offset, 0, fs))
                offset += npts * 4
        # a second, smaller stream store
        for blk in range(2):
            sig = rng.normal(size=npts).astype("f4")
            payload.append(sig)
            recs.append((size_field, 0x8101, eeg_code, 1, 0,
                         t0 + blk * npts / fs, offset, 0, fs / 2))
            offset += npts * 4

        def fbits(v):
            return np.array([v], dtype="f8").view("u8")[0]

        # Mark strobes carrying trial start/end VALUES
        for k, (code_val, dt) in enumerate(
                [(23000, 0.05), (30020, 0.20), (23000, 0.25), (30020, 0.45)]):
            recs.append((10, 0x8801, mark_code, 0, 0, t0 + dt, fbits(code_val), 4, 0.0))
        # epoc onset/offset buddy pair ('PDi/' onsets, 'PDi\' offsets
        # pointing at buddy 'PDi/')
        for dt, v in [(0.10, 1.0), (0.30, 1.0)]:
            recs.append((10, 0x0101, pdi_on, 0, 0, t0 + dt, fbits(v), 4, 0.0))
        buddy_lo = pdi_on & 0xFFFF
        buddy_hi = (pdi_on >> 16) & 0xFFFF
        for dt in (0.15, 0.35):
            recs.append((10, 0x0102, pdi_off, buddy_lo, buddy_hi,
                         t0 + dt, fbits(0.0), 4, 0.0))
        # spike snippets with channel + sortcode
        for dt, ch, sc in [(0.02, 1, 3), (0.07, 2, 1), (0.12, 1, 3)]:
            recs.append((size_field, 0x8201, snip_code, ch, sc,
                         t0 + dt, offset, 0, fs))
        arr = np.array(recs, dtype=rec_dt)
        arr.tofile(d / "block.tsq")
        np.concatenate(payload).tofile(d / "block.tev")
        return fs, npts

    def test_multistore_census(self, tmp_path):
        d = tmp_path / "block3"
        d.mkdir()
        fs, npts = self._write_multistore_block(d)
        # default: dominant stream (LFPs, 4 blocks x 2 chans)
        obj = spy.load_tdt(str(d))
        assert obj.data.shape == (4 * npts, 2)
        assert list(obj.channel) == ["LFPs_1", "LFPs_2"]
        # explicit selection of the secondary store
        eeg = spy.load_tdt(str(d), stream="EEGx")
        assert eeg.data.shape == (2 * npts, 1)
        assert eeg.samplerate == pytest.approx(fs / 2, rel=1e-5)
        # unknown store errors with the available names
        with pytest.raises(spy.shared.errors.SPYValueError, match="LFPs"):
            spy.load_tdt(str(d), stream="nope")

    def test_trigger_and_epoc_info(self, tmp_path):
        d = tmp_path / "block4"
        d.mkdir()
        fs, npts = self._write_multistore_block(d)
        obj = spy.load_tdt(str(d))
        # Mark strobe values surface as the reference's Trigger_* keys
        assert obj.info["Trigger_code"] == [23000, 30020, 23000, 30020]
        assert obj.info["Trigger_sample"][0] == pytest.approx(0.05 * fs, abs=1)
        # epoc buddy pairing: onsets from 'PDi/', offsets from 'PDi\'
        assert obj.info["PDi/_onset"] == pytest.approx([0.10, 0.30], abs=1e-6)
        assert obj.info["PDi/_offset"] == pytest.approx([0.15, 0.35], abs=1e-6)
        # snippets carry channel + sortcodes
        assert obj.info["eNeu_chan"] == [1, 2, 1]
        assert obj.info["eNeu_sortcode"] == [3, 1, 3]

    def test_trialdef_from_strobe_values(self, tmp_path):
        d = tmp_path / "block5"
        d.mkdir()
        fs, npts = self._write_multistore_block(d)
        obj = spy.load_tdt(str(d), start_code=23000, end_code=30020)
        trl = obj.trialdefinition
        assert trl.shape[0] == 2
        assert trl[0, 0] == pytest.approx(0.05 * fs, abs=1)
        assert trl[0, 1] == pytest.approx(0.20 * fs, abs=1)
        assert trl[1, 0] == pytest.approx(0.25 * fs, abs=1)
        # missing end code must raise (reference load_tdt.py:84-89)
        with pytest.raises(spy.shared.errors.SPYValueError, match="end"):
            spy.load_tdt(str(d), start_code=23000)


class TestSaveOverwrite:
    def test_refuses_then_overwrites(self, tmp_path):
        ad = spy.AnalogData(data=np.ones((40, 2), "f4"), samplerate=10)
        spy.save(ad, container=str(tmp_path / "c"))
        other = spy.AnalogData(data=2 * np.ones((40, 2), "f4"), samplerate=10)
        with pytest.raises((spy.SPYError, spy.SPYIOError, IOError)):
            spy.save(other, container=str(tmp_path / "c"))
        spy.save(other, container=str(tmp_path / "c"), overwrite=True)
        loaded = spy.load(str(tmp_path / "c.spy"))
        assert np.allclose(np.asarray(loaded.data), 2.0)

    def test_tagged_saves_coexist(self, tmp_path):
        ad = spy.AnalogData(data=np.ones((40, 2), "f4"), samplerate=10)
        spy.save(ad, container=str(tmp_path / "c"), tag="raw")
        flt = spy.AnalogData(data=3 * np.ones((40, 2), "f4"), samplerate=10)
        spy.save(flt, container=str(tmp_path / "c"), tag="filtered")
        raw = spy.load(str(tmp_path / "c.spy"), tag="raw")
        filt = spy.load(str(tmp_path / "c.spy"), tag="filtered")
        assert np.allclose(np.asarray(raw.data), 1.0)
        assert np.allclose(np.asarray(filt.data), 3.0)


class TestNWBExportRoundtrip:
    """Export -> import roundtrips through the dependency-free NWB writer
    (reference io/nwb.py:40-329 metadata depth: device + electrode group/
    location tables, processing-module placement for derived data, units
    with location/group/samplerate and waveform means)."""

    def _analog(self, T=200, C=3, fs=500.0):
        rng = np.random.default_rng(5)
        ad = spy.AnalogData(data=rng.normal(size=(T, C)).astype("f4"),
                            samplerate=fs, channel=["chA", "chB", "chC"])
        trl = np.array([[0, 100, -10], [100, 200, -10]], dtype=float)
        ad.trialdefinition = trl
        return ad

    def test_analog_roundtrip(self, tmp_path):
        ad = self._analog()
        fname = str(tmp_path / "analog.nwb")
        ad.save_nwb(fname)
        back = spy.load_nwb(fname)
        assert np.allclose(np.asarray(back.data), np.asarray(ad.data), atol=1e-7)
        assert back.samplerate == ad.samplerate
        assert list(back.channel) == ["chA", "chB", "chC"]
        assert np.allclose(back.trialdefinition, ad.trialdefinition)

    def test_schema_depth(self, tmp_path):
        """The on-disk layout carries the reference's metadata: device,
        electrode group with location, full electrode table columns."""
        import h5py

        ad = self._analog()
        fname = str(tmp_path / "schema.nwb")
        ad.save_nwb(fname)
        with h5py.File(fname, "r") as f:
            assert f.attrs["neurodata_type"] == "NWBFile"
            dev = f["general/devices/array"]
            assert dev.attrs["neurodata_type"] == "Device"
            shank = f["general/extracellular_ephys/shank0"]
            assert shank.attrs["neurodata_type"] == "ElectrodeGroup"
            assert "location" in shank.attrs
            assert f[shank["device"].name] is not None  # device hard link
            tbl = f["general/extracellular_ephys/electrodes"]
            for col in ("x", "y", "z", "imp", "filtering", "location",
                        "label", "group_name", "group", "id"):
                assert col in tbl, col
            series = f["acquisition/ElectricalSeries"]
            assert series["starting_time"].attrs["rate"] == 500.0
            # the electrodes region points back at the table
            ref = series["electrodes"].attrs["table"]
            assert f[ref].name == tbl.name
            # trials AND epochs intervals, with the offset column
            assert "offset" in f["intervals/trials"]
            assert "tags" in f["intervals/epochs"]

    def test_derived_data_lands_in_processing_module(self, tmp_path):
        import h5py

        ad = self._analog()
        fname = str(tmp_path / "derived.nwb")
        ad.save_nwb(fname, is_raw=False)
        with h5py.File(fname, "r") as f:
            assert "acquisition/ElectricalSeries" not in f
            mod = f["processing/ecephys"]
            assert mod.attrs["neurodata_type"] == "ProcessingModule"
            lfp = mod["LFP"]
            assert lfp.attrs["neurodata_type"] == "LFP"
            assert "ElectricalSeries" in lfp
        back = spy.load_nwb(fname)
        assert np.allclose(np.asarray(back.data), np.asarray(ad.data), atol=1e-7)

    def test_spike_roundtrip_with_waveforms(self, tmp_path):
        rng = np.random.default_rng(6)
        n_spikes, fs = 60, 1000.0
        samples = np.sort(rng.integers(0, 5000, size=n_spikes))
        units = rng.integers(0, 3, size=n_spikes)
        chans = np.zeros(n_spikes, dtype=int)
        sd = spy.SpikeData(
            data=np.column_stack([samples, chans, units]).astype(np.int64),
            samplerate=fs,
        )
        sd.trialdefinition = np.array([[0, 2500, 0], [2500, 5000, 0]], dtype=float)
        sd.waveform = rng.normal(size=(n_spikes, 32)).astype("f4")
        fname = str(tmp_path / "spikes.nwb")
        sd.save_nwb(fname, unit_info={"location": {0: "V1"}, "group": {0: "good"}})

        import h5py

        with h5py.File(fname, "r") as f:
            u = f["units"]
            for col in ("spike_times", "spike_times_index", "location",
                        "group", "samplerate", "waveform_mean", "id"):
                assert col in u, col
            assert u["location"][0].decode() == "V1"
            assert u["waveform_mean"].shape == (3, 32)
            # per-unit mean waveform is the mean over that unit's spikes
            wf0 = np.asarray(sd.waveform)[units == u["id"][0]].mean(axis=0)
            assert np.allclose(u["waveform_mean"][0], wf0, atol=1e-6)

        back = spy.load_nwb(fname)
        # exact sample restoration via the samplerate column
        assert back.samplerate == fs
        got = np.asarray(back.data)
        want = np.asarray(sd.data)[np.lexsort((units, samples))]
        assert np.array_equal(np.sort(got[:, 0]), np.sort(want[:, 0]))
        for uid in range(3):
            assert np.array_equal(
                np.sort(got[got[:, 2] == uid, 0]),
                np.sort(want[want[:, 2] == uid, 0]),
            )

    def test_timelock_export(self, tmp_path):
        from syncopy_tpu.datatype.continuous_data import TimeLockData

        tl = spy.timelockanalysis(
            spy.synthdata.white_noise(nTrials=4, nSamples=100, nChannels=2, seed=8)
        )
        assert isinstance(tl, TimeLockData)
        fname = str(tmp_path / "tl.nwb")
        tl.save_nwb(fname)
        back = spy.load_nwb(fname)
        assert np.asarray(back.data).shape == np.asarray(tl.data).shape


class TestStorageHygiene:
    """cleanup / clear / hash_file semantics (reference io/utils.py:49-270,
    tests/test_packagesetup.py storage blocks)."""

    def _plant(self, name, age_hours):
        import time as _time

        from syncopy_tpu.datatype.util import storage_dir

        path = os.path.join(storage_dir(), name)
        with open(path, "w") as f:
            f.write("x")
        old = _time.time() - age_hours * 3600
        os.utime(path, (old, old))
        return path

    def test_cleanup_reaps_old_dead_session_files(self):
        path = self._plant("spy_deadsession_test1.analog", age_hours=30)
        removed = spy.cleanup(older_than=24)
        assert path in removed
        assert not os.path.exists(path)

    def test_cleanup_keeps_young_files(self):
        path = self._plant("spy_deadsession_test2.analog", age_hours=1)
        removed = spy.cleanup(older_than=24)
        assert path not in removed
        assert os.path.exists(path)
        os.unlink(path)

    def test_cleanup_never_touches_live_session(self):
        """Files of the CURRENT session survive a dead-session sweep no
        matter their age — a >24h-old object of a long-running analysis
        must not be reaped out from under the user."""
        from syncopy_tpu.datatype.util import __sessionid__

        path = self._plant("spy_{}_old.analog".format(__sessionid__),
                           age_hours=48)
        removed = spy.cleanup(older_than=24)
        assert path not in removed
        assert os.path.exists(path)
        # explicit current-session sweep DOES remove it
        removed = spy.cleanup(older_than=24, only_current_session=True)
        assert path in removed

    def test_cleanup_validates_older_than(self):
        with pytest.raises(spy.SPYTypeError):
            spy.cleanup(older_than="yesterday")

    def test_hash_file_stable_and_sensitive(self, tmp_path):
        from syncopy_tpu.io.utils import hash_file

        p = tmp_path / "h.bin"
        p.write_bytes(b"abcdef" * 100)
        h1 = hash_file(str(p))
        assert h1 == hash_file(str(p))
        p.write_bytes(b"abcdef" * 99 + b"abcdeg")
        assert hash_file(str(p)) != h1

    def test_checksum_mismatch_detected_on_load(self, tmp_path):
        ad = spy.AnalogData(data=np.ones((20, 2), "f4"), samplerate=10.0)
        spy.save(ad, container=str(tmp_path / "chk"))
        ad._close_hdf()
        # corrupt the payload behind the container's back
        import glob

        import h5py

        fname = glob.glob(str(tmp_path / "chk.spy" / "*.analog"))[0]
        with h5py.File(fname, "r+") as f:
            f["data"][0, 0] = 123.0
        with pytest.raises(spy.SPYValueError, match="checksum"):
            spy.load(str(tmp_path / "chk.spy"), checksum=True)
        # without checksum verification the (corrupted) load succeeds
        loaded = spy.load(str(tmp_path / "chk.spy"))
        assert float(np.asarray(loaded.data)[0, 0]) == 123.0

    def test_cleanup_spares_other_live_sessions(self):
        """Files of ANY session with a live-process marker survive the
        dead-session sweep (multi-process storage sharing)."""
        from syncopy_tpu.datatype.util import _marker_name, storage_dir

        sdir = storage_dir()
        other_sess = "fakelive1"
        marker = os.path.join(sdir, _marker_name(other_sess, os.getpid()))
        with open(marker, "w") as f:
            f.write(str(os.getpid()))
        path = self._plant("spy_{}_x.analog".format(other_sess), age_hours=48)
        dead = self._plant("spy_deadfake_x.analog", age_hours=48)
        try:
            removed = spy.cleanup(older_than=24)
            assert path not in removed and os.path.exists(path)
            assert dead in removed
        finally:
            for p in (path, marker):
                if os.path.exists(p):
                    os.unlink(p)


class TestNWBExportEdgeCases:
    def test_swapped_dimord_region_sized_by_channels(self, tmp_path):
        """Electrode region length equals the electrode count even for
        dimord=['channel','time'] payloads."""
        import h5py

        arr = np.random.default_rng(0).normal(size=(3, 100)).astype("f4")
        ad = spy.AnalogData(data=arr, samplerate=100.0,
                            dimord=["channel", "time"])
        fname = str(tmp_path / "swapped.nwb")
        ad.save_nwb(fname)
        with h5py.File(fname, "r") as f:
            region = f["acquisition/ElectricalSeries/electrodes"]
            tbl = f["general/extracellular_ephys/electrodes"]
            assert region.shape[0] == tbl["id"].shape[0] == 3

    def test_partial_unit_info(self, tmp_path):
        rng = np.random.default_rng(1)
        arr = np.column_stack([
            np.sort(rng.integers(0, 100, 20)),
            np.zeros(20, int), rng.integers(0, 2, 20),
        ]).astype(np.int64)
        sd = spy.SpikeData(data=arr, samplerate=1000.0)
        fname = str(tmp_path / "partial.nwb")
        sd.save_nwb(fname, unit_info={"location": {0: "CA1"}})  # no 'group'
        import h5py

        with h5py.File(fname, "r") as f:
            assert f["units"]["location"][0].decode() == "CA1"
            assert f["units"]["group"][0].decode() == "unknown"

    def test_nwbfile_object_rejected_with_typed_error(self, tmp_path):
        ad = spy.AnalogData(data=np.ones((10, 2), "f4"), samplerate=10.0)
        with pytest.raises(spy.SPYValueError, match="fresh file"):
            ad.save_nwb(str(tmp_path / "x.nwb"), nwbfile=object())


class TestNWBLoadKwargs:
    """`container` and `validate` kwargs of load_nwb (reference
    load_nwb.py:44-49,88,243-375)."""

    def _nwb(self, tmp_path):
        rng = np.random.default_rng(11)
        ad = spy.AnalogData(data=rng.normal(size=(120, 2)).astype("f4"),
                            samplerate=250.0)
        fname = str(tmp_path / "roundtrip.nwb")
        ad.save_nwb(fname)
        return ad, fname

    def test_validate_ok(self, tmp_path):
        ad, fname = self._nwb(tmp_path)
        back = spy.load_nwb(fname, validate=True)
        assert np.allclose(np.asarray(back.data), np.asarray(ad.data), atol=1e-7)

    def test_validate_rejects_broken(self, tmp_path):
        import h5py

        _, fname = self._nwb(tmp_path)
        with h5py.File(fname, "r+") as f:
            del f["session_start_time"]
            f.attrs["nwb_version"] = "1.0.6"
        with pytest.raises(spy.SPYValueError, match="nwb_version"):
            spy.load_nwb(fname, validate=True)

    def test_container_saves_copy(self, tmp_path):
        import os

        ad, fname = self._nwb(tmp_path)
        cont = str(tmp_path / "imported.spy")
        back = spy.load_nwb(fname, container=cont)
        assert os.path.isdir(cont)
        saved = spy.load(cont)
        arr = saved if not isinstance(saved, (list, dict)) else list(
            saved.values() if isinstance(saved, dict) else saved)[0]
        assert np.allclose(np.asarray(arr.data), np.asarray(ad.data), atol=1e-7)

    def test_container_type_error(self, tmp_path):
        _, fname = self._nwb(tmp_path)
        with pytest.raises(spy.SPYTypeError):
            spy.load_nwb(fname, container=123)
