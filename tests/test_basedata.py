# -*- coding: utf-8 -*-
# Data-model tests (modeled on reference tests/test_basedata.py &
# test_continuousdata.py).

import numpy as np
import pytest

import syncopy_tpu as spy
from syncopy_tpu.shared.errors import SPYError, SPYTypeError, SPYValueError


class TestAnalogData:
    def test_ndarray_init(self):
        data = np.random.randn(1000, 4).astype("f4")
        ad = spy.AnalogData(data=data, samplerate=1000)
        assert ad.data.shape == (1000, 4)
        assert ad.samplerate == 1000
        # default: one all-encompassing trial
        assert ad.trialdefinition.shape[0] == 1
        assert len(ad.trials) == 1
        assert np.allclose(np.asarray(ad.trials[0]), data)
        assert list(ad.channel) == ["channel1", "channel2", "channel3", "channel4"]

    def test_list_init(self):
        trls = [np.random.randn(100, 2).astype("f4") for _ in range(5)]
        ad = spy.AnalogData(data=trls, samplerate=500)
        assert len(ad.trials) == 5
        for k in range(5):
            assert np.allclose(np.asarray(ad.trials[k]), trls[k])

    def test_trialdefinition(self):
        data = np.random.randn(1000, 2).astype("f4")
        ad = spy.AnalogData(data=data, samplerate=1000)
        trl = np.array([[0, 500, -100], [500, 1000, -100]])
        ad.trialdefinition = trl
        assert len(ad.trials) == 2
        assert np.allclose(ad.sampleinfo, trl[:, :2])
        # time axis honors offset
        assert ad.time[0][0] == pytest.approx(-0.1)

    def test_invalid_trialdefinition(self):
        ad = spy.AnalogData(data=np.zeros((100, 2), dtype="f4"), samplerate=100)
        with pytest.raises(SPYValueError):
            ad.trialdefinition = np.array([[0, 200, 0]])  # beyond data
        with pytest.raises(SPYValueError):
            ad.trialdefinition = np.array([[50, 20, 0]])  # stop < start

    def test_channel_labels(self):
        ad = spy.AnalogData(data=np.zeros((10, 3), dtype="f4"), samplerate=10)
        ad.channel = ["a", "b", "c"]
        assert list(ad.channel) == ["a", "b", "c"]
        with pytest.raises(SPYValueError):
            ad.channel = ["a", "b"]

    def test_equality(self):
        data = np.random.randn(100, 2).astype("f4")
        a = spy.AnalogData(data=data.copy(), samplerate=100)
        b = spy.AnalogData(data=data.copy(), samplerate=100)
        assert a == b
        b2 = spy.AnalogData(data=data + 1, samplerate=100)
        assert a != b2

    def test_copy(self):
        a = spy.AnalogData(data=np.random.randn(100, 2).astype("f4"), samplerate=100)
        b = a.copy()
        assert a == b
        np.asarray(b.data)[0, 0] += 99
        # copies are independent
        assert not np.allclose(np.asarray(a.data)[0, 0], np.asarray(b.data)[0, 0])

    def test_log(self):
        a = spy.AnalogData(data=np.zeros((10, 2), dtype="f4"), samplerate=10)
        a.log = "hello world"
        assert "hello world" in a.log
        with pytest.raises(SPYTypeError):
            a.log = 3

    def test_arithmetic(self):
        data = np.random.randn(100, 2).astype("f4")
        a = spy.AnalogData(data=data.copy(), samplerate=100)
        b = a + 3
        assert np.allclose(np.asarray(b.data), data + 3)
        c = a * 2 - a
        assert np.allclose(np.asarray(c.data), data, atol=1e-6)
        d = a / a
        assert np.allclose(np.asarray(d.data), 1.0)
        with pytest.raises(SPYValueError):
            a + spy.AnalogData(data=np.zeros((50, 2), dtype="f4"), samplerate=100)

    def test_show(self):
        data = np.arange(20, dtype="f4").reshape(10, 2)
        a = spy.AnalogData(data=data, samplerate=10)
        assert np.allclose(a.show(squeeze=False), data)
        assert np.allclose(a.show(channel=0), data[:, 0])


class TestSpectralData:
    def test_init(self):
        data = np.random.randn(2, 3, 50, 4).astype("f4")
        sd = spy.SpectralData(data=data, samplerate=1000)
        assert sd.dimord == ["time", "taper", "freq", "channel"]
        assert sd.freq.size == 50
        assert sd.taper.size == 3

    def test_freq_setter(self):
        data = np.random.randn(1, 1, 50, 2).astype("f4")
        sd = spy.SpectralData(data=data, samplerate=1000)
        freqs = np.linspace(0, 500, 50)
        sd.freq = freqs
        assert np.allclose(sd.freq, freqs)
        with pytest.raises(SPYValueError):
            sd.freq = np.arange(10)


class TestSelections:
    def test_channel_selection(self, adata_equal):
        sel = spy.selectdata(adata_equal, channel=[0, 2])
        assert sel.data.shape[1] == 2
        assert list(sel.channel) == ["channel1", "channel3"]
        raw = np.asarray(adata_equal.trials[0])
        assert np.allclose(np.asarray(sel.trials[0]), raw[:, [0, 2]])

    def test_trial_selection(self, adata_equal):
        sel = spy.selectdata(adata_equal, trials=[1, 3])
        assert len(sel.trials) == 2
        assert np.allclose(np.asarray(sel.trials[0]), np.asarray(adata_equal.trials[1]))

    def test_latency_selection(self, adata_equal):
        sel = spy.selectdata(adata_equal, latency=[0.1, 0.5])
        n = np.asarray(sel.trials[0]).shape[0]
        assert n == 401  # samples in [0.1, 0.5] at 1 kHz, t0=0

    def test_inplace_selection(self, adata_equal):
        adata_equal.selectdata(trials=[0, 1], inplace=True)
        assert adata_equal.selection is not None
        assert len(adata_equal.selection.trial_ids) == 2
        adata_equal.selectdata(inplace=True, clear=True)
        assert adata_equal.selection is None

    def test_label_selection(self, adata_equal):
        sel = spy.selectdata(adata_equal, channel=["channel2"])
        assert sel.data.shape[1] == 1

    def test_invalid_selection(self, adata_equal):
        with pytest.raises(SPYValueError):
            spy.selectdata(adata_equal, trials=[99])
        with pytest.raises(SPYValueError):
            spy.selectdata(adata_equal, channel=["nope"])


class TestRedefinetrial:
    def test_subset(self, adata_equal):
        out = spy.redefinetrial(adata_equal, trials=[0, 1, 2])
        assert len(out.trials) == 3

    def test_offset(self, adata_equal):
        out = spy.redefinetrial(adata_equal, offset=-100)
        assert np.all(out.trialdefinition[:, 2] == -100)

    def test_toilim(self, adata_equal):
        out = spy.redefinetrial(adata_equal, toilim=[0.2, 0.4])
        lens = out.trialdefinition[:, 1] - out.trialdefinition[:, 0]
        assert np.all(lens == 201)

    def test_trl_replace(self, adata_equal):
        trl = np.array([[0, 5000, 0], [5000, 10000, 0]])
        out = spy.redefinetrial(adata_equal, trl=trl)
        assert len(out.trials) == 2


class TestConcat:
    def test_channel_concat(self):
        a = spy.AnalogData(data=np.random.randn(100, 2).astype("f4"), samplerate=100)
        b = spy.AnalogData(data=np.random.randn(100, 3).astype("f4"), samplerate=100)
        out = spy.concat(a, b, dim="channel")
        assert out.data.shape == (100, 5)
        assert len(out.channel) == 5

    def test_nonstandard_dimord_concat(self):
        """Concat respects permuted dimords (reference test_concat.py:43-70
        concats channel-second SpectralData)."""
        nS, nT, nF = 10, 2, 4
        a = spy.SpectralData(
            data=[np.zeros((nS, 2, nT, nF), "f4") for _ in range(3)],
            samplerate=10, dimord=["time", "channel", "taper", "freq"],
        )
        b = spy.SpectralData(
            data=[np.zeros((nS, 3, nT, nF), "f4") for _ in range(3)],
            samplerate=10, dimord=["time", "channel", "taper", "freq"],
        )
        res = spy.concat(a, b, dim="channel")
        assert len(res.trials) == 3
        assert len(res.channel) == 5
        assert res.data.size == a.data.size + b.data.size

    def test_concat_exceptions(self):
        a = spy.AnalogData(data=np.zeros((10, 2), "f4"), samplerate=2)
        s = spy.SpectralData(data=np.zeros((10, 1, 2, 2), "f4"), samplerate=2)
        with pytest.raises(spy.SPYValueError):
            spy.concat(a, s)  # class mismatch
        with pytest.raises(spy.SPYValueError, match="dim"):
            spy.concat(a, a, dim="sth")
        with pytest.raises(spy.SPYValueError, match="non-stacking"):
            spy.concat(a, a, dim="time")
        a3 = spy.AnalogData(data=np.zeros((12, 2), "f4"), samplerate=3)
        with pytest.raises(spy.SPYValueError):
            spy.concat(a, a3, dim="channel")  # off-axis shape mismatch


class TestSaveLoad:
    def test_roundtrip(self, tmp_path, adata_equal):
        container = str(tmp_path / "testdata")
        spy.save(adata_equal, container=container)
        loaded = spy.load(container + ".spy")
        assert loaded == adata_equal
        assert loaded.samplerate == adata_equal.samplerate
        assert list(loaded.channel) == list(adata_equal.channel)

    def test_tags(self, tmp_path, adata_equal):
        container = str(tmp_path / "multi")
        spy.save(adata_equal, container=container, tag="raw")
        sel = spy.selectdata(adata_equal, channel=[0])
        spy.save(sel, container=container, tag="selected")
        loaded = spy.load(container + ".spy", tag="selected")
        assert loaded.data.shape[1] == 1

    def test_checksum(self, tmp_path, adata_equal):
        container = str(tmp_path / "check")
        fname = spy.save(adata_equal, container=container)
        loaded = spy.load(fname, checksum=True)
        assert loaded == adata_equal


class TestDiscreteData:
    def test_spikedata(self):
        rng = np.random.default_rng(3)
        samples = np.sort(rng.integers(0, 1000, 200))
        chans = rng.integers(0, 4, 200)
        units = rng.integers(0, 3, 200)
        sd = spy.SpikeData(
            data=np.column_stack([samples, chans, units]).astype(np.int64), samplerate=1000
        )
        assert sd.dimord == ["sample", "channel", "unit"]
        sd.trialdefinition = np.array([[0, 500, 0], [500, 1000, 0]])
        assert len(sd.trials) == 2
        t0 = np.asarray(sd.trials[0])
        assert np.all(t0[:, 0] < 500)

    def test_unit_selection(self):
        data = np.column_stack(
            [np.arange(100), np.zeros(100), np.tile([0, 1], 50)]
        ).astype(np.int64)
        sd = spy.SpikeData(data=data, samplerate=1000)
        sel = spy.selectdata(sd, unit=[0])
        arr = np.asarray(sel.data)
        assert np.all(arr[:, 2] == 0)


class TestRedefinetrialEdges:
    def test_begsample_endsample(self, adata_equal):
        out = spy.redefinetrial(adata_equal, begsample=100, endsample=500)
        lens = out.trialdefinition[:, 1] - out.trialdefinition[:, 0]
        assert np.all(lens == 400)
        assert np.all(out.trialdefinition[:, 2] == 100)
        assert np.allclose(
            np.asarray(out.trials[0]), np.asarray(adata_equal.trials[0])[100:500]
        )

    def test_minlength(self, adata_ragged):
        out = spy.redefinetrial(adata_ragged, minlength=0.95)
        lens = out.trialdefinition[:, 1] - out.trialdefinition[:, 0]
        assert np.all(lens >= 950)

    def test_exclusive_args(self, adata_equal):
        with pytest.raises(spy.shared.errors.SPYError, match="Incompatible"):
            spy.redefinetrial(adata_equal, toilim=[0, 0.5], begsample=10)


class TestConcatSpectral:
    def test_taper_concat(self, adata_equal):
        a = spy.freqanalysis(adata_equal, tapsmofrq=4, keeptapers=True, output="fourier")
        b = spy.freqanalysis(adata_equal, tapsmofrq=4, keeptapers=True, output="fourier")
        out = spy.concat(a, b, dim="taper")
        assert out.data.shape[1] == 2 * a.data.shape[1]
        assert len(out.taper) == 2 * len(a.taper)


class TestObjectListConstructor:
    """AnalogData([obj1, obj2]) trial-concatenates (reference
    test_continuousdata.py:268-305)."""

    def _mk(self, n_trials, val, nSamples=10, sr=1.0):
        return spy.AnalogData(
            data=[val * np.ones((nSamples, 2), "f4") for _ in range(n_trials)],
            samplerate=sr,
        )

    def test_concat_trials(self):
        a, b = self._mk(2, 1.0), self._mk(3, 2.0)
        cat = spy.AnalogData([a, b])
        assert len(cat.trials) == 5
        assert np.asarray(cat.trials[0])[0, 0] == 1.0
        assert np.asarray(cat.trials[4])[0, 0] == 2.0
        assert cat.samplerate == 1.0

    def test_ragged_objects_concat(self):
        gen = (i * np.ones((i + 1, 2), "f4") for i in range(3))
        ragged = spy.AnalogData(gen, samplerate=1)
        uniform = self._mk(2, 9.0)
        cat = spy.AnalogData([ragged, uniform])
        assert [len(np.asarray(t)) for t in cat.trials] == [1, 2, 3, 10, 10]

    def test_missing_samplerate_rejected(self):
        a = self._mk(2, 1.0)
        b = spy.AnalogData(data=[np.ones((10, 2), "f4")])
        with pytest.raises(spy.SPYValueError, match="missing attribute"):
            spy.AnalogData([a, b])

    def test_different_channels_rejected(self):
        a, b = self._mk(2, 1.0), self._mk(2, 1.0)
        a.channel = ["c1", "c2"]
        b.channel = ["x1", "x2"]
        with pytest.raises(spy.SPYValueError, match="different attribute"):
            spy.AnalogData([a, b])

    def test_mismatching_shapes_rejected(self):
        a = self._mk(2, 1.0)
        b = spy.AnalogData(data=[np.ones((2, 3), "f4")], samplerate=1.0)
        with pytest.raises(spy.SPYValueError, match="mismatching shapes"):
            spy.AnalogData([a, b])

    def test_different_stacking_rejected(self):
        a = self._mk(2, 1.0)
        b = spy.AnalogData(data=[np.ones((2, 5), "f4")], samplerate=1.0,
                           dimord=["channel", "time"])
        with pytest.raises(spy.SPYValueError, match="stacking"):
            spy.AnalogData([a, b])

    def test_channel_propagates(self):
        a, b = self._mk(2, 1.0), self._mk(2, 2.0)
        a.channel = ["c1", "c2"]
        b.channel = ["c1", "c2"]
        cat = spy.AnalogData([a, b])
        assert list(cat.channel) == ["c1", "c2"]


class TestRedefinetrialMatrix:
    """Behavioral matrix for redefinetrial (reference
    test_redefinetrial.py:42-266): incompatible-argument guards, offset
    forms, minlength filtering incl. empty results."""

    @pytest.fixture()
    def reg(self):
        arr = np.arange(200, dtype="f4").reshape(100, 2)
        trl = np.column_stack([np.arange(0, 100, 10), np.arange(10, 101, 10),
                               -np.full(10, 10)])
        return spy.AnalogData(data=arr, samplerate=10.0, trialdefinition=trl)

    @pytest.fixture()
    def irreg(self):
        lens = [10, 10, 10, 10, 10, 10, 10, 10, 15, 8]
        bounds = np.concatenate([[0], np.cumsum(lens)])
        arr = np.zeros((bounds[-1], 2), "f4")
        trl = np.column_stack([bounds[:-1], bounds[1:], np.zeros(10)])
        return spy.AnalogData(data=arr, samplerate=10.0, trialdefinition=trl)

    @pytest.mark.parametrize("kwargs", [
        dict(offset=-2, trl=3 * np.ones((1, 3))),
        dict(begsample=2, trl=3 * np.ones((1, 3))),
        dict(trl=3 * np.ones((1, 3)), toilim=[0, 1]),
        dict(minlength=2, toilim=[0, 1]),
        dict(begsample=2, minlength=2),
    ])
    def test_incompatible_arguments(self, reg, kwargs):
        from syncopy_tpu.datatype.methods.redefinetrial import redefinetrial

        with pytest.raises(spy.shared.errors.SPYError, match="Incompatible"):
            redefinetrial(reg, **kwargs)

    def test_offset_forms(self, reg):
        from syncopy_tpu.datatype.methods.redefinetrial import redefinetrial

        d = redefinetrial(reg, offset=12)
        assert np.all(d.trialdefinition[:, 2] == 2)  # -10 + 12
        d2 = redefinetrial(reg, offset=np.arange(10) - 5)
        assert np.array_equal(d2.trialdefinition[:, 2], -10 + np.arange(10) - 5)
        with pytest.raises(spy.SPYValueError, match="offsets"):
            redefinetrial(reg, offset=np.arange(9))
        with pytest.raises(spy.shared.errors.SPYTypeError, match="scalar"):
            redefinetrial(reg, offset="no-number")

    def test_minlength_matrix(self, reg, irreg):
        from syncopy_tpu.datatype.methods.redefinetrial import redefinetrial

        assert len(redefinetrial(reg, minlength=1).trials) == 10
        # nothing survives -> EMPTY object, not an error
        empty = redefinetrial(reg, minlength=2)
        assert empty.data is None
        assert len(redefinetrial(irreg, minlength=1).trials) == 9
        assert len(redefinetrial(irreg, minlength=1.5).trials) == 1
        assert redefinetrial(irreg, trials=[0, 1, 9], minlength=1.5).data is None
        with pytest.raises(spy.shared.errors.SPYTypeError, match="scalar"):
            redefinetrial(reg, minlength=np.arange(10))
        with pytest.raises(spy.SPYValueError, match="greater"):
            redefinetrial(reg, minlength=-0.1)

    def test_toilim_window(self, reg):
        from syncopy_tpu.datatype.methods.redefinetrial import redefinetrial

        d = redefinetrial(reg, toilim=[-0.5, -0.2])
        # window [-0.5, -0.2] s at 10 Hz with offset -10: samples 5..8
        assert np.all(d.trialdefinition[:, 1] - d.trialdefinition[:, 0] == 4)
        assert np.all(d.trialdefinition[:, 2] == -5)

    def test_begend_sample(self, reg):
        from syncopy_tpu.datatype.methods.redefinetrial import redefinetrial

        d = redefinetrial(reg, begsample=2, endsample=8)
        assert np.all(d.trialdefinition[:, 1] - d.trialdefinition[:, 0] == 6)
        arr0 = np.asarray(d.trials[0])
        assert np.array_equal(arr0, np.asarray(reg.trials[0])[2:8])


class TestComplexEquality:
    def test_phase_difference_detected(self):
        """__eq__ must not discard imaginary parts: payloads differing only
        in phase are NOT equal."""
        a = spy.SpectralData(data=(np.ones((10, 1, 4, 2)) * (1 + 1j)).astype("c8"),
                             samplerate=10)
        b = spy.SpectralData(data=(np.ones((10, 1, 4, 2)) * (1 - 1j)).astype("c8"),
                             samplerate=10)
        assert a != b
        c = spy.SpectralData(data=(np.ones((10, 1, 4, 2)) * (1 + 1j)).astype("c8"),
                             samplerate=10)
        assert a == c


# ---------------------------------------------------------------------- #
# Round-3 base-data depth (reference tests/test_basedata.py:35-300)
# ---------------------------------------------------------------------- #

import h5py  # noqa: E402

from syncopy_tpu.datatype.continuous_data import SpectralData  # noqa: E402


class TestDataAllocation:
    """Payload allocation from every supported source for every class
    (reference test_data_alloc)."""

    shapes = {
        "AnalogData": (20, 2),
        "SpectralData": (4, 1, 5, 2),
        "CrossSpectralData": (2, 5, 3, 3),
        "SpikeData": (15, 3),
        "EventData": (10, 2),
    }

    def _make_payload(self, dclass):
        shp = self.shapes[dclass]
        if dclass in ("SpikeData", "EventData"):
            rng = np.random.default_rng(1)
            arr = rng.integers(0, 10, size=shp).astype(np.int64)
            arr[:, 0] = np.sort(arr[:, 0])
            return arr
        return np.arange(np.prod(shp), dtype="f4").reshape(shp)

    @pytest.mark.parametrize("dclass", list(shapes))
    def test_hdf5_dataset_allocation(self, dclass, tmp_path):
        from syncopy_tpu import datatype as spd

        arr = self._make_payload(dclass)
        hname = str(tmp_path / (dclass + ".h5"))
        with h5py.File(hname, "w") as f:
            f.create_dataset("dummy", data=arr)
        dset = h5py.File(hname, "r+")["dummy"]
        dummy = getattr(spd, dclass)(data=dset)
        assert np.array_equal(np.asarray(dummy.data), arr)
        assert dummy.mode == "r+"
        dummy._close_hdf()

    @pytest.mark.parametrize("dclass", list(shapes))
    def test_wrong_ndim_dataset_rejected(self, dclass, tmp_path):
        from syncopy_tpu import datatype as spd

        hname = str(tmp_path / (dclass + "_bad.h5"))
        with h5py.File(hname, "w") as f:
            f.create_dataset("bad", data=np.ones(7))
        dset = h5py.File(hname, "r+")["bad"]
        with pytest.raises(spy.SPYValueError):
            getattr(spd, dclass)(data=dset)
        dset.file.close()

    def test_closed_dataset_rejected(self, tmp_path):
        hname = str(tmp_path / "closed.h5")
        with h5py.File(hname, "w") as f:
            f.create_dataset("dummy", data=np.ones((20, 2), "f4"))
        f2 = h5py.File(hname, "r")
        dset = f2["dummy"]
        f2.close()
        with pytest.raises(spy.SPYValueError):
            spy.AnalogData(data=dset)

    def test_mixed_real_complex_list_rejected(self):
        with pytest.raises(spy.SPYValueError, match="real/complex"):
            spy.AnalogData(data=[np.ones((4, 2), "f4"),
                                 np.ones((4, 2), "c8")])

    def test_list_allocation_with_channel_labels(self):
        arr = np.ones((8, 3), "f4")
        dummy = spy.AnalogData(data=[arr, arr], channel=["a", "b", "c"],
                               samplerate=10.0)
        assert len(dummy.trials) == 2
        assert list(dummy.channel) == ["a", "b", "c"]
        assert dummy.samplerate == 10.0


class TestModeSwitching:
    def test_readonly_blocks_writes(self, tmp_path):
        ad = spy.AnalogData(data=np.ones((20, 2), "f4"), samplerate=5.0)
        spy.save(ad, container=str(tmp_path / "m"))
        # release the writer's handle: HDF5 merges same-process file opens,
        # so a lingering r+ handle would silently defeat the r reopen
        ad._close_hdf()
        obj = spy.load(str(tmp_path / "m.spy"))
        obj.mode = "r"
        assert not obj.is_writable
        with pytest.raises((OSError, RuntimeError, ValueError, spy.SPYError)):
            obj.data[0, 0] = 99.0
        obj.mode = "r+"
        assert obj.is_writable
        obj.data[0, 0] = 99.0
        assert float(obj.data[0, 0]) == 99.0


class TestTrialdefinitionValidation:
    def _obj(self):
        return spy.AnalogData(data=np.ones((10, 2), "f4"), samplerate=5.0)

    def test_stop_beyond_payload(self):
        with pytest.raises(spy.SPYValueError):
            self._obj().trialdefinition = np.array([[0, 50, 0]], float)

    def test_start_after_stop(self):
        with pytest.raises(spy.SPYValueError):
            self._obj().trialdefinition = np.array([[5, 2, 0]], float)

    def test_negative_start(self):
        with pytest.raises(spy.SPYValueError):
            self._obj().trialdefinition = np.array([[-3, 5, 0]], float)

    def test_too_few_columns(self):
        with pytest.raises((spy.SPYValueError, IndexError)):
            self._obj().trialdefinition = np.array([[0, 5]], float)

    def test_extra_columns_become_trialinfo(self):
        obj = self._obj()
        obj.trialdefinition = np.array([[0, 5, 0, 7, 8], [5, 10, 0, 9, 10]],
                                       float)
        assert np.array_equal(obj.trialinfo, [[7, 8], [9, 10]])


class TestInfoAndLog:
    def test_info_accepts_json_rejects_objects(self):
        obj = spy.AnalogData(data=np.ones((4, 2), "f4"))
        obj.info = {"nested": {"list": [1, 2, 3]}, "s": "x"}
        assert obj.info["nested"]["list"] == [1, 2, 3]
        with pytest.raises((spy.SPYTypeError, spy.SPYValueError, TypeError)):
            obj.info = {"bad": object()}

    def test_log_appends_with_timestamp(self):
        obj = spy.AnalogData(data=np.ones((4, 2), "f4"))
        obj.log = "first entry"
        obj.log = "second entry"
        assert "first entry" in obj._log
        assert "second entry" in obj._log
        assert obj._log.index("first entry") < obj._log.index("second entry")

    def test_log_propagates_through_analysis(self):
        d = spy.synthdata.white_noise(nTrials=2, nSamples=128, nChannels=2,
                                      seed=0)
        d.log = "my preprocessing note"
        spec = spy.freqanalysis(d, method="mtmfft", taper="hann")
        assert "my preprocessing note" in spec._log


class TestEqualitySemantics:
    def test_different_class_not_equal(self):
        a = spy.AnalogData(data=np.ones((4, 1, 2, 2), "f4").reshape(4, 4))
        s = SpectralData(data=np.ones((4, 1, 2, 2), "f4"))
        assert a != s

    def test_payload_difference_detected(self, adata_equal):
        cp = adata_equal.copy()
        assert cp == adata_equal
        arr = np.asarray(cp.data)
        arr[0, 0] += 1.0
        cp.data = arr
        assert cp != adata_equal

    def test_trialdefinition_difference_detected(self, adata_equal):
        cp = adata_equal.copy()
        trl = np.array(cp.trialdefinition)
        trl[0, 2] = -42
        cp.trialdefinition = trl
        assert cp != adata_equal

    def test_extra_dataset_difference_detected(self, adata_equal):
        cp = adata_equal.copy()
        cp._register_dataset("extra", np.ones(3))
        assert cp != adata_equal

    def test_non_spy_comparison(self, adata_equal):
        assert adata_equal != 42
        assert not (adata_equal == "object")
