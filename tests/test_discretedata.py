# -*- coding: utf-8 -*-
# Discrete-data & event-based trial definition tests (modeled on
# reference tests/test_discretedata.py).

import numpy as np
import pytest

import syncopy_tpu as spy


@pytest.fixture()
def evt_and_analog():
    """Continuous data + trigger events at known samples."""
    rng = np.random.default_rng(5)
    adata = spy.AnalogData(data=rng.normal(size=(10000, 2)).astype("f4"), samplerate=1000)
    # trigger code 1 at samples 1000, 3000, 5000, 7000; stop code 2 afterwards
    samples = np.array([1000, 1500, 3000, 3500, 5000, 5500, 7000, 7500])
    codes = np.array([1, 2, 1, 2, 1, 2, 1, 2])
    evt = spy.EventData(data=np.column_stack([samples, codes]).astype(np.int64), samplerate=1000)
    return evt, adata


class TestEventTrials:
    def test_trigger_pre_post(self, evt_and_analog):
        evt, adata = evt_and_analog
        spy.definetrial(adata, trialdefinition=evt, pre=0.2, post=0.5, trigger=1)
        trl = adata.trialdefinition
        assert trl.shape[0] == 4
        assert np.all(trl[:, 1] - trl[:, 0] == 700)
        assert np.all(trl[:, 2] == -200)
        assert trl[0, 0] == 800

    def test_start_stop_codes(self, evt_and_analog):
        evt, adata = evt_and_analog
        spy.definetrial(adata, trialdefinition=evt, start=1, stop=2)
        trl = adata.trialdefinition
        assert trl.shape[0] == 4
        assert np.all(trl[:, 1] - trl[:, 0] == 500)

    def test_clip_edges(self, evt_and_analog):
        evt, adata = evt_and_analog
        # huge post -> trials run past the recording; clipped when requested
        with pytest.raises(spy.SPYValueError):
            spy.definetrial(adata, trialdefinition=evt, pre=0.2, post=99.0, trigger=1)
        spy.definetrial(adata, trialdefinition=evt, pre=0.2, post=99.0, trigger=1, clip_edges=True)
        assert np.all(adata.trialdefinition[:, 1] <= 10000)

    def test_clip_edges_left_offset(self):
        # trigger@10, pre=post=0.1s @ 500 Hz -> span [-40, 60), offset -50;
        # clipping 40 leading samples moves the first sample CLOSER to the
        # trigger: offset must become -10 (sign regression)
        evt = spy.EventData(np.array([[10, 1], [380, 1]]), samplerate=500,
                            dimord=["sample", "eventid"])
        tgt = spy.AnalogData(data=np.zeros((400, 2), "f4"), samplerate=500)
        spy.definetrial(tgt, trialdefinition=evt, pre=0.1, post=0.1,
                        trigger=1, clip_edges=True)
        trl = tgt.trialdefinition
        assert trl[0].tolist() == [0.0, 60.0, -10.0]
        assert trl[1].tolist() == [330.0, 400.0, -50.0]


class TestEventData:
    def test_init_and_selection(self):
        samples = np.arange(0, 1000, 10)
        codes = np.tile([1, 2], 50)
        evt = spy.EventData(data=np.column_stack([samples, codes]).astype(np.int64), samplerate=1000)
        assert evt.dimord == ["sample", "eventid"]
        # eventid entries INDEX the sorted unique ids (reference semantics,
        # test_selectdata.py:607-650): index 0 -> id value 1
        sel = spy.selectdata(evt, eventid=[0])
        assert np.all(np.asarray(sel.data)[:, 1] == 1)
        sel2 = spy.selectdata(evt, eventid=[1])
        assert np.all(np.asarray(sel2.data)[:, 1] == 2)


class TestSpikeDataExtras:
    def test_waveform_dataset(self):
        data = np.column_stack([np.arange(50), np.zeros(50), np.zeros(50)]).astype(np.int64)
        spd = spy.SpikeData(data=data, samplerate=1000)
        wf = np.random.randn(50, 1, 16).astype("f4")
        spd.waveform = wf
        assert np.allclose(np.asarray(spd.waveform), wf)

    def test_unit_labels(self):
        data = np.column_stack(
            [np.arange(30), np.zeros(30), np.tile([0, 1, 2], 10)]
        ).astype(np.int64)
        spd = spy.SpikeData(data=data, samplerate=1000)
        assert len(spd.unit) == 3
        spd.unit = ["a", "b", "c"]
        assert list(spd.unit) == ["a", "b", "c"]

    def test_trial_latency_selection(self):
        data = np.column_stack(
            [np.arange(0, 2000, 10), np.zeros(200), np.zeros(200)]
        ).astype(np.int64)
        spd = spy.SpikeData(data=data, samplerate=1000)
        spd.trialdefinition = np.array([[0, 1000, 0], [1000, 2000, 0]])
        sel = spy.selectdata(spd, trials=[0], latency=[0.1, 0.5])
        arr = np.asarray(sel.data)
        assert arr[:, 0].min() >= 100
        assert arr[:, 0].max() <= 500


class TestSaveLoadDiscrete:
    def test_spike_roundtrip(self, tmp_path):
        data = np.column_stack(
            [np.sort(np.random.randint(0, 5000, 300)), np.random.randint(0, 3, 300),
             np.random.randint(0, 2, 300)]
        ).astype(np.int64)
        spd = spy.SpikeData(data=data, samplerate=1000)
        spy.save(spd, container=str(tmp_path / "spk"))
        loaded = spy.load(str(tmp_path / "spk.spy"))
        assert isinstance(loaded, spy.SpikeData)
        assert np.array_equal(np.asarray(loaded.data), data)


class TestSpikeDataInitMatrix:
    """Init validation (modeled on reference test_discretedata.py:54-130)."""

    def test_default_labels_span_dense_ids(self):
        d = spy.SpikeData(data=4 * np.ones((2, 3), dtype=int))
        # dense 0..max-id label grid (deviation from the reference's
        # unique-ids-only labels: positions == ids keeps selection O(1))
        assert list(d.channel)[-1] == "channel5"
        assert list(d.unit)[-1] == "unit5"

    def test_unique_count_labels_expand(self):
        d = spy.SpikeData(data=4 * np.ones((2, 3), dtype=int),
                          channel=["only_channel"])
        assert d.channel[4] == "only_channel"

    def test_non_integer_data_rejected(self):
        with pytest.raises(spy.shared.errors.SPYTypeError, match="integer like"):
            spy.SpikeData(data=np.array([np.nan, 2, np.nan])[:, None])
        with pytest.raises(spy.shared.errors.SPYTypeError, match="integer like"):
            spy.SpikeData(data=np.full((2, 3), 1.5))

    def test_integer_valued_floats_accepted(self):
        d = spy.SpikeData(data=np.ones((2, 3)))
        assert np.issubdtype(np.asarray(d.data).dtype, np.integer)

    def test_wrong_label_count_rejected(self):
        with pytest.raises(spy.shared.errors.SPYValueError, match="unit"):
            spy.SpikeData(data=np.zeros((2, 3), dtype=int),
                          unit=["unit1", "unit2"])

    def test_labels_without_data_rejected(self):
        with pytest.raises(spy.shared.errors.SPYValueError, match="without data"):
            spy.SpikeData(channel=["a", "b", "c"])

    def test_empty_and_flat_data_rejected(self):
        with pytest.raises(spy.shared.errors.SPYValueError, match="non empty"):
            spy.SpikeData(np.column_stack(([], [], [])).astype(int))
        with pytest.raises(spy.shared.errors.SPYValueError, match="2-dimensional"):
            spy.SpikeData(np.ones((3,), dtype=int))

    def test_trial_retrieval_custom_dimord(self):
        rng = np.random.default_rng(42)
        ns = 30
        data = np.column_stack([
            np.sort(rng.choice(ns, size=20)),
            rng.choice(4, size=20),
            rng.choice(2, size=20),
        ]).astype(int)
        trl = np.column_stack([np.arange(0, ns, 10), np.arange(10, ns + 1, 10),
                               np.zeros(3)])
        # swapped dimord: sample LAST
        data2 = data[:, ::-1]
        d = spy.SpikeData(data2, trialdefinition=trl,
                          dimord=["unit", "channel", "sample"])
        smp = data2[:, -1]
        for tid, start in enumerate(range(0, ns, 10)):
            ref = data2[(smp >= start) & (smp < start + 10)]
            assert np.array_equal(np.asarray(d._get_trial(tid)), ref)


class TestEventTrialSettingMatrix:
    """definetrial from EventData across samplerates and with start/stop
    code sequences (reference test_discretedata.py:366-430)."""

    ns = 30

    def _evt(self, sr=2.0):
        # alternating 0/1 codes every 3rd sample
        samples = np.arange(0, self.ns, 3)
        codes = np.tile([0, 1], len(samples))[: len(samples)]
        data = np.column_stack([samples, codes]).astype(int)
        return spy.EventData(data=data, samplerate=sr), data

    def test_trigger_rate_conversion(self):
        sr_e, sr_a, pre, post = 2.0, 1.0, 2.0, 1.0
        evt, data = self._evt(sr_e)
        adata = spy.AnalogData(data=np.zeros((100, 2), "f4"), samplerate=sr_a)
        spy.definetrial(adata, trialdefinition=evt, pre=pre, post=post,
                        trigger=1, clip_edges=True)
        msk = data[:, 1] == 1
        sinfo = np.column_stack([data[msk, 0] / sr_e - pre, data[msk, 0] / sr_e + post])
        sinfo_a = np.clip(np.round(sinfo * sr_a), 0, 100).astype(int)
        assert np.array_equal(adata.sampleinfo, sinfo_a)

    def test_trigger_same_rate(self):
        evt, data = self._evt(2.0)
        spy.definetrial(evt, pre=1.0, post=1.0, trigger=1, clip_edges=True)
        msk = data[:, 1] == 1
        nsamp = int(data[:, 0].max()) + 1
        expected = np.column_stack([
            np.clip(data[msk, 0] - 2, 0, None),
            np.clip(data[msk, 0] + 2, None, nsamp),
        ])
        assert np.array_equal(evt.sampleinfo, expected)

    def test_start_stop_scalar(self):
        evt, data = self._evt(2.0)
        spy.definetrial(evt, start=0, stop=1)
        starts = data[data[:, 1] == 0, 0]
        stops = data[data[:, 1] == 1, 0]
        expected = np.column_stack([starts[: len(stops)], stops])
        got = evt.sampleinfo
        assert np.array_equal(got[:, 0], expected[: len(got), 0])

    def test_start_stop_sequences(self):
        # codes: 2 0 1 2 0 1 ... consume [2, 0] starts with [1, 1] stops
        samples = np.arange(0, 18, 2)
        codes = np.tile([2, 0, 1], 3)
        evt = spy.EventData(
            data=np.column_stack([samples, codes]).astype(int), samplerate=1.0
        )
        spy.definetrial(evt, start=[2, 0], stop=[1, 1])
        # 1st: start at code-2 sample 0, stop at next code-1 sample 4
        # 2nd: start at next code-0 (sample 8), stop at next code-1 (sample 10)
        assert np.array_equal(evt.sampleinfo, [[0, 4], [8, 10]])

    def test_start_stop_length_mismatch(self):
        evt, _ = self._evt()
        with pytest.raises(spy.shared.errors.SPYValueError, match="equally long"):
            spy.definetrial(evt, start=[0, 1], stop=[1])


# ---------------------------------------------------------------------- #
# Round-3 semantics sweep (reference tests/test_discretedata.py:24-660)
# ---------------------------------------------------------------------- #

def _spikes(n=40, n_chan=3, n_unit=4, n_samp=200, seed=0):
    rng = np.random.default_rng(seed)
    samples = np.sort(rng.integers(0, n_samp, size=n))
    chans = rng.integers(0, n_chan, size=n)
    units = rng.integers(0, n_unit, size=n)
    return np.column_stack([samples, chans, units]).astype(np.int64)


class TestSpikeDataSemantics:
    def test_empty(self):
        sd = spy.SpikeData()
        assert sd.data is None
        assert sd.channel is None
        assert sd.sample is None
        assert sd.unit_idx is None

    def test_sample_property(self):
        arr = _spikes()
        sd = spy.SpikeData(data=arr, samplerate=1000.0)
        assert np.array_equal(sd.sample, arr[:, 0])

    def test_unit_channel_idx_are_unique_present_ids(self):
        arr = _spikes()
        sd = spy.SpikeData(data=arr, samplerate=1000.0)
        assert np.array_equal(sd.channel_idx, np.unique(arr[:, 1]))
        assert np.array_equal(sd.unit_idx, np.unique(arr[:, 2]))

    def test_default_labels_dense(self):
        arr = np.array([[5, 0, 2], [9, 2, 2], [14, 2, 3]], dtype=np.int64)
        sd = spy.SpikeData(data=arr, samplerate=1.0)
        # dense labels span 0..max present id
        assert len(sd.channel) == 3
        assert len(sd.unit) == 4

    def test_label_assignment_per_present_id(self):
        arr = np.array([[5, 0, 0], [9, 2, 1]], dtype=np.int64)
        sd = spy.SpikeData(data=arr, samplerate=1.0)
        # two unique channels (0, 2): a 2-label list lands on those ids
        sd.channel = ["front", "back"]
        assert sd.channel[0] == "front"
        assert sd.channel[2] == "back"
        with pytest.raises(spy.SPYValueError):
            sd.channel = ["a", "b", "c", "d"]

    def test_label_assignment_without_data_rejected(self):
        sd = spy.SpikeData()
        with pytest.raises(spy.SPYValueError):
            sd.channel = ["a"]
        with pytest.raises(spy.SPYValueError):
            sd.unit = ["u"]

    def test_trialid_trialtime(self):
        arr = np.array([[2, 0, 0], [7, 0, 0], [12, 0, 0], [30, 0, 0]],
                       dtype=np.int64)
        sd = spy.SpikeData(data=arr, samplerate=10.0)
        sd.trialdefinition = np.array([[0, 10, -5], [10, 20, 0]], float)
        assert np.array_equal(sd.trialid, [0, 0, 1, -1])
        tt = sd.trialtime
        assert tt[0] == pytest.approx((2 - 5) / 10.0)
        assert tt[2] == pytest.approx((12 - 10) / 10.0)
        assert np.isnan(tt[3])  # outside any trial

    def test_trialretrieval(self):
        arr = _spikes(seed=2)
        sd = spy.SpikeData(data=arr, samplerate=1000.0)
        sd.trialdefinition = np.array([[0, 100, 0], [100, 200, 0]], float)
        t0 = np.asarray(sd._get_trial(0))
        t1 = np.asarray(sd._get_trial(1))
        assert np.array_equal(t0, arr[arr[:, 0] < 100])
        assert np.array_equal(t1, arr[arr[:, 0] >= 100])
        assert len(t0) + len(t1) == len(arr)

    def test_selection_by_unit_label(self):
        arr = _spikes(seed=3)
        sd = spy.SpikeData(data=arr, samplerate=1000.0)
        labels = [str(u) for u in np.asarray(sd.unit)]
        sub = sd.selectdata(unit=[labels[1]])
        got = np.asarray(sub.data)
        assert np.all(got[:, 2] == 1)
        assert len(got) == int((arr[:, 2] == 1).sum())

    def test_selection_by_latency(self):
        arr = _spikes(seed=4)
        sd = spy.SpikeData(data=arr, samplerate=1000.0)
        sd.trialdefinition = np.array([[0, 200, 0]], float)
        sub = sd.selectdata(latency=[0.05, 0.1])
        got = np.asarray(sub.data)
        assert got.size == 0 or (got[:, 0].min() >= 50 and got[:, 0].max() <= 100)
        mask = (arr[:, 0] >= 50) & (arr[:, 0] <= 100)
        assert len(got) == int(mask.sum())

    def test_str_repr_with_trials(self):
        sd = spy.SpikeData(data=_spikes(), samplerate=1000.0)
        sd.trialdefinition = np.array([[0, 100, 0], [100, 200, 0]], float)
        rep = str(sd)
        assert "SpikeData" in rep

    def test_saveload_roundtrip(self, tmp_path):
        sd = spy.SpikeData(data=_spikes(seed=5), samplerate=1000.0)
        sd.trialdefinition = np.array([[0, 100, 0], [100, 200, 0]], float)
        sd.channel = [str(c) for c in np.asarray(sd.channel)]
        spy.save(sd, container=str(tmp_path / "sp"))
        back = spy.load(str(tmp_path / "sp.spy"))
        assert back == sd
        assert np.array_equal(back.trialdefinition, sd.trialdefinition)
        assert back.samplerate == sd.samplerate


class TestWaveformDataset:
    def _sd(self, n=25, seed=6):
        sd = spy.SpikeData(data=_spikes(n=n, seed=seed), samplerate=1000.0)
        return sd, n

    def test_valid_set_and_roundtrip(self, tmp_path):
        sd, n = self._sd()
        wf = np.random.default_rng(1).normal(size=(n, 16)).astype("f4")
        sd.waveform = wf
        assert np.array_equal(np.asarray(sd.waveform), wf)
        spy.save(sd, container=str(tmp_path / "wf"))
        back = spy.load(str(tmp_path / "wf.spy"))
        assert np.array_equal(np.asarray(back.waveform), wf)

    def test_row_mismatch_rejected(self):
        sd, n = self._sd()
        with pytest.raises(spy.SPYValueError):
            sd.waveform = np.zeros((n + 3, 16), "f4")

    def test_none_detaches(self):
        sd, n = self._sd()
        sd.waveform = np.zeros((n, 8), "f4")
        sd.waveform = None
        assert sd.waveform is None

    def test_constructor_kwarg(self):
        arr = _spikes(n=10, seed=7)
        wf = np.ones((10, 4), "f4")
        sd = spy.SpikeData(data=arr, samplerate=1.0, waveform=wf)
        assert np.array_equal(np.asarray(sd.waveform), wf)


class TestEventDataSemantics:
    def test_empty(self):
        ev = spy.EventData()
        assert ev.data is None and ev.eventid is None

    def test_nparray(self):
        arr = np.array([[10, 1], [20, 2], [30, 1]], dtype=np.int64)
        ev = spy.EventData(data=arr, samplerate=100.0)
        assert np.array_equal(ev.eventid, [1, 2])
        assert np.array_equal(ev.sample, [10, 20, 30])

    def test_custom_dimord_extra_columns(self):
        arr = np.array([[10, 1, 5], [20, 2, 7]], dtype=np.int64)
        ev = spy.EventData(data=arr, samplerate=100.0,
                           dimord=["sample", "eventid", "duration"])
        assert ev.dimord == ["sample", "eventid", "duration"]
        assert np.array_equal(ev.eventid, [1, 2])

    def test_custom_dimord_requires_sample(self):
        with pytest.raises(spy.SPYValueError):
            spy.EventData(data=np.zeros((3, 2), np.int64),
                          dimord=["eventid", "duration"])

    def test_swapped_dimord(self):
        arr = np.array([[1, 10], [2, 20]], dtype=np.int64)
        ev = spy.EventData(data=arr, samplerate=100.0,
                           dimord=["eventid", "sample"])
        assert np.array_equal(ev.sample, [10, 20])
        assert np.array_equal(ev.eventid, [1, 2])

    def test_trialretrieval(self):
        arr = np.array([[10, 1], [110, 2], [150, 1]], dtype=np.int64)
        ev = spy.EventData(data=arr, samplerate=100.0)
        ev.trialdefinition = np.array([[0, 100, 0], [100, 200, 0]], float)
        assert np.array_equal(np.asarray(ev._get_trial(0)), arr[:1])
        assert np.array_equal(np.asarray(ev._get_trial(1)), arr[1:])

    def test_selection_by_eventid(self):
        # eventid selections are POSITIONS into the unique-code list
        # (same convention as unit selections)
        arr = np.array([[10, 1], [20, 2], [30, 1], [40, 3]], dtype=np.int64)
        ev = spy.EventData(data=arr, samplerate=100.0)
        sub = ev.selectdata(eventid=[0])  # first unique code == 1
        got = np.asarray(sub.data)
        assert np.all(got[:, 1] == 1) and len(got) == 2
        sub2 = ev.selectdata(eventid=[1, 2])  # codes 2 and 3
        assert np.array_equal(np.asarray(sub2.data)[:, 1], [2, 3])

    def test_saveload_roundtrip(self, tmp_path):
        arr = np.array([[10, 1], [110, 2]], dtype=np.int64)
        ev = spy.EventData(data=arr, samplerate=100.0)
        ev.trialdefinition = np.array([[0, 100, 0], [100, 200, 0]], float)
        spy.save(ev, container=str(tmp_path / "ev"))
        back = spy.load(str(tmp_path / "ev.spy"))
        assert back == ev

    def test_definetrial_from_events(self):
        """EventData start/stop triggers define trials on AnalogData
        (reference methods/definetrial.py:18)."""
        ad = spy.AnalogData(data=np.zeros((1000, 2), "f4"), samplerate=1000.0)
        evt = np.array([[100, 1], [300, 2], [500, 1], [700, 2]], np.int64)
        ev = spy.EventData(data=evt, samplerate=1000.0)
        spy.definetrial(ad, trialdefinition=ev, start=1, stop=2)
        assert len(ad.trials) == 2
        assert np.array_equal(ad.sampleinfo, [[100, 300], [500, 700]])


class TestUniqueColumnCache:
    def test_alternating_access_stays_cached(self, monkeypatch):
        arr = _spikes(seed=8)
        sd = spy.SpikeData(data=arr, samplerate=1000.0)
        calls = []
        orig = np.unique

        def counting(x, *a, **kw):
            calls.append(1)
            return orig(x, *a, **kw)

        monkeypatch.setattr(np, "unique", counting)
        sd.channel_idx, sd.unit_idx, sd.channel_idx, sd.unit_idx  # noqa: B018
        assert len(calls) == 2  # one np.unique per column, ever

    def test_cache_invalidated_on_payload_change(self):
        arr = _spikes(seed=9)
        sd = spy.SpikeData(data=arr, samplerate=1000.0)
        before = sd.unit_idx.copy()
        arr2 = arr.copy()
        arr2[:, 2] = 7
        sd.data = arr2
        assert np.array_equal(sd.unit_idx, [7])
        assert not np.array_equal(sd.unit_idx, before)
