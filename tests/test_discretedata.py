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
