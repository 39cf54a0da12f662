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
