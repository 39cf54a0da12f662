# -*- coding: utf-8 -*-
#
# Selector semantics matrix (modeled on the reference's exhaustive
# tests/test_selectdata.py:34-650): unordered/repeated fancy indices x
# latency windows x channel_i/j x unit/eventid, per data class, verified
# against hand-picked numpy solutions.

import numpy as np
import pytest

import syncopy_tpu as spy
from syncopy_tpu.datatype.selector import Selector
from syncopy_tpu.shared.errors import SPYError, SPYValueError


class TestAnalogSelections:
    nChannels, nSamples, nTrials = 10, 5, 3
    samplerate = 2.0

    @pytest.fixture()
    def adata(self):
        trl = np.vstack([
            np.arange(0, self.nSamples * self.nTrials, self.nSamples),
            np.arange(0, self.nSamples * self.nTrials, self.nSamples) + self.nSamples,
            np.ones(self.nTrials) * -1,
        ]).T
        data = np.arange(
            1, self.nTrials * self.nChannels * self.nSamples + 1
        ).reshape(self.nChannels, self.nSamples * self.nTrials).T
        return spy.AnalogData(data=data, samplerate=self.samplerate, trialdefinition=trl)

    def test_typical_selection_values(self, adata):
        # time axis per trial: [-0.5, 0, 0.5, 1, 1.5]; latency [0, 1]
        # covers sample indices 1..3
        res = spy.selectdata(adata, {"trials": 1, "channel": [6, 2], "latency": [0, 1]})
        sol = np.asarray(adata.data)[self.nSamples : 2 * self.nSamples]
        sol = np.column_stack([sol[1:4, 6], sol[1:4, 2]])
        assert np.array_equal(sol, np.asarray(res.data))

    def test_unordered_channel_labels(self, adata):
        sel = Selector(adata, {"channel": ["channel03", "channel01"],
                               "latency": [0, 1], "trials": np.arange(2)})
        assert list(sel.channel) == [2, 0]
        assert list(sel.trial_ids) == [0, 1]
        assert list(sel.time) == [slice(1, 4, 1), slice(1, 4, 1)]

    def test_repeated_fancy_indices(self, adata):
        sel = Selector(adata, {"channel": [7, 3, 3], "trials": [0, 1, 1]})
        assert list(sel.channel) == [7, 3, 3]
        assert list(sel.trial_ids) == [0, 1, 1]
        # repetition must materialize in the data too
        res = spy.selectdata(adata, {"channel": [7, 3, 3], "trials": [0, 1, 1]})
        assert res.data.shape == (3 * self.nSamples, 3)
        arr = np.asarray(res.data)
        assert np.array_equal(arr[:, 1], arr[:, 2])
        assert np.array_equal(
            arr[self.nSamples : 2 * self.nSamples], arr[2 * self.nSamples :]
        )

    @pytest.mark.parametrize("sel_kw,err,msg", [
        ({"channel": ["channel33", "channel01"]}, SPYValueError, "existing label"),
        ({"channel": "my-non-existing-channel"}, SPYValueError, "existing label"),
        ({"channel": 99}, SPYValueError, "index"),
        ({"latency": [0, 10]}, SPYValueError, "at least one trial covering"),
        ({"latency": "sth-wrong"}, SPYValueError, "maxperiod"),
        ({"trials": [-3]}, SPYValueError, "bound"),
        ({"frequency": [1, 2]}, SPYValueError, "no 'frequency' selection"),
    ])
    def test_invalid_selections(self, adata, sel_kw, err, msg):
        with pytest.raises(err, match=msg):
            spy.selectdata(adata, sel_kw)


class TestSpectralSelections:
    nChannels, nSamples, nTrials, nTaper, nFreqs = 3, 3, 3, 2, 3
    samplerate = 2.0

    @pytest.fixture()
    def sdata(self):
        trl = np.vstack([
            np.arange(0, self.nSamples * self.nTrials, self.nSamples),
            np.arange(0, self.nSamples * self.nTrials, self.nSamples) + self.nSamples,
            np.ones(self.nTrials) * 2,
        ]).T
        data = np.arange(
            1, self.nChannels * self.nSamples * self.nTrials * self.nFreqs * self.nTaper + 1
        ).reshape(self.nSamples * self.nTrials, self.nTaper, self.nFreqs, self.nChannels).astype(float)
        sd = spy.SpectralData(data=data, samplerate=self.samplerate, trialdefinition=trl)
        sd.freq = [20, 40, 60]
        return sd

    def test_typical_selection_values(self, sdata):
        # time axis per trial: [1, 1.5, 2]; latency [1, 1.5] -> samples 0..1
        # frequency [25, 50] -> only 40 Hz (index 1)
        res = spy.selectdata(
            sdata, {"trials": 1, "channel": [1, 0], "latency": [1, 1.5],
                    "frequency": [25, 50]},
        )
        sol = np.asarray(sdata.data)[self.nSamples : 2 * self.nSamples]
        sol = np.stack([sol[:2, :, [1], 1], sol[:2, :, [1], 0]], axis=-1)
        assert np.array_equal(sol, np.asarray(res.data))

    def test_frequency_best_match_and_taper(self, sdata):
        sel = Selector(sdata, {"frequency": np.array([30, 60]), "taper": [1, 0]})
        assert sel.freq == slice(1, 3, 1)
        assert list(sel.taper) == [1, 0]

    def test_taper_by_name_and_all_freq(self, sdata):
        sel = Selector(sdata, {"frequency": "all", "taper": "taper2",
                               "latency": [1.2, 1.7], "trials": np.arange(1, 3)})
        assert sel.freq == slice(None)
        assert sel.taper == slice(1, 2, 1)
        assert list(sel.time) == [slice(1, 2, 1), slice(1, 2, 1)]
        assert list(sel.trial_ids) == [1, 2]

    @pytest.mark.parametrize("sel_kw,err", [
        ({"taper": "taper13"}, SPYValueError),
        ({"taper": [18, 99]}, SPYValueError),
    ])
    def test_invalid(self, sdata, sel_kw, err):
        with pytest.raises(err):
            spy.selectdata(sdata, sel_kw)


class TestCrossSpectralSelections:
    nChannels, nSamples, nTrials, nFreqs = 3, 3, 3, 3
    samplerate = 2.0

    @pytest.fixture()
    def csd(self):
        trl = np.vstack([
            np.arange(0, self.nSamples * self.nTrials, self.nSamples),
            np.arange(0, self.nSamples * self.nTrials, self.nSamples) + self.nSamples,
            np.ones(self.nTrials) * 2,
        ]).T
        data = np.arange(
            1, self.nChannels**2 * self.nSamples * self.nTrials * self.nFreqs + 1
        ).reshape(self.nSamples * self.nTrials, self.nFreqs, self.nChannels, self.nChannels).astype(float)
        cd = spy.CrossSpectralData(data=data, samplerate=self.samplerate)
        cd.trialdefinition = trl
        cd.freq = [20, 40, 60]
        return cd

    def test_typical_selection_values(self, csd):
        # trials REORDERED [1, 0]; latency [1.5, 2] -> samples 1..2;
        # frequency [25, 60] -> 40 and 60 Hz (indices 1..2); channel_i [0, 1]
        res = spy.selectdata(
            csd, {"trials": [1, 0], "channel_i": [0, 1], "latency": [1.5, 2],
                  "frequency": [25, 60]},
        )
        full = np.asarray(csd.data)
        sol = np.concatenate(
            [full[self.nSamples : 2 * self.nSamples], full[: self.nSamples]], axis=0
        )
        sol = np.concatenate([sol[1:3, 1:3, :2, :], sol[4:6, 1:3, :2, :]])
        assert np.array_equal(sol, np.asarray(res.data))

    def test_channel_ij_indexers(self, csd):
        def as_list(ind, n=3):
            return list(range(n))[ind] if isinstance(ind, slice) else list(ind)

        sel = Selector(csd, {"channel_i": [0, 1], "channel_j": [0, 2], "latency": [1, 2]})
        assert sel.channel_i == slice(0, 2, 1)
        assert as_list(sel.channel_j) == [0, 2]
        assert list(sel.time) == 3 * [slice(0, 3, 1)]
        sel2 = Selector(csd, {"channel_i": ["channel2", "channel3"], "channel_j": [1]})
        assert sel2.channel_i == slice(1, 3, 1)

    def test_invalid_channel_i(self, csd):
        with pytest.raises(SPYValueError):
            spy.selectdata(csd, {"channel_i": [0, 4]})


def _spike_data(nChannels=10, nTrials=5, samplerate=1.0, nSpikes=20):
    T_max = 2 * nSpikes
    nSamples = T_max // nTrials
    rng = np.random.default_rng(42)
    data = np.vstack([
        np.sort(rng.choice(range(T_max), size=nSpikes)),
        rng.choice(np.arange(0, nChannels), size=nSpikes),
        rng.choice(nChannels // 2, size=nSpikes),
    ]).T
    trl = np.vstack([
        np.arange(0, T_max, nSamples),
        np.arange(0, T_max, nSamples) + nSamples,
        np.ones(nTrials) * -2,
    ]).T
    return spy.SpikeData(data=data, samplerate=samplerate, trialdefinition=trl)


class TestSpikeSelections:
    def test_combined_selection_values(self):
        spkd = _spike_data()
        res = spy.selectdata(
            spkd, {"trials": [2, 4], "channel": [6, 2], "unit": [0, 3],
                   "latency": [-1, 4]},
        )
        arr = np.asarray(spkd.data)
        out_rows = []
        for tid in (2, 4):
            start, stop = spkd.trialdefinition[tid, :2]
            t0 = spkd.trialdefinition[tid, 2]
            m = (arr[:, 0] >= start) & (arr[:, 0] < stop)
            m &= np.isin(arr[:, 1], [6, 2]) & np.isin(arr[:, 2], [0, 3])
            tvec = (arr[:, 0] - start + t0) / spkd.samplerate
            m &= (tvec >= -1) & (tvec <= 4)
            out_rows.append(arr[m])
        sol = np.concatenate(out_rows, axis=0)
        assert np.array_equal(sol, np.asarray(res.data))

    def test_unit_by_label(self):
        spkd = _spike_data()
        labels = list(np.asarray(spkd.unit))
        res = spy.selectdata(spkd, {"unit": [labels[2], labels[0]]})
        ucol = np.asarray(res.data)[:, 2]
        assert set(np.unique(ucol)) <= {0, 2}

    @pytest.mark.parametrize("sel_kw,err,msg", [
        ({"channel": ["channel33", "channel01"]}, SPYValueError, "existing"),
        ({"channel": "my-non-existing-channel"}, SPYValueError, "existing"),
        ({"unit": 99}, SPYValueError, "existing"),
        ({"latency": [-11, -10]}, SPYValueError, "at least one trial covering"),
    ])
    def test_invalid(self, sel_kw, err, msg):
        with pytest.raises(err, match=msg):
            spy.selectdata(_spike_data(), sel_kw)


class TestEventSelections:
    def _edata(self):
        nSamples, nTrials = 4, 5
        eIDs = [0, 111, 31]
        rng = np.random.default_rng(42)
        trl = np.vstack([
            np.arange(0, nSamples * nTrials, nSamples),
            np.arange(0, nSamples * nTrials, nSamples) + nSamples,
            np.ones(nTrials) * -1,
        ]).T
        data = np.vstack([
            np.arange(0, nSamples * nTrials, 1),
            rng.choice(eIDs, size=nSamples * nTrials),
        ]).T
        return spy.EventData(data=data, samplerate=1.0, trialdefinition=trl)

    def test_eventid_indexes_unique_ids(self):
        edata = self._edata()
        # unique ids sorted: [0, 31, 111]; eventid=2 -> id value 111
        res = spy.selectdata(edata, {"eventid": 2, "latency": [0, 1], "trials": [0, 3]})
        arr = np.asarray(edata.data)
        rows = []
        for tid in (0, 3):
            start, stop = edata.trialdefinition[tid, :2]
            t0 = edata.trialdefinition[tid, 2]
            m = (arr[:, 0] >= start) & (arr[:, 0] < stop)
            m &= arr[:, 1] == 111
            tvec = (arr[:, 0] - start + t0) / edata.samplerate
            m &= (tvec >= 0) & (tvec <= 1)
            rows.append(arr[m])
        sol = np.concatenate(rows, axis=0)
        assert np.array_equal(sol, np.asarray(res.data))

    @pytest.mark.parametrize("sel_kw,err,msg", [
        ({"eventid": [5, 6]}, SPYValueError, "existing"),
        ({"eventid": "111"}, SPYValueError, "numeric"),
    ])
    def test_invalid(self, sel_kw, err, msg):
        with pytest.raises(err, match=msg):
            spy.selectdata(self._edata(), sel_kw)


class TestSelectionThroughCompute:
    """Unordered/repeated selections must flow correctly through the
    engine (positions -> gather -> stacking order)."""

    def test_reordered_trials_through_freqanalysis(self):
        d = spy.synthdata.white_noise(nTrials=6, nSamples=256, nChannels=3, seed=9)
        full = spy.freqanalysis(d, method="mtmfft", taper="hann")
        sel = spy.freqanalysis(d, method="mtmfft", taper="hann",
                               select={"trials": [4, 1, 1]})
        f = np.asarray(full.data)
        s = np.asarray(sel.data)
        assert np.allclose(s[0], f[4], atol=1e-6)
        assert np.allclose(s[1], f[1], atol=1e-6)
        assert np.allclose(s[2], f[1], atol=1e-6)

    def test_repeated_channels_through_compute(self):
        d = spy.synthdata.white_noise(nTrials=4, nSamples=256, nChannels=4, seed=10)
        full = spy.freqanalysis(d, method="mtmfft", taper="hann")
        sel = spy.freqanalysis(d, method="mtmfft", taper="hann",
                               select={"channel": [2, 0, 2]})
        f = np.asarray(full.data)
        s = np.asarray(sel.data)
        assert np.allclose(s[..., 0], f[..., 2], atol=1e-6)
        assert np.allclose(s[..., 1], f[..., 0], atol=1e-6)
        assert np.allclose(s[..., 2], f[..., 2], atol=1e-6)


class TestSelectorViewSurface:
    """Selector.trials / sampleinfo / trialintervals / create_get_trial
    (reference selector.py:253-313,457-481): absolute-trial-id access to
    the selected VIEW, and the selected trialdefinition derivatives."""

    def _data(self):
        ad = spy.synthdata.white_noise(
            nTrials=5, nChannels=4, nSamples=40, samplerate=100.0, seed=7
        )
        # give trials distinct offsets so trialintervals is nontrivial
        trl = np.array(ad.trialdefinition)
        trl[:, 2] = -10
        ad.trialdefinition = trl
        return ad

    def test_trials_absolute_indexing(self):
        ad = self._data()
        ad.selectdata(trials=[1, 3], channel=[0, 2], inplace=True)
        sel = ad.selection
        view = sel.trials
        assert len(view) == 2
        got = view[3]
        want = np.asarray(ad.trials[3])[:, [0, 2]]
        assert np.allclose(got, want)
        # unselected trial ids are rejected
        with pytest.raises(Exception, match="existing trial|part of the selection"):
            view[0]
        # iteration yields the selected view of each selected trial
        its = list(iter(view))
        assert len(its) == 2 and all(t.shape == (40, 2) for t in its)

    def test_trials_respects_latency(self):
        ad = self._data()
        ad.selectdata(trials=[2], latency=[-0.05, 0.1], inplace=True)
        sel = ad.selection
        got = sel.trials[2]
        tvec = (np.arange(40) - 10) / 100.0
        keep = (tvec >= -0.05) & (tvec <= 0.1)
        assert got.shape[0] == keep.sum()
        assert np.allclose(got, np.asarray(ad.trials[2])[keep])

    def test_sampleinfo_and_trialintervals(self):
        ad = self._data()
        ad.selectdata(trials=[0, 4], latency=[0.0, 0.2], inplace=True)
        sel = ad.selection
        si = sel.sampleinfo
        assert si.shape == (2, 2)
        assert np.allclose(si, sel.trialdefinition[:, :2])
        ti = sel.trialintervals
        # selected window starts at t=0.0; 21 samples -> last point 0.2 s
        assert np.allclose(ti, np.array([[0.0, 0.2], [0.0, 0.2]]))
        with pytest.raises(Exception, match="Cannot set"):
            sel.sampleinfo = si

    def test_no_selection_defaults(self):
        ad = self._data()
        ad.selectdata(inplace=True)
        sel = ad.selection
        assert len(sel.trials) == 5
        assert np.allclose(sel.trials[2], np.asarray(ad.trials[2]))
        assert sel.trialintervals.shape == (5, 2)
