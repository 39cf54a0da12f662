# -*- coding: utf-8 -*-
#
# Randomized combinatorial selector matrix: random products of selection
# keywords per data class, each verified against a generic numpy oracle
# that re-implements the documented semantics independently (modeled on
# the reference's exhaustive product loops, tests/test_selectdata.py:
# `test_general` / per-class `test_*_selection` sweeps).

import numpy as np
import pytest

import syncopy_tpu as spy


SR = 2.0
N_TRIALS, N_SAMPLES = 4, 6


def _trldef(n_trials=N_TRIALS, n_samples=N_SAMPLES, offset=-2):
    starts = np.arange(0, n_samples * n_trials, n_samples)
    return np.column_stack([starts, starts + n_samples,
                            np.full(n_trials, offset, float)])


def _tvec(offset=-2, n_samples=N_SAMPLES):
    return (np.arange(n_samples) + offset) / SR


# ---------------------------------------------------------------------- #
# generic oracle: apply a selection dict to stacked per-trial arrays
# ---------------------------------------------------------------------- #

def _axis_indices(n, sel):
    """Fancy selection on a plain axis: None / scalar / sequence."""
    if sel is None:
        return list(range(n))
    if np.isscalar(sel):
        return [int(sel)]
    return [int(s) for s in sel]


def _freq_indices(freqs, sel):
    if sel is None:
        return list(range(len(freqs)))
    lo, hi = float(sel[0]), float(sel[1])
    return [i for i, f in enumerate(freqs) if lo <= f <= hi]


def _time_indices(latency, offset=-2, n_samples=N_SAMPLES):
    if latency is None:
        return list(range(n_samples))
    t = _tvec(offset, n_samples)
    lo, hi = float(latency[0]), float(latency[1])
    return [i for i in range(n_samples) if lo <= t[i] <= hi]


def _oracle_continuous(data, select, axes):
    """axes: dict dimord-name -> selection key name (after 'time')."""
    trials = _axis_indices(N_TRIALS, select.get("trials"))
    rows = _time_indices(select.get("latency"))
    out = []
    for tid in trials:
        arr = np.asarray(data.trials[tid])[rows]
        for ax, (key, size) in enumerate(axes, start=1):
            if key == "frequency":
                idx = _freq_indices(np.asarray(data.freq), select.get(key))
            else:
                idx = _axis_indices(size, select.get(key))
            arr = np.take(arr, idx, axis=ax)
        out.append(arr)
    return np.concatenate(out, axis=0)


def _random_select(rng, keys_sizes, with_latency=True, with_freq=None):
    """Random subset of selection keywords with random (possibly repeated,
    unordered) values."""
    select = {}
    if rng.random() < 0.7:
        k = rng.integers(1, N_TRIALS + 1)
        select["trials"] = rng.choice(N_TRIALS, size=k, replace=True).tolist()
    for key, size in keys_sizes:
        if rng.random() < 0.6:
            k = rng.integers(1, size + 1)
            select[key] = rng.choice(size, size=k, replace=True).tolist()
    if with_latency and rng.random() < 0.6:
        t = _tvec()
        a, b = sorted(rng.choice(t, size=2, replace=False))
        select["latency"] = [float(a), float(b)]
    if with_freq is not None and rng.random() < 0.6:
        a, b = sorted(rng.uniform(with_freq[0] - 5, with_freq[-1] + 5, size=2))
        select["frequency"] = [float(a), float(b)]
    return select


def _valid(data, select):
    """Skip draws the frontend legitimately rejects (empty band/window)."""
    if "frequency" in select and not _freq_indices(np.asarray(data.freq),
                                                   select["frequency"]):
        return False
    if "latency" in select and not _time_indices(select["latency"]):
        return False
    return True


class TestAnalogMatrix:
    @pytest.fixture()
    def adata(self):
        n_chan = 5
        data = np.arange(N_TRIALS * N_SAMPLES * n_chan, dtype=float)
        data = data.reshape(N_TRIALS * N_SAMPLES, n_chan)
        return spy.AnalogData(data=data, samplerate=SR, trialdefinition=_trldef())

    @pytest.mark.parametrize("seed", range(12))
    def test_random_combinations(self, adata, seed):
        rng = np.random.default_rng(seed)
        select = _random_select(rng, [("channel", 5)])
        if not _valid(adata, select):
            return
        res = spy.selectdata(adata, select)
        sol = _oracle_continuous(adata, select, [("channel", 5)])
        assert np.array_equal(np.asarray(res.data), sol), select
        # selected labels follow the channel order, repeats included
        chans = _axis_indices(5, select.get("channel"))
        assert list(res.channel) == [adata.channel[i] for i in chans]

    def test_inplace_selection_feeds_show(self, adata):
        adata.selectdata(trials=[2, 0], channel=[3, 1], inplace=True)
        shown = adata.show(squeeze=False)
        sol = _oracle_continuous(adata, {"trials": [2, 0], "channel": [3, 1]},
                                 [("channel", 5)])
        # show() returns a list, one array per selected trial
        assert isinstance(shown, list) and len(shown) == 2
        assert np.array_equal(np.concatenate(shown, axis=0), sol)
        adata.selectdata(clear=True, inplace=True)
        assert adata.selection is None


class TestSpectralMatrix:
    n_taper, n_freq, n_chan = 2, 4, 3
    freqs = np.array([10.0, 20.0, 30.0, 40.0])

    @pytest.fixture()
    def sdata(self):
        shp = (N_TRIALS * N_SAMPLES, self.n_taper, self.n_freq, self.n_chan)
        data = np.arange(np.prod(shp), dtype=float).reshape(shp)
        sd = spy.SpectralData(data=data, samplerate=SR, trialdefinition=_trldef())
        sd.freq = self.freqs
        return sd

    @pytest.mark.parametrize("seed", range(12))
    def test_random_combinations(self, sdata, seed):
        rng = np.random.default_rng(100 + seed)
        select = _random_select(
            rng, [("taper", self.n_taper), ("channel", self.n_chan)],
            with_freq=self.freqs,
        )
        if not _valid(sdata, select):
            return
        res = spy.selectdata(sdata, select)
        sol = _oracle_continuous(
            sdata, select,
            [("taper", self.n_taper), ("frequency", self.n_freq),
             ("channel", self.n_chan)],
        )
        assert np.array_equal(np.asarray(res.data), sol), select
        fidx = _freq_indices(self.freqs, select.get("frequency"))
        assert np.array_equal(np.asarray(res.freq), self.freqs[fidx])


class TestCrossSpectralMatrix:
    n_freq, n_chan = 3, 3
    freqs = np.array([15.0, 25.0, 35.0])

    @pytest.fixture()
    def csd(self):
        shp = (N_TRIALS * N_SAMPLES, self.n_freq, self.n_chan, self.n_chan)
        data = np.arange(np.prod(shp), dtype=float).reshape(shp)
        cd = spy.CrossSpectralData(data=data, samplerate=SR)
        cd.trialdefinition = _trldef()
        cd.freq = self.freqs
        return cd

    @pytest.mark.parametrize("seed", range(12))
    def test_random_combinations(self, csd, seed):
        rng = np.random.default_rng(200 + seed)
        select = _random_select(
            rng, [("channel_i", self.n_chan), ("channel_j", self.n_chan)],
            with_freq=self.freqs,
        )
        # channel_i/j must be sorted & unique (square indexing semantics)
        for key in ("channel_i", "channel_j"):
            if key in select:
                select[key] = sorted(set(select[key]))
        if not _valid(csd, select):
            return
        res = spy.selectdata(csd, select)
        sol = _oracle_continuous(
            csd, select,
            [("frequency", self.n_freq), ("channel_i", self.n_chan),
             ("channel_j", self.n_chan)],
        )
        assert np.array_equal(np.asarray(res.data), sol), select


class TestDiscreteMatrix:
    """SpikeData: random trial/channel/unit/latency products against a
    row-mask oracle (sample column relative to each trial's own clock)."""

    n_chan, n_unit = 6, 3

    def _spk(self):
        rng = np.random.default_rng(7)
        n_spk = 60
        tmax = N_TRIALS * N_SAMPLES
        data = np.column_stack([
            np.sort(rng.integers(0, tmax, size=n_spk)),
            rng.integers(0, self.n_chan, size=n_spk),
            rng.integers(0, self.n_unit, size=n_spk),
        ])
        return spy.SpikeData(data=data, samplerate=SR, trialdefinition=_trldef())

    def _oracle(self, spkd, select):
        arr = np.asarray(spkd.data)
        trials = _axis_indices(N_TRIALS, select.get("trials"))
        rows = []
        for tid in trials:
            start, stop, off = spkd.trialdefinition[tid]
            m = (arr[:, 0] >= start) & (arr[:, 0] < stop)
            if "channel" in select:
                m &= np.isin(arr[:, 1], select["channel"])
            if "unit" in select:
                m &= np.isin(arr[:, 2], select["unit"])
            if "latency" in select:
                t = (arr[:, 0] - start + off) / SR
                lo, hi = select["latency"]
                m &= (t >= lo) & (t <= hi)
            rows.append(arr[m])
        return np.concatenate(rows, axis=0)

    @pytest.mark.parametrize("seed", range(12))
    def test_random_combinations(self, seed):
        spkd = self._spk()
        rng = np.random.default_rng(300 + seed)
        select = {}
        if rng.random() < 0.7:
            k = rng.integers(1, N_TRIALS + 1)
            select["trials"] = sorted(rng.choice(N_TRIALS, size=k,
                                                 replace=False).tolist())
        for key, size in (("channel", self.n_chan), ("unit", self.n_unit)):
            if rng.random() < 0.6:
                k = rng.integers(1, size + 1)
                select[key] = sorted(set(rng.choice(size, size=k).tolist()))
        if rng.random() < 0.5:
            t = _tvec()
            a, b = sorted(rng.choice(t, size=2, replace=False))
            select["latency"] = [float(a), float(b)]
        sol = self._oracle(self._spk(), select)
        if sol.size == 0:
            return  # empty selections are frontend errors, not data
        res = spy.selectdata(spkd, select)
        assert np.array_equal(np.asarray(res.data), sol), select


class TestSelectionChaining:
    """Chained selectdata calls compose (select of a select), matching a
    single equivalent selection — indices are relative to the CURRENT
    object at each step."""

    def test_two_step_equals_composed(self):
        n_chan = 6
        data = np.arange(N_TRIALS * N_SAMPLES * n_chan, dtype=float)
        data = data.reshape(N_TRIALS * N_SAMPLES, n_chan)
        ad = spy.AnalogData(data=data, samplerate=SR, trialdefinition=_trldef())
        step1 = spy.selectdata(ad, {"trials": [3, 1, 0], "channel": [5, 4, 2, 0]})
        step2 = spy.selectdata(step1, {"trials": [2, 0], "channel": [3, 1]})
        # composed: trials [3,1,0][2,0] -> [0,3]; channels [5,4,2,0][3,1] -> [0,4]
        direct = spy.selectdata(ad, {"trials": [0, 3], "channel": [0, 4]})
        assert np.array_equal(np.asarray(step2.data), np.asarray(direct.data))
        assert list(step2.channel) == list(direct.channel)

    def test_selection_then_compute_consistent(self):
        d = spy.synthdata.white_noise(nTrials=5, nSamples=128, nChannels=4, seed=3)
        pre = spy.selectdata(d, {"trials": [4, 2], "channel": [1, 3]})
        a = spy.freqanalysis(pre, method="mtmfft", taper="hann")
        b = spy.freqanalysis(d, method="mtmfft", taper="hann",
                             select={"trials": [4, 2], "channel": [1, 3]})
        assert np.allclose(np.asarray(a.data), np.asarray(b.data), atol=1e-6)
