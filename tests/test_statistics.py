# -*- coding: utf-8 -*-
# Timelock analysis + spike PSTH tests (modeled on reference
# tests/test_timelockanalysis.py and tests/test_spike_psth.py).

import numpy as np
import pytest

import syncopy_tpu as spy


@pytest.fixture()
def tl_data():
    """Equal-length trials with offset -100 samples (t0 = -0.1 s @ 1 kHz)."""
    rng = np.random.default_rng(11)
    data = rng.normal(size=(5000, 3)).astype("f4")
    ad = spy.AnalogData(data=data, samplerate=1000)
    trl = np.zeros((5, 3))
    trl[:, 0] = np.arange(5) * 1000
    trl[:, 1] = trl[:, 0] + 1000
    trl[:, 2] = -100
    ad.trialdefinition = trl
    return ad


class TestTimelock:
    def test_avg_var(self, tl_data):
        tl = spy.timelockanalysis(tl_data)
        assert isinstance(tl, spy.TimeLockData)
        stack = np.stack([np.asarray(t) for t in tl_data.trials])
        assert np.allclose(np.asarray(tl.avg), stack.mean(axis=0), atol=1e-6)
        assert np.allclose(np.asarray(tl.var), stack.var(axis=0, ddof=1), atol=1e-5)
        # single averaged trial, offset preserved
        assert len(tl.trials) == 1
        assert tl.trialdefinition[0, 2] == -100

    def test_keeptrials(self, tl_data):
        tl = spy.timelockanalysis(tl_data, keeptrials=True)
        assert len(tl.trials) == 5

    def test_covariance(self, tl_data):
        tl = spy.timelockanalysis(tl_data, covariance=True)
        cov = np.asarray(tl.cov)
        assert cov.shape == (3, 3)
        stack = np.stack([np.asarray(t) for t in tl_data.trials])
        centered = stack - stack.mean(axis=1, keepdims=True)
        ref = np.einsum("nti,ntj->nij", centered, centered) / (stack.shape[1] - 1)
        assert np.allclose(cov, ref.mean(axis=0), atol=1e-5)

    def test_latency_window(self, tl_data):
        tl = spy.timelockanalysis(tl_data, latency=[0.0, 0.5])
        assert np.asarray(tl.avg).shape[0] == 501
        assert tl.trialdefinition[0, 2] == 0

    def test_poststim(self, tl_data):
        tl = spy.timelockanalysis(tl_data, latency="poststim")
        # t >= 0 means 900 samples of the 1000 (offset -100)
        assert np.asarray(tl.avg).shape[0] == 900

    def test_trials_subset(self, tl_data):
        tl = spy.timelockanalysis(tl_data, trials=[0, 1], keeptrials=True)
        assert len(tl.trials) == 2

    def test_selection_restored(self, tl_data):
        spy.timelockanalysis(tl_data)
        assert tl_data.selection is None


class TestSpikePSTH:
    def test_basic_rate(self):
        spd = spy.synthdata.poisson_noise(
            nTrials=10, nSpikes=10000, nChannels=2, nUnits=2, samplerate=1000, seed=0
        )
        res = spy.spike_psth(spd, binsize=0.1)
        assert isinstance(res, spy.TimeLockData)
        assert len(res.trials) == 10
        assert res.avg is not None and res.var is not None
        assert np.asarray(res.data).shape[1] == len(res.channel)
        assert all("unit" in c for c in res.channel)

    def test_spikecount_output(self):
        spd = spy.synthdata.poisson_noise(
            nTrials=5, nSpikes=5000, nChannels=2, nUnits=1, samplerate=1000, seed=1
        )
        res = spy.spike_psth(spd, binsize=0.2, output="spikecount", latency="minperiod")
        arr = np.asarray(res.data)
        valid = arr[~np.isnan(arr)]
        assert np.all(valid >= 0)
        assert np.allclose(valid, np.round(valid))

    def test_rate_magnitude(self):
        """~1000 spikes/s spread over channels+units -> total rate ~ intensity."""
        spd = spy.synthdata.poisson_noise(
            nTrials=4, nSpikes=8000, nChannels=1, nUnits=1, samplerate=1000, seed=2
        )
        res = spy.spike_psth(spd, binsize=0.5, output="rate", latency="minperiod", keeptrials=False)
        total_rate = np.nansum(np.asarray(res.avg), axis=1).mean()
        # consistency: rate * total duration ~ spikes per trial
        n_per_trial = 2000
        duration = np.diff(spd.trialintervals[0])[0]
        assert total_rate == pytest.approx(n_per_trial / duration, rel=0.2)

    def test_binsize_rules(self):
        spd = spy.synthdata.poisson_noise(
            nTrials=3, nSpikes=3000, nChannels=2, nUnits=2, samplerate=1000, seed=3
        )
        for rule in ("rice", "sqrt"):
            res = spy.spike_psth(spd, binsize=rule)
            assert np.asarray(res.data).shape[0] > 0

    def test_vartriallen_false(self):
        spd = spy.synthdata.poisson_noise(
            nTrials=6, nSpikes=6000, nChannels=2, nUnits=2, samplerate=1000, seed=4
        )
        res = spy.spike_psth(spd, binsize=0.1, latency="minperiod", vartriallen=False)
        assert not np.any(np.isnan(np.asarray(res.data)))

    def test_proportion_output(self):
        spd = spy.synthdata.poisson_noise(
            nTrials=4, nSpikes=4000, nChannels=1, nUnits=2, samplerate=1000, seed=5
        )
        res = spy.spike_psth(spd, binsize=0.2, output="proportion", latency="minperiod")
        first = np.asarray(res.trials[0])
        # reference semantics: proportions SUM to 1 per (chan, unit) column
        sums = np.nansum(first, axis=0)
        nonzero = sums[sums > 0]
        assert np.allclose(nonzero, 1.0, atol=0.05)


class TestJackknifeOracle:
    def test_bias_var_vs_manual_loo(self):
        """Jackknife bias/variance of the coherence equal an explicit
        leave-one-out loop (reference statistics/jackknifing.py:14-160)."""
        d = spy.synthdata.ar2_network(nTrials=12, samplerate=200, nSamples=300, seed=33)
        coh = spy.connectivityanalysis(d, method="coh", tapsmofrq=3, jackknife=True)
        var = np.asarray(coh._get_extra_dataset("jack_var"))
        bias = np.asarray(coh._get_extra_dataset("jack_bias"))

        # manual LOO replicates through the public API
        n = 12
        reps = []
        for k in range(n):
            keep = [t for t in range(n) if t != k]
            r = spy.connectivityanalysis(d, method="coh", tapsmofrq=3,
                                         select={"trials": keep})
            reps.append(np.asarray(r.data))
        reps = np.stack(reps)
        theta_hat = np.asarray(coh.data)
        theta_dot = reps.mean(axis=0)
        bias_ref = (n - 1) * (theta_dot - theta_hat)
        # the reference uses var = (N-1) * sum_i |mean - rep_i|^2
        # (reference jackknifing.py:170-177), NOT the (N-1)/N textbook form
        var_ref = (n - 1) * ((reps - theta_dot) ** 2).sum(axis=0)
        assert np.abs(bias - bias_ref).max() < 1e-4
        assert np.abs(var - var_ref).max() < 1e-4


class TestPSTHMatrix:
    """Latency/binsize/exception matrix (reference test_spike_psth.py:34-312)."""

    @pytest.fixture()
    def spd(self):
        rng = np.random.default_rng(42)
        s = spy.synthdata.poisson_noise(nTrials=10, nSpikes=5000, nChannels=2,
                                        nUnits=3, samplerate=1000, seed=42)
        trl = s.trialdefinition
        trl[:, 2] = -rng.integers(50, 150, size=trl.shape[0])
        s.trialdefinition = trl
        return s

    def test_latency_maxperiod_spans_union(self, spd):
        c = spy.spike_psth(spd, binsize=0.1, latency="maxperiod")
        dt = 1.0 / c.samplerate
        starts, ends = spd.trialintervals[:, 0], spd.trialintervals[:, 1]
        assert abs(starts.min() - c.time[0][0]) < dt
        assert abs(ends.max() - c.time[0][-1]) < dt
        # unequal trials -> some bins uncovered -> NaNs
        assert np.isnan(np.asarray(c.data)).any()

    def test_latency_minperiod_no_nans(self, spd):
        c = spy.spike_psth(spd, binsize=0.1, latency="minperiod")
        dt = 1.0 / c.samplerate
        starts, ends = spd.trialintervals[:, 0], spd.trialintervals[:, 1]
        assert abs(starts.max() - c.time[0][0]) < dt
        # bin-edge flooring can leave the last LEFT edge up to ~1.5 bins in
        # (the reference notes the same rounding slack)
        assert abs(ends.min() - c.time[0][-1]) < 2 * dt
        assert not np.isnan(np.asarray(c.data)).any()

    def test_latency_pre_post_stim(self, spd):
        pre = spy.spike_psth(spd, binsize=0.1, latency="prestim")
        assert np.all(pre.time[0] <= 1e-9)
        post = spy.spike_psth(spd, binsize=0.1, latency="poststim")
        assert np.all(post.time[0] >= -1e-9)

    def test_manual_oversized_window(self, spd):
        c = spy.spike_psth(spd, binsize=0.1, latency=[-0.5, 5.0])
        dt = 1.0 / c.samplerate
        assert abs(-0.5 - c.time[0][0]) <= dt
        assert np.isnan(np.asarray(c.data)).any()

    def test_binsize_rules_ordering(self, spd):
        rice = spy.spike_psth(spd, binsize="rice", latency="minperiod")
        sqrt = spy.spike_psth(spd, binsize="sqrt", latency="minperiod")
        assert sqrt.time[0].size > rice.time[0].size
        secs = spy.spike_psth(spd, binsize=0.2, latency="minperiod")
        assert np.allclose(np.diff(secs.time[0]), 0.2)

    @pytest.mark.parametrize("kwargs,msg", [
        (dict(binsize=-0.2), "binsize"),
        (dict(binsize=0.3, latency=[0, 0.2]), "less or equals"),
        (dict(binsize="sth"), "one of"),
        (dict(output="counts"), "one of"),
        (dict(latency="sth"), "one of"),
    ])
    def test_exceptions(self, spd, kwargs, msg):
        kwargs.setdefault("binsize", 0.1)
        with pytest.raises(spy.SPYValueError, match=msg):
            spy.spike_psth(spd, **kwargs)


# ---------------------------------------------------------------------- #
# Round-3 statistics sweep (reference tests/test_statistics.py:24-300,
# test_spike_psth.py:256-360, test_timelockanalysis.py:41-205)
# ---------------------------------------------------------------------- #

from syncopy_tpu.datatype.continuous_data import (  # noqa: E402
    CrossSpectralData,
    SpectralData,
)


class TestSumStatisticsMatrix:
    """mean/var/std/median over EVERY dim of every continuous class vs
    numpy on lognormal data (reference TestSumStatistics)."""

    rng = np.random.default_rng(42)
    nTrials, nSamples, nChan, nFreq, nTaper = 4, 10, 3, 10, 2

    @classmethod
    def _analog(cls):
        trials = [cls.rng.lognormal(2, 0.5, size=(cls.nSamples, cls.nChan))
                  for _ in range(cls.nTrials)]
        return spy.AnalogData(data=trials, samplerate=1.0)

    @classmethod
    def _spectral(cls):
        trials = [cls.rng.lognormal(2, 0.5,
                                    size=(cls.nSamples, cls.nTaper, cls.nFreq, cls.nChan))
                  for _ in range(cls.nTrials)]
        return SpectralData(data=trials, samplerate=1.0)

    @classmethod
    def _cross(cls):
        trials = [cls.rng.lognormal(2, 0.5,
                                    size=(cls.nSamples, cls.nFreq, cls.nChan, cls.nChan))
                  for _ in range(cls.nTrials)]
        return CrossSpectralData(data=trials, samplerate=1.0)

    @pytest.mark.parametrize("op", ["mean", "var", "std", "median"])
    def test_dim_statistics_all_classes(self, op):
        for maker in (self._analog, self._spectral, self._cross):
            obj = maker()
            for dim in obj.dimord:
                axis = obj.dimord.index(dim)
                res = getattr(spy, op)(obj, dim=dim)
                trial = np.asarray(obj.trials[1])
                want = getattr(np, op)(trial, axis=axis, keepdims=True)
                got = np.asarray(res.trials[1])
                assert np.allclose(got, want, atol=1e-5), (op, dim, maker)

    @pytest.mark.parametrize("op", ["mean", "var", "std"])
    def test_trial_statistics_all_classes(self, op):
        for maker in (self._analog, self._spectral, self._cross):
            obj = maker()
            stack = np.stack([np.asarray(t) for t in obj.trials])
            res = getattr(spy, op)(obj, dim="trials")
            # the reference normalizes by N (ddof=0): summary_stats.py:430-455
            if op == "mean":
                want = stack.mean(axis=0)
            elif op == "var":
                want = stack.var(axis=0, ddof=0)
            else:
                want = stack.std(axis=0, ddof=0)
            assert np.allclose(np.asarray(res.data), want, atol=1e-4), (op, maker)
            assert len(res.trials) == 1

    def test_statistics_respect_selections(self):
        obj = self._analog()
        res = spy.mean(obj, dim="trials", select={"trials": [0, 2],
                                                  "channel": [1, 2]})
        stack = np.stack([np.asarray(obj.trials[0]), np.asarray(obj.trials[2])])
        want = stack[:, :, [1, 2]].mean(axis=0)
        assert np.allclose(np.asarray(res.data), want, atol=1e-5)

    def test_invalid_dim_rejected(self):
        obj = self._analog()
        with pytest.raises(spy.SPYValueError, match="time"):
            spy.mean(obj, dim="sth")

    def test_unequal_trials_reject_trial_average(self):
        obj = self._analog()
        trl = np.array(obj.trialdefinition)
        trl[2] = [21, 25, -1]
        obj.trialdefinition = trl
        with pytest.raises(spy.SPYValueError):
            spy.mean(obj, dim="trials")

    def test_median_not_defined_for_trials(self):
        obj = self._analog()
        with pytest.raises((spy.SPYValueError, spy.SPYError)):
            spy.median(obj, dim="trials")


class TestITCOracle:
    def test_itc_matches_manual_resultant(self):
        d = spy.synthdata.harmonic(freq=30, samplerate=200, nTrials=8,
                                   nSamples=200, nChannels=2)
        spec = spy.freqanalysis(d, method="mtmfft", taper="hann",
                                output="fourier", keeptrials=True)
        itc = spy.itc(spec)
        arr = np.asarray(spec.data).reshape(8, 1, -1, 2)
        manual = np.abs((arr / np.abs(arr)).mean(axis=0))
        assert np.allclose(np.asarray(itc.data)[0], manual, atol=1e-5)
        got = np.asarray(itc.data)
        assert got.min() >= 0 and got.max() <= 1 + 1e-6
        # the driven harmonic bin is phase-locked across trials
        f_idx = np.argmin(np.abs(np.asarray(spec.freq) - 30))
        assert got[0, 0, f_idx].min() > 0.99

    def test_itc_requires_complex(self):
        d = spy.synthdata.white_noise(nTrials=3, nSamples=100, nChannels=2,
                                      seed=1)
        pw = spy.freqanalysis(d, method="mtmfft", taper="hann", output="pow")
        with pytest.raises(spy.SPYValueError):
            spy.itc(pw)


class TestPSTHExceptions:
    @pytest.fixture()
    def spd(self):
        return spy.synthdata.poisson_noise(nTrials=5, nUnits=3,
                                           nSpikes=500, samplerate=1000.0,
                                           seed=9)

    def test_output_validation(self, spd):
        with pytest.raises(spy.SPYValueError):
            spy.spike_psth(spd, output="counts")
        with pytest.raises((spy.SPYValueError, spy.SPYTypeError)):
            spy.spike_psth(spd, output=12)

    def test_binsize_validation(self, spd):
        with pytest.raises(spy.SPYValueError):
            spy.spike_psth(spd, binsize=-0.2)
        with pytest.raises(spy.SPYValueError):
            spy.spike_psth(spd, binsize="sth")
        # binsize larger than the latency window
        with pytest.raises(spy.SPYValueError):
            spy.spike_psth(spd, binsize=0.3, latency=[0, 0.2])

    def test_latency_validation(self, spd):
        with pytest.raises(spy.SPYValueError):
            spy.spike_psth(spd, latency="sth")
        with pytest.raises(spy.SPYValueError):
            spy.spike_psth(spd, latency=[0.1, 0])
        with pytest.raises(spy.SPYValueError):
            spy.spike_psth(spd, latency=[-999, -99])

    def test_chan_unit_mapping(self, spd):
        """Output channels are (channelX_unitY) combinations covering every
        present pair (reference test_psth_chan_unit_mapping)."""
        counts = spy.spike_psth(spd, output="spikecount", vartriallen=True)
        labels = list(counts.channel)
        data = np.asarray(spd.data)
        ucol = spd.dimord.index("unit")
        ccol = spd.dimord.index("channel")
        n_pairs = len({(c, u) for c, u in zip(data[:, ccol], data[:, ucol])})
        assert len(labels) == n_pairs
        # total spike count is preserved within the analysis window
        total = np.nansum(np.asarray(counts.data))
        assert total <= len(data)
        assert total > 0


class TestTimelockDepth:
    @pytest.fixture()
    def ad(self):
        return spy.synthdata.white_noise(nTrials=6, nSamples=100,
                                         nChannels=3, samplerate=500,
                                         seed=13)

    def test_latency_interval(self, ad):
        tl = spy.timelockanalysis(ad, latency=[0.05, 0.15])
        stack = np.stack([np.asarray(t) for t in ad.trials])
        rows = slice(25, 76)  # 0.05..0.15 s at 500 Hz, offset 0
        want = stack[:, rows].mean(axis=0)
        assert np.allclose(np.asarray(tl.avg), want, atol=1e-5)

    def test_trials_selection(self, ad):
        tl = spy.timelockanalysis(ad, trials=[0, 2, 4])
        stack = np.stack([np.asarray(ad.trials[k]) for k in (0, 2, 4)])
        assert np.allclose(np.asarray(tl.avg), stack.mean(axis=0), atol=1e-5)

    def test_covariance_oracle(self, ad):
        tl = spy.timelockanalysis(ad, covariance=True)
        stack = np.stack([np.asarray(t) for t in ad.trials])
        covs = [np.cov(trial.T, ddof=1) for trial in stack]
        assert np.allclose(np.asarray(tl.cov), np.mean(covs, axis=0), atol=1e-4)

    def test_exceptions(self, ad):
        with pytest.raises((spy.SPYValueError, spy.SPYTypeError)):
            spy.timelockanalysis(ad, latency="sth")
        spec = spy.freqanalysis(ad, method="mtmfft", taper="hann")
        with pytest.raises((spy.SPYValueError, spy.SPYTypeError)):
            spy.timelockanalysis(spec)
