# -*- coding: utf-8 -*-
#
# ContinuousData semantics depth (reference tests/test_continuousdata.py):
# per-trial time axes under offsets and selections, time-locking checks,
# spectral output conversions against their definitions, and arithmetic
# type/shape rules.

import numpy as np
import pytest

import syncopy_tpu as spy
from syncopy_tpu.shared.const_def import spectralConversions


SR = 1000.0


def _adata(offsets):
    """One object, one trial per offset, 100 samples x 2 channels."""
    n = 100
    starts = np.arange(0, n * len(offsets), n)
    trl = np.column_stack([starts, starts + n, np.asarray(offsets, float)])
    data = np.arange(n * len(offsets) * 2, dtype="f4").reshape(-1, 2)
    return spy.AnalogData(data=data, samplerate=SR, trialdefinition=trl)


class TestTimeAxes:
    def test_time_reflects_offsets(self):
        ad = _adata([-50, 0, 25])
        t = ad.time
        assert t[0][0] == pytest.approx(-50 / SR)
        assert t[1][0] == pytest.approx(0.0)
        assert t[2][0] == pytest.approx(25 / SR)
        for tv in t:
            assert len(tv) == 100
            assert np.allclose(np.diff(tv), 1 / SR)

    def test_time_is_lazy_indexer(self):
        ad = _adata([0, 0])
        # indexing works without materializing a list of all trials
        assert ad.time[1][-1] == pytest.approx(99 / SR)
        with pytest.raises((IndexError, spy.SPYValueError)):
            ad.time[5]

    def test_time_under_latency_selection(self):
        ad = _adata([-50, -50])
        ad.selectdata(latency=[0.0, 0.02], inplace=True)
        sel_time = ad.selection.time
        # samples with -50<=i-50 scaled into [0, .02]: indices 50..70
        assert list(sel_time) == [slice(50, 71, 1)] * 2
        ad.selectdata(clear=True, inplace=True)

    def test_is_time_locked(self):
        locked = _adata([-10, -10, -10])
        assert locked.is_time_locked
        ragged = _adata([-10, 0, -10])
        assert not ragged.is_time_locked
        # unequal lengths also break time locking
        trl = np.array([[0, 100, -10], [100, 150, -10]], float)
        uneq = spy.AnalogData(data=np.zeros((200, 2), "f4"), samplerate=SR,
                              trialdefinition=trl)
        assert not uneq.is_time_locked


class TestSpectralConversions:
    """Every `output=` conversion matches its mathematical definition on
    the same fourier spectrum (reference const_def.py:12-37 table)."""

    @pytest.fixture(scope="class")
    def fourier(self):
        ad = spy.synthdata.harmonic(freq=40, samplerate=400, nTrials=2,
                                    nSamples=200, nChannels=2)
        out = spy.freqanalysis(ad, method="mtmfft", taper="hann",
                               output="fourier")
        return ad, np.asarray(out.data)

    @pytest.mark.parametrize("output", ["pow", "abs", "real", "imag",
                                        "angle", "absreal", "absimag"])
    def test_conversion_matches_definition(self, fourier, output):
        ad, spec_f = fourier
        out = spy.freqanalysis(ad, method="mtmfft", taper="hann", output=output)
        expected = spectralConversions[output](spec_f)
        got = np.asarray(out.data)
        assert got.dtype == expected.dtype
        assert np.allclose(got, np.asarray(expected), atol=1e-5), output

    def test_pow_is_squared_abs(self, fourier):
        _, spec_f = fourier
        assert np.allclose(
            np.asarray(spectralConversions["pow"](spec_f)),
            np.abs(spec_f) ** 2, atol=1e-5,
        )


class TestArithmeticRules:
    def test_object_scalar_and_array(self):
        ad = _adata([0, 0])
        plus = ad + 1.5
        assert np.allclose(np.asarray(plus.data), np.asarray(ad.data) + 1.5)
        timesminus = 2 * ad - ad
        assert np.allclose(np.asarray(timesminus.data), np.asarray(ad.data))

    def test_object_object_shape_mismatch_rejected(self):
        a = _adata([0, 0])
        b = _adata([0, 0, 0])
        with pytest.raises((spy.SPYValueError, spy.SPYError)):
            a + b

    def test_power_and_division(self):
        ad = _adata([0, 0])
        sq = (ad + 1) ** 2
        assert np.allclose(np.asarray(sq.data), (np.asarray(ad.data) + 1) ** 2)
        ratio = sq / (ad + 1)
        assert np.allclose(np.asarray(ratio.data), np.asarray(ad.data) + 1,
                           atol=1e-4)

    def test_arithmetic_preserves_provenance(self):
        ad = _adata([0, 0])
        res = ad + ad
        assert res.samplerate == ad.samplerate
        assert list(res.channel) == list(ad.channel)
        assert np.array_equal(res.trialdefinition, ad.trialdefinition)


class TestDimStatsOracle:
    """mean/std/var/median over every continuous dim vs numpy (reference
    tests/test_statistics.py dim sweeps)."""

    @pytest.fixture(scope="class")
    def sdata(self):
        ad = spy.synthdata.white_noise(nTrials=3, nSamples=128, nChannels=4,
                                       samplerate=500, seed=5)
        return spy.freqanalysis(ad, method="mtmfft", taper="hann")

    @pytest.mark.parametrize("dim,axis", [("freq", 2), ("channel", 3)])
    @pytest.mark.parametrize("op", ["mean", "std", "var", "median"])
    def test_dim_stats(self, sdata, dim, axis, op):
        res = getattr(spy, op)(sdata, dim=dim)
        expected = getattr(np, op)(np.asarray(sdata.data), axis=axis,
                                   keepdims=True)
        assert np.allclose(np.asarray(res.data), expected, atol=1e-5)

    def test_trial_mean_collapses_trials(self, sdata):
        res = spy.mean(sdata, dim="trials")
        expected = np.asarray(sdata.data).reshape(
            3, -1, *np.asarray(sdata.data).shape[1:]
        ).mean(axis=0)
        assert np.allclose(np.asarray(res.data), expected, atol=1e-5)
        assert len(res.trials) == 1


# ---------------------------------------------------------------------- #
# Round-3 semantics sweep (reference tests/test_continuousdata.py:189-916)
# ---------------------------------------------------------------------- #

from syncopy_tpu.datatype.continuous_data import (  # noqa: E402
    CrossSpectralData,
    SpectralData,
    TimeLockData,
)

NC, NS = 10, 30
DATA2D = np.arange(1, NC * NS + 1, dtype="float").reshape(NS, NC)
TRL5 = np.vstack([
    np.arange(0, NS, 5),
    np.arange(5, NS + 5, 5),
    np.ones(NS // 5),
    np.ones(NS // 5) * np.pi,
]).T


class TestAnalogDataConstructor:
    def test_empty(self):
        dummy = spy.AnalogData()
        assert len(dummy.cfg) == 0
        for attr in ("channel", "data", "sampleinfo", "trialinfo"):
            assert getattr(dummy, attr) is None

    def test_rejects_dict(self):
        with pytest.raises((spy.SPYTypeError, spy.SPYValueError, TypeError)):
            spy.AnalogData({})

    def test_single_array(self):
        labels = [str(i) for i in range(NC)]
        dummy = spy.AnalogData(data=DATA2D, channel=labels)
        assert dummy.dimord == spy.AnalogData._defaultDimord
        assert dummy.channel.size == NC
        assert np.array_equal(dummy.sampleinfo, [[0, NS]])
        assert dummy.trialinfo.shape == (1, 0)
        assert np.array_equal(np.asarray(dummy.data), DATA2D)
        assert list(dummy.channel) == labels

    def test_wrong_ndim_rejected(self):
        with pytest.raises((spy.SPYValueError, spy.SPYTypeError)):
            spy.AnalogData(np.ones((3,)))

    def test_list_of_arrays(self):
        n_trials, n_samp = 3, 10
        data_list = [i * np.ones((n_samp, 2)) for i in range(n_trials)]
        dummy = spy.AnalogData(data_list, samplerate=1)
        assert len(dummy.trials) == n_trials
        for i in range(n_trials):
            assert dummy.trials[i][0, 0] == i
            assert len(dummy.trials[i]) == n_samp

    def test_list_mismatching_offaxis_shapes(self):
        with pytest.raises(spy.SPYValueError):
            spy.AnalogData(data=[np.ones((2, 2)), np.ones((3, 3))])

    def test_generator_variable_lengths(self):
        n_trials = 3
        gen = (i * np.ones((i + 1, 2)) for i in range(n_trials))
        dummy = spy.AnalogData(gen, samplerate=1)
        assert len(dummy.trials) == n_trials
        for i in range(n_trials):
            assert dummy.trials[i][0, 0] == i
            assert len(dummy.trials[i]) == i + 1

    def test_generator_offaxis_mismatch_rejected(self):
        gen = (np.ones((2, i + 1)) for i in range(3))
        with pytest.raises(spy.SPYValueError):
            spy.AnalogData(data=gen)

    def test_generator_custom_dimord(self):
        # ragged along "time" is fine when time IS the stacking dim
        gen = (np.ones((2, i + 1)) for i in range(3))
        dummy = spy.AnalogData(data=gen, dimord=["channel", "time"])
        assert len(dummy.trials) == 3

    def test_object_list_concat(self):
        n_trials, n_samp = 3, 10
        listed = spy.AnalogData([i * np.ones((n_samp, 2)) for i in range(n_trials)],
                                samplerate=1)
        ragged = spy.AnalogData((i * np.ones((i + 1, 2)) for i in range(n_trials)),
                                samplerate=1)
        concat = spy.AnalogData([ragged, listed])
        assert len(concat.trials) == 2 * n_trials
        for i in range(n_trials):
            assert len(concat.trials[i]) == i + 1
            assert concat.trials[i][0, 0] == i
            assert len(concat.trials[n_trials + i]) == n_samp
            assert concat.trials[n_trials + i][0, 0] == i

    def test_object_list_missing_samplerate(self):
        a = spy.AnalogData([np.ones((4, 2))], samplerate=1)
        b = spy.AnalogData([np.ones((4, 2))])
        with pytest.raises(spy.SPYValueError, match="missing attribute"):
            spy.AnalogData([a, b])

    def test_object_list_different_channels(self):
        a = spy.AnalogData([np.ones((4, 2))], samplerate=1)
        b = spy.AnalogData([np.ones((4, 2))], samplerate=1)
        a.channel = ["c1", "c2"]
        b.channel = ["x1", "x2"]
        with pytest.raises(spy.SPYValueError, match="different attribute"):
            spy.AnalogData([a, b])

    def test_object_list_mismatching_shapes(self):
        a = spy.AnalogData([np.ones((4, 2))], samplerate=1)
        b = spy.AnalogData([np.ones((2, 3))], samplerate=1)
        with pytest.raises(spy.SPYValueError, match="mismatching shapes"):
            spy.AnalogData([a, b])

    def test_object_list_different_stacking(self):
        a = spy.AnalogData([np.ones((4, 2))], samplerate=1)
        b = spy.AnalogData([np.ones((2, 4))], samplerate=1,
                           dimord=["channel", "time"])
        with pytest.raises(spy.SPYValueError, match="stacking"):
            spy.AnalogData([a, b])

    def test_object_list_channel_propagation(self):
        a = spy.AnalogData([np.ones((4, 2))], samplerate=1)
        b = spy.AnalogData([np.ones((4, 2))], samplerate=1)
        a.channel = ["c1", "c2"]
        b.channel = ["c1", "c2"]
        concat = spy.AnalogData([a, b])
        assert list(concat.channel) == ["c1", "c2"]


class TestAnalogTrialRetrieval:
    def test_default_dimord(self):
        dummy = spy.AnalogData(data=DATA2D, trialdefinition=TRL5)
        for trlno, start in enumerate(range(0, NS, 5)):
            assert np.array_equal(np.asarray(dummy._get_trial(trlno)),
                                  DATA2D[start:start + 5, :])

    def test_swapped_dimord(self):
        dummy = spy.AnalogData(DATA2D.T, trialdefinition=TRL5,
                               dimord=["channel", "time"])
        for trlno, start in enumerate(range(0, NS, 5)):
            assert np.array_equal(np.asarray(dummy._get_trial(trlno)),
                                  DATA2D.T[:, start:start + 5])

    def test_trialinfo_extra_columns(self):
        dummy = spy.AnalogData(data=DATA2D, trialdefinition=TRL5)
        assert dummy.trialinfo.shape == (NS // 5, 1)
        assert np.allclose(dummy.trialinfo[:, 0], np.pi)

    def test_trialintervals(self):
        dummy = spy.AnalogData(data=DATA2D, trialdefinition=TRL5,
                               samplerate=2.0)
        iv = dummy.trialintervals
        assert iv.shape == (NS // 5, 2)
        # [start+offset, stop+offset-1] / fs
        assert iv[0, 0] == pytest.approx(1 / 2.0)
        assert iv[0, 1] == pytest.approx((1 + 4) / 2.0)


class TestSelectedTrialShapes:
    """The engine's post-selection trial-shape planning must equal the
    actual selected arrays for every selection combo (the reference's
    FauxTrial/_preview_trial contract, continuous_data.py:264-351)."""

    @pytest.fixture()
    def ad(self):
        rng = np.random.default_rng(11)
        arr = rng.normal(size=(120, 5)).astype("f4")
        trl = np.array([[0, 40, -10], [40, 80, -10], [80, 120, -10]], float)
        return spy.AnalogData(data=arr, samplerate=100.0, trialdefinition=trl)

    @pytest.mark.parametrize("select", [
        {},
        {"channel": [0, 2, 4]},
        {"channel": [4, 0]},            # unordered fancy
        {"channel": slice(1, 4)},
        {"latency": [-0.05, 0.1]},
        {"latency": [0.0, 0.2], "channel": [1, 3]},
        {"trials": [2, 0]},
        {"trials": [1], "channel": [0], "latency": [-0.1, 0.0]},
    ])
    def test_planned_shapes_match_arrays(self, ad, select):
        from syncopy_tpu.datatype.selector import Selector

        sel_kwargs = dict(select)
        if isinstance(sel_kwargs.get("channel"), slice):
            sel_kwargs["channel"] = list(range(*sel_kwargs["channel"].indices(5)))
        ad.selectdata(inplace=True, **sel_kwargs)
        sel = ad.selection
        from syncopy_tpu.engine.routine import ComputationalRoutine

        cr = ComputationalRoutine()
        cr.selector = sel
        for pos in range(len(sel.trial_ids)):
            planned = cr._selected_trial_shape(ad, pos)
            actual = sel.select_trial_array(ad, pos).shape
            assert planned == actual, (select, pos)
        ad.selectdata(clear=True, inplace=True)

    def test_selected_values_match_numpy(self, ad):
        ad.selectdata(inplace=True, trials=[1], channel=[3, 1],
                      latency=[0.0, 0.1])
        sel = ad.selection
        got = sel.select_trial_array(ad, 0)
        raw = np.asarray(ad.data)[40:80]  # trial 1
        # offset -10 @ 100 Hz: t=0 at sample 10; [0, .1] -> rows 10..20
        want = raw[10:21][:, [3, 1]]
        assert np.array_equal(got, want)
        ad.selectdata(clear=True, inplace=True)


class TestSpectralDataSemantics:
    nt, ntap, nf, nc = 4, 2, 7, 3

    def _full(self):
        rng = np.random.default_rng(2)
        arr = rng.normal(size=(self.nt, self.ntap, self.nf, self.nc)).astype("f4")
        return SpectralData(data=arr, samplerate=1000.0)

    def test_empty(self):
        dummy = SpectralData(dimord=SpectralData._defaultDimord)
        assert dummy.data is None
        assert dummy.freq is None
        assert dummy.taper is None

    def test_default_labels(self):
        dummy = self._full()
        assert list(dummy.taper) == ["taper1", "taper2"]
        assert np.array_equal(dummy.freq, np.arange(self.nf))
        assert list(dummy.channel) == ["channel" + str(i + 1) for i in range(self.nc)]

    def test_label_validation(self):
        dummy = self._full()
        with pytest.raises(spy.SPYValueError):
            dummy.freq = np.arange(self.nf + 2)
        with pytest.raises(spy.SPYValueError):
            dummy.taper = ["just_one"]
        empty = SpectralData(dimord=SpectralData._defaultDimord)
        with pytest.raises(spy.SPYValueError):
            empty.freq = [1.0]

    def test_trialretrieval(self):
        dummy = self._full()
        trl = np.array([[0, 2, 0], [2, 4, 0]], float)
        dummy.trialdefinition = trl
        arr = np.asarray(dummy.data)
        assert np.array_equal(np.asarray(dummy._get_trial(0)), arr[:2])
        assert np.array_equal(np.asarray(dummy._get_trial(1)), arr[2:])

    def test_arithmetic(self):
        dummy = self._full()
        double = dummy + dummy
        assert np.allclose(np.asarray(double.data), 2 * np.asarray(dummy.data))
        assert np.array_equal(double.freq, dummy.freq)

    def test_complex_payload(self):
        rng = np.random.default_rng(3)
        arr = (rng.normal(size=(2, 1, 4, 2)) + 1j * rng.normal(size=(2, 1, 4, 2))).astype("c8")
        dummy = SpectralData(data=arr, samplerate=100.0)
        assert np.iscomplexobj(dummy.data)
        prod = dummy * 2.0
        assert np.allclose(np.asarray(prod.data), 2 * arr)


class TestCrossSpectralDataSemantics:
    def _full(self):
        rng = np.random.default_rng(4)
        arr = rng.normal(size=(2, 5, 3, 3)).astype("f4")
        return CrossSpectralData(data=arr, samplerate=200.0)

    def test_channel_attribute_forbidden(self):
        dummy = self._full()
        with pytest.raises(AttributeError):
            dummy.channel
        with pytest.raises(AttributeError):
            dummy.channel = ["a", "b", "c"]

    def test_pair_labels(self):
        dummy = self._full()
        assert list(dummy.channel_i) == ["channel1", "channel2", "channel3"]
        dummy.channel_j = ["x", "y", "z"]
        assert list(dummy.channel_j) == ["x", "y", "z"]
        with pytest.raises(spy.SPYValueError):
            dummy.channel_i = ["too", "few"]

    def test_trialretrieval(self):
        dummy = self._full()
        dummy.trialdefinition = np.array([[0, 1, 0], [1, 2, 0]], float)
        arr = np.asarray(dummy.data)
        assert np.array_equal(np.asarray(dummy._get_trial(1)), arr[1:2])

    def test_selection_on_pair_axes(self):
        dummy = self._full()
        dummy.trialdefinition = np.array([[0, 1, 0], [1, 2, 0]], float)
        sub = dummy.selectdata(channel_i=[0, 1], channel_j=[2])
        assert np.asarray(sub.data).shape == (2, 5, 2, 1)
        want = np.asarray(dummy.data)[:, :, :2, 2:3]
        assert np.array_equal(np.asarray(sub.data), want)


class TestTimeLockDataSemantics:
    def test_create_and_extra_datasets(self):
        tl = TimeLockData()
        assert tl.avg is None and tl.var is None and tl.cov is None
        rng = np.random.default_rng(5)
        tl2 = TimeLockData(data=rng.normal(size=(20, 2)).astype("f4"),
                           samplerate=10.0)
        avg = np.asarray(tl2.data).mean(axis=0, keepdims=True)
        tl2._register_dataset("avg", avg)
        assert np.array_equal(np.asarray(tl2.avg), avg)
        # detach
        tl2._register_dataset("avg", None)
        assert tl2.avg is None

    def test_timelockanalysis_products(self):
        d = spy.synthdata.white_noise(nTrials=5, nSamples=60, nChannels=3,
                                      seed=6)
        tl = spy.timelockanalysis(d)
        stack = np.stack([np.asarray(t) for t in d.trials])
        assert np.allclose(np.asarray(tl.avg), stack.mean(axis=0), atol=1e-5)
        assert np.allclose(np.asarray(tl.var), stack.var(axis=0, ddof=1),
                           atol=1e-5)
        assert tl.is_time_locked
