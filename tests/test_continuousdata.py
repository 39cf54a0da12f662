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
