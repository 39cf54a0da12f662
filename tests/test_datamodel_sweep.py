# -*- coding: utf-8 -*-
#
# Round-3 cross-cutting data-model sweep: arithmetic under selections,
# save/load attribute integrity per class, show() semantics, padding
# options (reference tests/test_continuousdata.py arithmetic+saveload
# blocks, test_selectdata show usage, input_processors padding rules).

import numpy as np
import pytest

import syncopy_tpu as spy
from syncopy_tpu.datatype.continuous_data import (
    CrossSpectralData,
    SpectralData,
)


def _analog(n_trials=4, n_samp=40, n_chan=3, seed=0):
    rng = np.random.default_rng(seed)
    trials = [rng.normal(size=(n_samp, n_chan)).astype("f4")
              for _ in range(n_trials)]
    ad = spy.AnalogData(data=trials, samplerate=200.0)
    ad.channel = ["c{}".format(i) for i in range(n_chan)]
    return ad


def _spectral(n_trials=3, seed=1):
    rng = np.random.default_rng(seed)
    trials = [(rng.normal(size=(2, 2, 8, 3))
               + 1j * rng.normal(size=(2, 2, 8, 3))).astype("c8")
              for _ in range(n_trials)]
    sd = SpectralData(data=trials, samplerate=100.0)
    sd.freq = np.linspace(0, 50, 8)
    return sd


def _cross(n_trials=3, seed=2):
    rng = np.random.default_rng(seed)
    trials = [rng.normal(size=(1, 6, 3, 3)).astype("f4")
              for _ in range(n_trials)]
    cd = CrossSpectralData(data=trials, samplerate=100.0)
    cd.freq = np.linspace(0, 25, 6)
    return cd


class TestArithmeticUnderSelections:
    """Operator overloads honor in-place selections: the result holds the
    SELECTED portions combined trial-by-trial (reference
    test_continuousdata.py test_ang_arithmetic selection blocks)."""

    def test_analog_selected_plus_scalar(self):
        ad = _analog()
        ad.selectdata(inplace=True, trials=[1, 3], channel=[0, 2])
        res = ad + 10.0
        want0 = np.asarray(ad.trials[1])[:, [0, 2]] + 10.0
        assert np.allclose(np.asarray(res.trials[0]), want0, atol=1e-6)
        assert len(res.trials) == 2
        assert list(res.channel) == ["c0", "c2"]
        ad.selectdata(clear=True, inplace=True)

    def test_analog_selected_object_object(self):
        ad = _analog()
        other = _analog(seed=5)
        ad.selectdata(inplace=True, trials=[0, 2])
        other.selectdata(inplace=True, trials=[1, 3])
        res = ad * other
        want = (np.asarray(ad.trials[0]) * np.asarray(other.trials[1]))
        assert np.allclose(np.asarray(res.trials[0]), want, atol=1e-6)
        ad.selectdata(clear=True, inplace=True)
        other.selectdata(clear=True, inplace=True)

    def test_mismatched_selection_shapes_rejected(self):
        ad = _analog()
        other = _analog(seed=5)
        ad.selectdata(inplace=True, trials=[0])
        other.selectdata(inplace=True, trials=[1, 2])
        with pytest.raises((spy.SPYValueError, spy.SPYError)):
            ad + other
        ad.selectdata(clear=True, inplace=True)
        other.selectdata(clear=True, inplace=True)

    def test_spectral_complex_arithmetic(self):
        sd = _spectral()
        res = sd * (1 - 2j)
        assert np.allclose(np.asarray(res.data),
                           np.asarray(sd.data) * (1 - 2j), atol=1e-6)
        assert np.iscomplexobj(res.data)

    def test_cross_selected_frequency_window(self):
        cd = _cross()
        cd.selectdata(inplace=True, frequency=[5.0, 15.0])
        res = cd - cd
        assert np.allclose(np.asarray(res.data), 0.0)
        # frequency axis restricted: 5..15 Hz of linspace(0,25,6)
        assert res.data.shape[1] == int(np.sum(
            (np.linspace(0, 25, 6) >= 5) & (np.linspace(0, 25, 6) <= 15)))
        cd.selectdata(clear=True, inplace=True)

    def test_type_mismatch_rejected(self):
        ad = _analog()
        sd = _spectral()
        with pytest.raises((spy.SPYTypeError, spy.SPYValueError, spy.SPYError)):
            ad + sd

    def test_string_operand_rejected(self):
        ad = _analog()
        with pytest.raises((spy.SPYTypeError, spy.SPYValueError, TypeError)):
            ad + "nope"


class TestSaveLoadAttributeIntegrity:
    """Every class roundtrips ALL dimensional attributes (reference
    test_saveload per-class checkAttr sweeps)."""

    def test_analog(self, tmp_path):
        ad = _analog()
        spy.save(ad, container=str(tmp_path / "a"))
        back = spy.load(str(tmp_path / "a.spy"))
        assert back == ad
        assert list(back.channel) == list(ad.channel)
        assert back.samplerate == ad.samplerate
        assert back.dimord == ad.dimord
        assert np.array_equal(back.trialdefinition, ad.trialdefinition)
        assert np.array_equal(np.asarray(back.data), np.asarray(ad.data))

    def test_spectral(self, tmp_path):
        sd = _spectral()
        sd.taper = ["t0", "t1"]
        spy.save(sd, container=str(tmp_path / "s"))
        back = spy.load(str(tmp_path / "s.spy"))
        assert back == sd
        assert np.allclose(back.freq, sd.freq)
        assert list(back.taper) == ["t0", "t1"]
        assert np.iscomplexobj(back.data)

    def test_crossspectral(self, tmp_path):
        cd = _cross()
        cd.channel_i = ["a", "b", "c"]
        cd.channel_j = ["x", "y", "z"]
        spy.save(cd, container=str(tmp_path / "c"))
        back = spy.load(str(tmp_path / "c.spy"))
        assert back == cd
        assert list(back.channel_i) == ["a", "b", "c"]
        assert list(back.channel_j) == ["x", "y", "z"]
        assert np.allclose(back.freq, cd.freq)

    def test_timelock_with_extras(self, tmp_path):
        tl = spy.timelockanalysis(
            spy.synthdata.white_noise(nTrials=4, nSamples=50, nChannels=2,
                                      seed=3),
            covariance=True,
        )
        spy.save(tl, container=str(tmp_path / "t"))
        back = spy.load(str(tmp_path / "t.spy"))
        assert np.allclose(np.asarray(back.avg), np.asarray(tl.avg), atol=1e-7)
        assert np.allclose(np.asarray(back.var), np.asarray(tl.var), atol=1e-7)
        assert np.allclose(np.asarray(back.cov), np.asarray(tl.cov), atol=1e-7)

    def test_mode_after_load_is_writable(self, tmp_path):
        ad = _analog()
        spy.save(ad, container=str(tmp_path / "m"))
        back = spy.load(str(tmp_path / "m.spy"))
        assert back.mode in ("r+", "w")
        # loaded payloads are h5py-backed
        import h5py

        assert isinstance(back.data, h5py.Dataset)


class TestShowSemantics:
    def test_show_all_equals_payload(self):
        ad = _analog()
        arrs = ad.show(squeeze=False)
        assert isinstance(arrs, list) and len(arrs) == len(ad.trials)
        for k, a in enumerate(arrs):
            assert np.array_equal(a, np.asarray(ad.trials[k]))

    def test_show_single_trial_squeezes(self):
        ad = _analog()
        arr = ad.show(trials=1)
        assert isinstance(arr, np.ndarray)
        assert np.array_equal(arr, np.asarray(ad.trials[1]))

    def test_show_channel_by_label_and_index(self):
        ad = _analog()
        by_idx = ad.show(trials=0, channel=[2], squeeze=False)
        by_lab = ad.show(trials=0, channel=["c2"], squeeze=False)
        assert np.array_equal(by_idx, by_lab)
        assert np.array_equal(by_idx[:, 0], np.asarray(ad.trials[0])[:, 2])

    def test_show_honors_inplace_selection(self):
        ad = _analog()
        ad.selectdata(inplace=True, trials=[2], channel=[1])
        arr = ad.show(squeeze=False)
        arr = arr[0] if isinstance(arr, list) else arr
        assert np.array_equal(arr, np.asarray(ad.trials[2])[:, 1:2])
        ad.selectdata(clear=True, inplace=True)

    def test_show_transient_kwargs_restore_selection(self):
        ad = _analog()
        ad.selectdata(inplace=True, trials=[0])
        _ = ad.show(trials=3, squeeze=False)
        # the pre-existing in-place selection survives
        assert ad.selection is not None
        assert list(ad.selection.trial_ids) == [0]
        ad.selectdata(clear=True, inplace=True)

    def test_show_latency_window(self):
        ad = _analog()
        arr = ad.show(trials=0, latency=[0.05, 0.1], squeeze=False)
        # 200 Hz, offset 0: rows 10..20 inclusive
        assert np.array_equal(arr, np.asarray(ad.trials[0])[10:21])


class TestPaddingRules:
    """process_padding semantics (reference input_processors.py:26-91)."""

    def test_maxperlen(self):
        from syncopy_tpu.shared.input_processors import process_padding

        assert process_padding("maxperlen", np.array([100, 80]), 1000.0) == 100

    def test_nextpow2(self):
        from syncopy_tpu.shared.input_processors import process_padding

        assert process_padding("nextpow2", np.array([100]), 1000.0) == 128
        assert process_padding("nextpow2", np.array([128]), 1000.0) == 128

    def test_absolute_seconds(self):
        from syncopy_tpu.shared.input_processors import process_padding

        assert process_padding(0.25, np.array([100]), 1000.0) == 250

    def test_too_short_absolute_rejected(self):
        from syncopy_tpu.shared.input_processors import process_padding

        with pytest.raises(spy.SPYValueError):
            process_padding(0.05, np.array([100]), 1000.0)

    def test_invalid_values_rejected(self):
        from syncopy_tpu.shared.input_processors import process_padding

        for bad in ("bogus", True, [100]):
            with pytest.raises(spy.SPYValueError):
                process_padding(bad, np.array([100]), 1000.0)

    def test_padding_invariant_power(self):
        """mtmfft normalization is padding-invariant (reference
        mtmfft.py:119-128): a white-noise spectrum keeps its mean level
        under nextpow2 zero-padding (only the grid gets finer)."""
        d = spy.synthdata.white_noise(nTrials=20, nSamples=100,
                                      samplerate=200, nChannels=1, seed=7)
        plain = spy.freqanalysis(d, method="mtmfft", taper="hann",
                                 keeptrials=False)
        padded = spy.freqanalysis(d, method="mtmfft", taper="hann",
                                  pad="nextpow2", keeptrials=False)
        lvl1 = np.asarray(plain.data)[..., 1:-1, :].mean()
        lvl2 = np.asarray(padded.data)[..., 1:-1, :].mean()
        assert lvl2 == pytest.approx(lvl1, rel=0.1)


class TestCopySemantics:
    def test_deep_copy_is_independent(self):
        ad = _analog()
        cp = ad.copy()
        assert cp == ad
        assert cp.filename != ad.filename
        arr = np.asarray(cp.data).copy()
        # mutate original; copy unaffected
        d = np.asarray(ad.data)
        ad.data = d + 1.0
        assert np.array_equal(np.asarray(cp.data), arr)

    def test_copy_preserves_selection_object_state(self):
        ad = _analog()
        ad.selectdata(inplace=True, channel=[0])
        cp = ad.copy()
        # the copy is a full copy of the payload; selections don't transfer
        assert np.asarray(cp.data).shape == np.asarray(ad.data).shape
        ad.selectdata(clear=True, inplace=True)
