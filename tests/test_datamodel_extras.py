# -*- coding: utf-8 -*-
# Data-model edge cases: registered datasets, mode switching, fancy
# selections (modeled on reference tests/test_attach_dataset.py and
# test_selectdata.py fancy-index cases).

import h5py
import numpy as np
import pytest

import syncopy_tpu as spy


class TestRegisteredDatasets:
    def test_attach_and_roundtrip(self, tmp_path, adata_equal):
        tl = spy.timelockanalysis(adata_equal, covariance=True)
        assert tl.avg is not None and tl.var is not None and tl.cov is not None
        spy.save(tl, container=str(tmp_path / "tl"))
        loaded = spy.load(str(tmp_path / "tl.spy"))
        assert np.allclose(np.asarray(loaded.avg), np.asarray(tl.avg), atol=1e-6)
        assert np.allclose(np.asarray(loaded.cov), np.asarray(tl.cov), atol=1e-6)

    def test_register_custom(self, adata_equal):
        adata_equal._register_dataset("extra", np.arange(10.0))
        assert np.allclose(adata_equal._get_extra_dataset("extra"), np.arange(10.0))
        with pytest.raises(spy.SPYValueError):
            adata_equal._register_dataset("not an identifier!")


class TestModeSwitching:
    def test_readonly_mode(self, tmp_path, adata_equal):
        fname = spy.save(adata_equal, container=str(tmp_path / "m"))
        obj = spy.load(fname)
        obj.mode = "r"
        assert not obj.is_writable
        obj.mode = "r+"
        assert obj.is_writable


class TestFancySelections:
    def test_unordered_channel_selection(self, adata_equal):
        sel = spy.selectdata(adata_equal, channel=[2, 0])
        raw = np.asarray(adata_equal.trials[0])
        assert np.allclose(np.asarray(sel.trials[0]), raw[:, [2, 0]])
        assert list(sel.channel) == ["channel3", "channel1"]

    def test_repeated_channel_selection(self, adata_equal):
        sel = spy.selectdata(adata_equal, channel=[1, 1])
        assert sel.data.shape[1] == 2

    def test_unordered_trials(self, adata_equal):
        sel = spy.selectdata(adata_equal, trials=[3, 0])
        assert np.allclose(np.asarray(sel.trials[0]), np.asarray(adata_equal.trials[3]))

    def test_spectral_taper_freq_selection(self, adata_equal):
        spec = spy.freqanalysis(adata_equal, tapsmofrq=5, keeptapers=True, output="fourier")
        sub = spy.selectdata(spec, taper=[0, 1], frequency=[10, 100])
        assert sub.data.shape[1] == 2
        assert sub.freq[0] >= 10 and sub.freq[-1] <= 100

    def test_crossspectral_selection(self):
        data = spy.synthdata.ar2_network(nTrials=10, samplerate=200, nSamples=500, seed=0)
        coh = spy.connectivityanalysis(data, method="coh", tapsmofrq=3)
        sub = spy.selectdata(coh, channel_i=[0], channel_j=[1], frequency=[20, 60])
        arr = np.asarray(sub.data)
        assert arr.shape[2] == 1 and arr.shape[3] == 1
        assert sub.freq[0] >= 20 and sub.freq[-1] <= 60

    def test_show_with_latency(self, adata_equal):
        arr = adata_equal.show(trials=0, latency=[0.1, 0.2], squeeze=False)
        assert arr.shape[0] == 101

    def test_engine_with_fancy_channel_selection(self, adata_equal):
        # unordered channels force the non-fast gather path through the engine
        spec = spy.freqanalysis(
            adata_equal, method="mtmfft", taper="hann", select={"channel": [2, 0]}
        )
        ref = spy.freqanalysis(adata_equal, method="mtmfft", taper="hann")
        assert np.allclose(
            np.asarray(spec.data), np.asarray(ref.data)[:, :, :, [2, 0]], atol=1e-6
        )


class TestArithmeticObjects:
    def test_object_subtraction(self, adata_equal):
        diff = adata_equal - adata_equal
        assert np.allclose(np.asarray(diff.data), 0.0)

    def test_selection_aware_arithmetic(self, adata_equal):
        adata_equal.selectdata(trials=[0, 1], inplace=True)
        doubled = adata_equal * 2
        assert len(doubled.trials) == 2
        adata_equal.selection = None

    def test_mismatched_selection_counts(self, adata_equal):
        other = adata_equal.copy()
        other.selectdata(trials=[0], inplace=True)
        with pytest.raises(spy.SPYValueError):
            adata_equal + other


class TestCrossSpectralStats:
    def test_mean_over_channel_i(self):
        data = spy.synthdata.ar2_network(nTrials=8, samplerate=200, nSamples=400, seed=2)
        csd = spy.connectivityanalysis(data, method="csd", keeptrials=True)
        res = spy.mean(csd, dim="channel_i")
        assert res.data.shape[2] == 1
        assert list(res.channel_i) == ["mean"]
        assert np.allclose(
            np.asarray(res.data), np.asarray(csd.data).mean(axis=2, keepdims=True), atol=1e-6
        )


class TestDtypeRobustness:
    def test_int16_adc_input(self):
        """Raw int16 ADC data flows through spectral + filter paths
        (upcast to float32 on device)."""
        raw = (np.random.default_rng(0).normal(size=(400, 2)) * 1000).astype(np.int16)
        ad = spy.AnalogData(data=raw, samplerate=1000.0)
        ad.trialdefinition = np.array([[0, 200, 0], [200, 400, 0]])
        spec = spy.freqanalysis(ad, method="mtmfft", taper="hann")
        assert spec.data.dtype == np.float32
        filt = spy.preprocessing(ad, filter_class="but", filter_type="lp", freq=100)
        assert filt.data.dtype == np.float32

    def test_eventdata_custom_dimord(self):
        ev = spy.EventData(
            data=np.array([[10, 1, 7], [20, 2, 8]]),
            dimord=["sample", "eventid", "extra"], samplerate=1000.0,
        )
        assert ev.dimord == ["sample", "eventid", "extra"]


class TestLatencyStringModes:
    def test_selectdata_latency_shorthands(self):
        """'maxperiod'/'minperiod'/'prestim'/'poststim' resolve through the
        Selector (reference latency.py:17-96 + selector latency path)."""
        d = spy.synthdata.white_noise(nTrials=3, nSamples=400, nChannels=2, seed=0)
        trl = d.trialdefinition
        trl[:, 2] = -100
        d.trialdefinition = trl
        pre = spy.selectdata(d, latency="prestim")
        assert np.asarray(pre.trials[0]).shape[0] == 101
        assert pre.time[0][-1] <= 0.0
        post = spy.selectdata(d, latency="poststim")
        assert post.time[0][0] >= 0.0
        assert np.asarray(post.trials[0]).shape[0] == 300
        full = spy.selectdata(d, latency="maxperiod")
        assert np.asarray(full.trials[0]).shape[0] == 400


class TestShowSemantics:
    def test_multi_trial_returns_list(self):
        """show() with several selected trials returns a list of per-trial
        arrays (reference methods/show.py:190-194)."""
        d = spy.synthdata.white_noise(nTrials=3, nSamples=100, nChannels=2, seed=2)
        out = d.show(trials=[0, 2])
        assert isinstance(out, list) and len(out) == 2
        assert np.allclose(out[1], np.asarray(d.trials[2]))
        single = d.show(trials=1)
        assert isinstance(single, np.ndarray)


class TestBaseDataMemberParity:
    def test_trial_ids_clear_and_plot_methods(self):
        import matplotlib

        matplotlib.use("Agg")
        d = spy.synthdata.white_noise(nTrials=3, nSamples=100, nChannels=2, seed=3)
        assert d.trial_ids == [0, 1, 2]
        d.clear()  # flush is a no-op for in-memory data, must not raise
        assert d.singlepanelplot(trials=0) is not None
        assert d.multipanelplot(trials=0) is not None


class TestArithmeticMatrix:
    """Full operator matrix (+ - * / **) with scalars, arrays and objects,
    incl. dimord guards and chained expressions (reference
    test_continuousdata.py:380-418)."""

    import operator as _op

    OPS = [_op.add, _op.sub, _op.mul, _op.truediv, _op.pow]

    @pytest.fixture()
    def pair(self):
        rng = np.random.default_rng(23)
        data = rng.uniform(1.0, 2.0, size=(30, 3)).astype("f4")
        trl = np.column_stack([np.arange(0, 30, 10), np.arange(10, 31, 10), np.zeros(3)])
        a = spy.AnalogData(data=data, trialdefinition=trl, samplerate=2.0)
        b = spy.AnalogData(data=data.copy(), trialdefinition=trl, samplerate=2.0)
        return a, b

    @pytest.mark.parametrize("op", OPS)
    def test_scalar_ops(self, pair, op):
        a, _ = pair
        res = op(a, 2)
        for k, t in enumerate(res.trials):
            assert np.allclose(np.asarray(t), op(np.asarray(a.trials[k]), 2), atol=1e-6)

    @pytest.mark.parametrize("op", OPS)
    def test_object_ops(self, pair, op):
        a, b = pair
        res = op(a, b)
        for k, t in enumerate(res.trials):
            assert np.allclose(
                np.asarray(t), op(np.asarray(a.trials[k]), np.asarray(b.trials[k])),
                atol=1e-5,
            )

    def test_dimord_guard(self, pair):
        a, _ = pair
        flipped = spy.AnalogData(
            data=np.asarray(a.data).T.copy(),
            trialdefinition=a.trialdefinition, samplerate=2.0,
            dimord=["channel", "time"],
        )
        with pytest.raises(spy.SPYValueError):
            a + flipped

    def test_chained_expression(self, pair):
        a, b = pair
        result = (a + b) / a ** 3
        for k, t in enumerate(result.trials):
            ta = np.asarray(a.trials[k])
            tb = np.asarray(b.trials[k])
            assert np.allclose(np.asarray(t), (ta + tb) / ta ** 3, atol=1e-5)

    def test_spectral_object_ops(self):
        d = spy.synthdata.white_noise(nTrials=3, nSamples=128, nChannels=2, seed=3)
        s1 = spy.freqanalysis(d, method="mtmfft", taper="hann", output="fourier")
        s2 = spy.freqanalysis(d, method="mtmfft", taper="hann", output="fourier")
        diff = s1 - s2
        assert np.allclose(np.abs(np.asarray(diff.data)), 0.0, atol=1e-7)


class TestSynthDataSeeds:
    """Seed semantics of @collect_trials generators (reference
    test_synthdata.py:57-165)."""

    def test_single_trial_array_mode(self):
        from syncopy_tpu.synthdata.analog import white_noise

        a = white_noise(nSamples=100, nChannels=2, nTrials=None, seed=42)
        b = white_noise(nSamples=100, nChannels=2, nTrials=None, seed=42)
        assert isinstance(a, np.ndarray)
        assert np.allclose(a, b)
        c = white_noise(nSamples=100, nChannels=2, nTrials=None)
        d = white_noise(nSamples=100, nChannels=2, nTrials=None)
        assert not np.allclose(c, d)

    def test_seeded_trials_differ_within_object(self):
        w1 = spy.synthdata.white_noise(nSamples=100, nChannels=2, nTrials=4, seed=42)
        w2 = spy.synthdata.white_noise(nSamples=100, nChannels=2, nTrials=4, seed=42)
        assert not np.allclose(w1.show(trials=0), w1.show(trials=1))
        assert np.allclose(w1.show(trials=0), w2.show(trials=0))
        assert np.allclose(w1.show(trials=1), w2.show(trials=1))

    def test_seed_per_trial_false(self):
        s = spy.synthdata.white_noise(nSamples=100, nChannels=2, nTrials=4,
                                      seed=42, seed_per_trial=False)
        assert np.allclose(s.show(trials=0), s.show(trials=1))

    def test_ar2_seed(self):
        a = spy.synthdata.ar2_network(nTrials=3, nSamples=200, seed=5)
        b = spy.synthdata.ar2_network(nTrials=3, nSamples=200, seed=5)
        assert np.allclose(np.asarray(a.data), np.asarray(b.data))


class TestAttachedDatasetMatrix:
    """Extra-dataset lifecycle (reference test_attach_dataset.py:23-330)."""

    def _spikes(self):
        data = np.column_stack([np.arange(40), np.zeros(40), np.zeros(40)]).astype(int)
        return spy.SpikeData(data=data, samplerate=1000)

    def test_attach_update_detach(self):
        spd = self._spikes()
        spd._register_dataset("extra", np.ones((3, 3), dtype=np.float32))
        assert np.allclose(np.asarray(spd._get_extra_dataset("extra")), 1.0)
        spd._register_dataset("extra", 2 * np.ones((3, 3), dtype=np.float32))
        assert np.allclose(np.asarray(spd._get_extra_dataset("extra")), 2.0)
        spd._register_dataset("extra", None)
        assert spd._get_extra_dataset("extra") is None

    def test_copy_preserves_extra(self):
        spd = self._spikes()
        spd._register_dataset("extra", np.arange(6, dtype=np.float32).reshape(2, 3))
        dup = spd.copy()
        assert np.array_equal(np.asarray(dup._get_extra_dataset("extra")),
                              np.asarray(spd._get_extra_dataset("extra")))

    def test_save_load_roundtrip_with_extra(self, tmp_path):
        spd = self._spikes()
        spd._register_dataset("waveform", np.random.randn(40, 1, 8).astype("f4"))
        spy.save(spd, container=str(tmp_path / "wf"))
        loaded = spy.load(str(tmp_path / "wf.spy"))
        assert np.allclose(np.asarray(loaded.waveform), np.asarray(spd.waveform))

    def test_equality_sees_extra_datasets(self):
        # reference test_attach_dataset.py:75-137: presence AND values of
        # attached datasets participate in object comparison
        a, b = self._spikes(), self._spikes()
        assert a == b
        a._register_dataset("extra", np.ones((3, 3), dtype=np.float32))
        assert a != b
        b._register_dataset("extra", np.ones((3, 3), dtype=np.float32))
        assert a == b
        b._register_dataset("extra", 2 * np.ones((3, 3), dtype=np.float32))
        assert a != b
        # detaching restores equality with a plain object
        a._register_dataset("extra", None)
        b._register_dataset("extra", None)
        assert a == b == self._spikes()

    def test_copy_equality_roundtrip(self):
        spd = self._spikes()
        spd._register_dataset("extra", np.arange(9.0).reshape(3, 3))
        dup = spd.copy()
        assert dup == spd
        np.asarray(dup._get_extra_dataset("extra"))  # still intact
        dup._register_dataset("extra", np.zeros((3, 3)))
        assert dup != spd

    def test_psth_runs_with_waveform_attached(self):
        spd = spy.synthdata.poisson_noise(nTrials=3, nSpikes=600, nChannels=2,
                                          nUnits=2, samplerate=1000, seed=0)
        spd.waveform = np.random.randn(np.asarray(spd.data).shape[0], 1, 8).astype("f4")
        p = spy.spike_psth(spd, binsize=0.1, latency="minperiod")
        assert np.isfinite(np.asarray(p.data)).any()


class TestArithmeticFusedPath:
    """The whole-array fused fast path (arithmetic._fused_whole_array) must be
    bit-identical to the general per-trial path, and must disengage for
    gapped/overlapping trialdefinitions, selections, and discrete data."""

    def _tiled(self, n_trials=5, n_samp=16, n_chan=3, seed=7):
        rng = np.random.default_rng(seed)
        data = rng.uniform(0.5, 2.0, size=(n_trials * n_samp, n_chan)).astype("f4")
        trl = np.column_stack([
            np.arange(n_trials) * n_samp,
            np.arange(1, n_trials + 1) * n_samp,
            np.zeros(n_trials),
        ])
        return spy.AnalogData(data=data, trialdefinition=trl, samplerate=100.0)

    def _general_result(self, obj, operand, operator, reverse=False):
        """Reference result via the per-trial path (fused path disabled)."""
        from syncopy_tpu.datatype.methods import arithmetic as ar

        orig = ar._fused_whole_array
        ar._fused_whole_array = lambda *a, **k: None
        try:
            return ar._process_operator(obj, operand, operator, reverse=reverse)
        finally:
            ar._fused_whole_array = orig

    @pytest.mark.parametrize("operator", ["+", "-", "*", "/", "**"])
    def test_scalar_bitwise_equal(self, operator):
        from syncopy_tpu.datatype.methods import arithmetic as ar

        ad = self._tiled()
        fast = ar._process_operator(ad, 2.5, operator)
        slow = self._general_result(ad, 2.5, operator)
        assert np.array_equal(np.asarray(fast.data), np.asarray(slow.data))
        assert np.array_equal(fast.trialdefinition, slow.trialdefinition)
        assert list(fast.channel) == list(slow.channel)

    def test_reverse_scalar(self):
        from syncopy_tpu.datatype.methods import arithmetic as ar

        ad = self._tiled()
        fast = ar._process_operator(ad, 3.0, "-", reverse=True)
        slow = self._general_result(ad, 3.0, "-", reverse=True)
        assert np.array_equal(np.asarray(fast.data), np.asarray(slow.data))
        assert np.allclose(np.asarray(fast.data), 3.0 - np.asarray(ad.data))

    @pytest.mark.parametrize("shape", [(3,), (1, 3), (16, 3), (16, 1)])
    def test_array_operand_broadcasts(self, shape):
        from syncopy_tpu.datatype.methods import arithmetic as ar

        ad = self._tiled()
        operand = np.random.default_rng(1).uniform(1, 2, size=shape).astype("f4")
        fast = ar._process_operator(ad, operand, "*")
        slow = self._general_result(ad, operand, "*")
        assert np.array_equal(np.asarray(fast.data), np.asarray(slow.data))

    def test_object_operand(self):
        from syncopy_tpu.datatype.methods import arithmetic as ar

        a = self._tiled(seed=7)
        b = self._tiled(seed=8)
        fast = ar._process_operator(a, b, "/")
        slow = self._general_result(a, b, "/")
        assert np.array_equal(np.asarray(fast.data), np.asarray(slow.data))

    def test_gapped_trialdefinition_not_fused(self):
        """Gaps between trials: output only holds trial samples."""
        from syncopy_tpu.datatype.methods.arithmetic import _fused_whole_array, _OPS

        rng = np.random.default_rng(3)
        data = rng.normal(size=(50, 2)).astype("f4")
        trl = np.array([[0.0, 10, 0], [20, 30, 0], [40, 50, 0]])  # gapped
        ad = spy.AnalogData(data=data, trialdefinition=trl, samplerate=10.0)
        assert _fused_whole_array(ad, 2.0, _OPS["*"], "*", False) is None
        res = 2.0 * ad
        assert np.asarray(res.data).shape[0] == 30  # trials only, no gaps
        assert np.allclose(np.asarray(res.trials[1]), 2.0 * data[20:30])

    def test_overlapping_trials_not_fused(self):
        from syncopy_tpu.datatype.methods.arithmetic import _fused_whole_array, _OPS

        rng = np.random.default_rng(4)
        data = rng.normal(size=(30, 2)).astype("f4")
        trl = np.array([[0.0, 20, 0], [10, 30, 0]])  # overlap
        ad = spy.AnalogData(data=data, trialdefinition=trl, samplerate=10.0)
        assert _fused_whole_array(ad, 2.0, _OPS["*"], "*", False) is None
        res = ad + 1.0
        assert np.asarray(res.data).shape[0] == 40  # both trials stacked

    def test_selection_uses_general_path(self):
        ad = self._tiled()
        ad.selectdata(inplace=True, trials=[1, 3], channel=[0, 2])
        res = ad * 2.0
        want = np.asarray(ad.trials[1])[:, [0, 2]] * 2.0
        assert np.allclose(np.asarray(res.trials[0]), want)
        ad.selectdata(clear=True, inplace=True)

    def test_ragged_trials_array_operand_not_fused(self):
        """Unequal trial lengths: array operand must fall back (and still
        broadcast per trial when compatible)."""
        from syncopy_tpu.datatype.methods.arithmetic import _fused_whole_array, _OPS

        rng = np.random.default_rng(5)
        data = rng.normal(size=(30, 2)).astype("f4")
        trl = np.array([[0.0, 10, 0], [10, 30, 0]])  # 10 and 20 samples
        ad = spy.AnalogData(data=data, trialdefinition=trl, samplerate=10.0)
        operand = np.array([2.0, 3.0], dtype="f4")
        assert _fused_whole_array(ad, operand, _OPS["*"], "*", False) is None
        res = ad * operand
        assert np.allclose(np.asarray(res.trials[1]), data[10:30] * operand)

    def test_zero_division_still_raises(self):
        ad = self._tiled()
        with pytest.raises(spy.SPYValueError):
            ad / 0
