# -*- coding: utf-8 -*-
# Multi-device sharding tests on the virtual 8-device CPU mesh: channel
# axis sharding through the engine, halo-exchange time sharding, and the
# graft entry points.

import numpy as np
import pytest

import syncopy_tpu as spy


class TestHaloFIR:
    def test_matches_unsharded(self, testmesh):
        import jax.numpy as jnp

        from syncopy_tpu.ops.filtering import apply_fir, apply_fir_time_sharded, design_wsinc

        rng = np.random.default_rng(0)
        x = rng.normal(size=(1600, 4)).astype("f4")
        kern = design_wsinc("hamming", 200, 0.1, "lp")  # odd length 201
        ref = np.asarray(apply_fir(jnp.asarray(x), kern))
        got = np.asarray(apply_fir_time_sharded(x, kern, testmesh, axis_name="trial"))
        assert np.abs(got - ref).max() < 1e-5

    def test_rejects_even_kernel(self, testmesh):
        from syncopy_tpu.ops.filtering import apply_fir_time_sharded

        with pytest.raises(ValueError):
            apply_fir_time_sharded(np.zeros((800, 2), "f4"), np.ones(10), testmesh)


class TestChannelAxisSharding:
    def test_engine_results_invariant(self, testmesh):
        """4x2 (trial x channel) mesh with the channel dim actually sharded
        must reproduce the single-device result."""
        data = spy.synthdata.white_noise(nTrials=8, nSamples=512, nChannels=8, seed=0)
        seq = spy.freqanalysis(data, method="mtmfft", taper="hann")
        with spy.use_mesh(testmesh):
            par = spy.freqanalysis(data, method="mtmfft", taper="hann")
        assert np.allclose(np.asarray(seq.data), np.asarray(par.data), atol=1e-6)

    def test_cross_spectra_with_channel_sharding(self, testmesh):
        data = spy.synthdata.ar2_network(nTrials=16, samplerate=200, nSamples=512, seed=1)
        # 2 channels over a 2-way channel axis
        seq = spy.connectivityanalysis(data, method="coh", tapsmofrq=3)
        with spy.use_mesh(testmesh):
            par = spy.connectivityanalysis(data, method="coh", tapsmofrq=3)
        assert np.allclose(np.asarray(seq.data), np.asarray(par.data), atol=1e-5)


class TestGraftEntry:
    def test_entry_and_dryrun(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import jax

        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape[-1] == out.shape[-2]
        g.dryrun_multichip(8)


class TestShardedNewPaths:
    def test_welch_on_mesh(self, testmesh):
        import syncopy_tpu as spy

        d = spy.synthdata.white_noise(nTrials=8, nSamples=512, nChannels=4, seed=21)
        seq = spy.freqanalysis(d, method="welch", t_ftimwin=0.25, toi=0.5)
        with spy.use_mesh(testmesh):
            par = spy.freqanalysis(d, method="welch", t_ftimwin=0.25, toi=0.5)
        assert np.allclose(np.asarray(seq.data), np.asarray(par.data), atol=1e-6)

    def test_packed_csd_on_mesh(self, testmesh):
        import syncopy_tpu as spy

        d = spy.synthdata.ar2_network(nTrials=16, samplerate=200, nSamples=400, seed=22)
        seq = spy.connectivityanalysis(d, method="csd", tapsmofrq=2)
        with spy.use_mesh(testmesh):
            par = spy.connectivityanalysis(d, method="csd", tapsmofrq=2)
        assert np.allclose(np.asarray(seq.data), np.asarray(par.data), atol=1e-6)


class TestTimeShardedTransforms:
    """Halo'd time-axis sharding of the windowed transforms (SURVEY §5
    long-context): sharded == unsharded, and a long-trial case runs."""

    def test_stft_matches_unsharded(self, testmesh):
        import jax.numpy as jnp

        from syncopy_tpu.ops.stft import mtmconvol, mtmconvol_time_sharded
        from syncopy_tpu.ops.windows import make_tapers

        rng = np.random.default_rng(2)
        T, C, nperseg = 1024, 3, 64
        x = rng.normal(size=(T, C)).astype("f4")
        tapers = np.asarray(make_tapers("hann", None, nperseg, nperseg, 1000.0))
        ref = np.asarray(
            mtmconvol(jnp.asarray(x), jnp.asarray(tapers), jnp.arange(T), nperseg)
        )
        got = np.asarray(
            mtmconvol_time_sharded(x, tapers, nperseg, testmesh, axis_name="trial")
        )
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() < 1e-5

    def test_stft_power_dpss(self, testmesh):
        import jax.numpy as jnp

        from syncopy_tpu.ops.stft import mtmconvol, mtmconvol_time_sharded
        from syncopy_tpu.ops.windows import make_tapers

        rng = np.random.default_rng(3)
        T, C, nperseg = 512, 2, 128
        x = rng.normal(size=(T, C)).astype("f4")
        tapers = np.asarray(
            make_tapers("dpss", {"Kmax": 3, "NW": 2}, nperseg, nperseg, 1000.0)
        )
        ref = np.asarray(
            mtmconvol(jnp.asarray(x), jnp.asarray(tapers), jnp.arange(T), nperseg,
                      output="pow", keeptapers=False)
        )
        got = np.asarray(
            mtmconvol_time_sharded(x, tapers, nperseg, testmesh,
                                   output="pow", keeptapers=False)
        )
        assert np.abs(got - ref).max() < 1e-4

    def test_cwt_matches_unsharded(self, testmesh):
        import jax.numpy as jnp

        from syncopy_tpu.ops.wavelet import Morlet, cwt, cwt_time_sharded

        rng = np.random.default_rng(4)
        T, C = 2048, 2
        dt = 1.0 / 1000.0
        x = rng.normal(size=(T, C)).astype("f4")
        scales = np.array([0.01, 0.02, 0.04])
        ref = np.asarray(cwt(jnp.asarray(x), Morlet(6), scales, dt))
        got = np.asarray(cwt_time_sharded(x, Morlet(6), scales, dt, testmesh))
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() < 1e-5

    def test_cwt_halo_guard(self, testmesh):
        from syncopy_tpu.ops.wavelet import Morlet, cwt_time_sharded

        # scale so large the halo exceeds the local shard -> explicit error
        with pytest.raises(ValueError, match="halo"):
            cwt_time_sharded(np.zeros((1024, 1), "f4"), Morlet(6),
                             np.array([1.0]), 1.0 / 1000.0, testmesh)

    def test_long_trial_runs_sharded(self, testmesh):
        from syncopy_tpu.ops.wavelet import Morlet, cwt_time_sharded

        # ~1e6 samples: the full-signal FFT bank would be (S, 2^21) complex
        # per channel on ONE device; sharded it is 8x smaller per device
        T = 1 << 20
        t = np.arange(T, dtype="f4") / 1000.0
        x = np.sin(2 * np.pi * 40 * t)[:, None].astype("f4")
        scales = np.array([0.004, 0.008])
        spec = cwt_time_sharded(x, Morlet(6), scales, 1.0 / 1000.0, testmesh)
        power = np.abs(np.asarray(spec[:, T // 2 - 512 : T // 2 + 512, 0]))
        # the 40 Hz scale (0.004 ~ 40 Hz Morlet) dominates mid-signal
        assert power[0].mean() > power[1].mean()
