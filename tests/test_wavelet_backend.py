# -*- coding: utf-8 -*-
# Backend oracle tests for the CWT/superlet kernels (modeled on reference
# tests/backend/test_timefreq.py): compare the batched FFT-convolution
# implementation against direct time-domain convolution.

import numpy as np
import pytest
from scipy.signal import fftconvolve

from syncopy_tpu.ops.wavelet import (
    DOG,
    Morlet,
    MorletSL,
    Paul,
    cwt,
    get_optimal_wavelet_scales,
    superlet,
    superlet_weights,
)


def cwt_oracle(data, wavelet, scales, dt):
    """Direct per-scale convolution (Torrence & Compo sampling)."""
    out = np.zeros((len(scales),) + data.shape, dtype=np.complex64)
    for k, s in enumerate(scales):
        M = 10 * s / dt
        t = np.arange((-M + 1) / 2.0, (M + 1) / 2.0) * dt
        norm = dt**0.5 / (s * 8 * np.pi)
        kern = norm * wavelet.time(t, s)
        out[k] = fftconvolve(data, kern[:, None], mode="same")
    return out


class TestCWT:
    @pytest.mark.parametrize("wav", [Morlet(6), Paul(4), DOG(2)])
    def test_vs_direct_convolution(self, wav):
        rng = np.random.default_rng(0)
        data = rng.normal(size=(600, 2)).astype("f4")
        dt = 1 / 500.0
        scales = wav.scale_from_period(1 / np.array([10.0, 25.0, 60.0]))
        ref = cwt_oracle(data, wav, scales, dt)
        got = np.asarray(cwt(data, wav, scales, dt))
        assert np.abs(got - ref).max() < 1e-4 * max(np.abs(ref).max(), 1)

    def test_optimal_scales_ordering(self):
        scales = get_optimal_wavelet_scales(Morlet(6).scale_from_period, 1000, 0.001)
        assert np.all(np.diff(scales) < 0)  # low frequencies first

    def test_harmonic_amplitude(self):
        """|CWT| at the harmonic frequency approximates the amplitude."""
        fs, f0, A = 500.0, 25.0, 2.0
        t = np.arange(1000) / fs
        sig = (A * np.cos(2 * np.pi * f0 * t)).astype("f4")[:, None]
        wav = Morlet(6)
        scales = wav.scale_from_period(1 / np.array([f0]))
        got = np.abs(np.asarray(cwt(sig, wav, scales, 1 / fs)))[0, 500, 0]
        assert got == pytest.approx(A, rel=0.25)


class TestSuperletBackend:
    def test_multiplicative_weights(self):
        w, orders = superlet_weights(np.array([0.1, 0.05, 0.02]), order_max=4, adaptive=False)
        assert orders == [1, 2, 3, 4]
        assert np.allclose(w, 0.25)

    def test_adaptive_weights_monotone(self):
        scales = np.sort(MorletSL.scale_from_period(1 / np.linspace(10, 80, 15)))[::-1]
        w, orders = superlet_weights(scales, order_max=5, adaptive=True)
        # every scale's weights sum to (1 + alpha)/(order span) style norm > 0
        assert np.all(w.sum(axis=0) > 0)
        # higher frequencies engage higher orders
        assert w[-1, -1] > 0 and w[-1, 0] == 0

    def test_harmonic_amplitude(self):
        """Superlet modulus at the harmonic frequency equals the amplitude
        (the Moca et al. normalization)."""
        fs, f0, A = 500.0, 30.0, 1.5
        t = np.arange(1000) / fs
        sig = (A * np.cos(2 * np.pi * f0 * t)).astype("f4")[:, None]
        scales = MorletSL.scale_from_period(1 / np.array([20.0, 30.0, 45.0]))
        got = np.abs(np.asarray(superlet(sig, scales, order_max=10, c_1=3, dt=1 / fs)))
        assert got[1, 500, 0] == pytest.approx(A, rel=0.15)
        # off-peak response is sharply lower
        assert got[0, 500, 0] < A / 2

    @pytest.mark.parametrize("adaptive", [False, True])
    def test_scanned_kernel_matches_per_order_formulation(self, adaptive):
        """The scale-scanned common-L superlet must equal the definition:
        per-order CWT banks (each at its own FFT length) combined as a
        weighted complex-log geometric mean."""
        from syncopy_tpu.ops.wavelet import _apply_bank, _wavelet_kernel_fft

        rng = np.random.default_rng(3)
        data = rng.normal(size=(400, 3)).astype("f4")
        dt = 1 / 400.0
        scales = np.sort(MorletSL.scale_from_period(1 / np.linspace(15, 90, 7)))[::-1]
        order_max, order_min, c_1 = 4, 1, 3

        w, cycle_orders = superlet_weights(scales, order_max, order_min, adaptive)
        scales_t = tuple(scales.tolist())
        acc = np.zeros((len(scales), 400, 3), dtype=np.complex128)
        for j, order in enumerate(cycle_orders):
            kfft, L = _wavelet_kernel_fft(None, scales_t, dt, 400, c_1 * order)
            spec = np.asarray(_apply_bank(data, kfft, L, 400))
            wj = w[j][:, None, None]
            acc += np.where(wj > 0, wj * np.log(spec, where=wj > 0, out=np.zeros_like(spec, dtype=np.complex128)), 0.0)
        ref = np.exp(acc)

        got = np.asarray(
            superlet(data, scales, order_max, order_min, c_1, adaptive, dt=dt)
        )
        assert np.abs(got - ref).max() < 2e-4 * np.abs(ref).max()


class TestSynthData:
    def test_ar2_peak_freq(self):
        from syncopy_tpu.synthdata import ar2_peak_freq

        f = ar2_peak_freq(0.55, -0.8, samplerate=200)
        assert f == pytest.approx(40, abs=2)

    def test_collect_trials_bare_array(self):
        import syncopy_tpu as spy

        arr = spy.synthdata.white_noise(nTrials=None, nSamples=100, nChannels=2, seed=0)
        assert isinstance(arr, np.ndarray)
        assert arr.shape == (100, 2)

    def test_seed_reproducibility(self):
        import syncopy_tpu as spy

        a = spy.synthdata.white_noise(nTrials=3, nSamples=50, nChannels=2, seed=9)
        b = spy.synthdata.white_noise(nTrials=3, nSamples=50, nChannels=2, seed=9)
        assert a == b

    def test_phase_diffusion(self):
        import syncopy_tpu as spy

        ad = spy.synthdata.phase_diffusion(
            freq=40, eps=0.1, samplerate=500, nChannels=2, nSamples=500, nTrials=4, seed=1
        )
        assert len(ad.trials) == 4
        spec = spy.freqanalysis(ad, method="mtmfft", taper="hann", keeptrials=False)
        arr = np.asarray(spec.data)[0, 0, :, 0]
        assert abs(spec.freq[np.argmax(arr)] - 40) < 5

    def test_batched_ar2_statistics(self):
        import syncopy_tpu as spy

        sigs = spy.synthdata.ar2_network_batched(nTrials=50, nSamples=500, seed=3)
        assert sigs.shape == (50, 500, 2)
        # spectral peak at ~40 Hz for fs=200
        spec = np.abs(np.fft.rfft(sigs[:, :, 0] * np.hanning(500), axis=1)) ** 2
        freqs = np.fft.rfftfreq(500, 1 / 200.0)
        assert abs(freqs[np.argmax(spec.mean(axis=0))] - 40) < 4

    def test_mk_random_adjmat(self):
        from syncopy_tpu.synthdata import mk_RandomAdjMat

        A = mk_RandomAdjMat(nChannels=5, seed=0)
        assert A.shape == (5, 5)
        assert np.all(np.diag(A) == 0)


class TestWaveletAnalysis:
    def test_transform_and_power(self):
        import syncopy_tpu as spy

        fs = 200.0
        t = np.arange(800) / fs
        sig = np.cos(2 * np.pi * 15 * t).astype("f4")
        wa = spy.WaveletAnalysis(sig, dt=1 / fs)
        assert wa.wavelet_transform.shape[0] == len(wa.scales)
        # power peaks at 15 Hz
        gws = wa.global_wavelet_spectrum
        peak = wa.fourier_frequencies[np.argmax(gws)]
        assert abs(peak - 15) < 3

    def test_reconstruction(self):
        import syncopy_tpu as spy

        rng = np.random.default_rng(0)
        fs = 100.0
        t = np.arange(512) / fs
        sig = (np.cos(2 * np.pi * 5 * t) + 0.5 * np.cos(2 * np.pi * 12 * t)).astype("f4")
        wa = spy.WaveletAnalysis(sig, dt=1 / fs, dj=0.05)
        rec = wa.reconstruction()[:, 0]
        interior = slice(64, -64)
        corr = np.corrcoef(rec[interior], sig[interior])[0, 1]
        assert corr > 0.95

    def test_coi_mask(self):
        import syncopy_tpu as spy

        sig = np.random.default_rng(1).normal(size=400).astype("f4")
        wa = spy.WaveletAnalysis(sig, dt=0.01, mask_coi=True)
        power = wa.wavelet_power
        # edges of the largest scales are masked
        assert np.isnan(power[-1, 0, 0])
        assert not np.isnan(power[0, 200, 0])


class TestSuperletMagnitudeOnly:
    """The magnitude-only superlet fast path (real log/exp accumulation)
    must reproduce |complex gmean| to float rounding — it is the
    production kernel for output='pow'/'abs'."""

    def test_matches_complex_magnitude(self):
        import jax.numpy as jnp

        from syncopy_tpu.ops.wavelet import superlet

        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.normal(size=(400, 3)).astype(np.float32))
        foi = np.linspace(10.0, 80.0, 9)
        scales = (1.0 / foi) / (2 * np.pi)
        for adaptive in (False, True):
            zc = np.asarray(superlet(x, scales, order_max=4, adaptive=adaptive,
                                     dt=1e-3))
            m = np.asarray(superlet(x, scales, order_max=4, adaptive=adaptive,
                                    dt=1e-3, magnitude_only=True))
            assert m.dtype == np.float32
            ref = np.abs(zc)
            scale = ref.max()
            assert np.abs(m - ref).max() / scale < 1e-5

    def test_frontend_pow_unchanged(self):
        """freqanalysis(method='superlet', output='pow') — now routed
        through the magnitude kernel — must equal the complex-path power."""
        import syncopy_tpu as spy
        from syncopy_tpu.ops.wavelet import superlet as sl_op

        adata = spy.synthdata.harmonic(nTrials=3, freq=40, samplerate=500,
                                       nSamples=300, nChannels=2)
        out = spy.freqanalysis(adata, method="superlet", order_max=4,
                               foi=np.linspace(20, 100, 8), output="pow")
        # oracle: complex kernel squared magnitude per trial
        foi = np.asarray(out.freq)
        scales = (1.0 / foi) / (2 * np.pi)
        tr0 = np.asarray(adata.trials[0]).astype(np.float32)
        zc = np.asarray(sl_op(tr0 - tr0.mean(axis=0), scales, order_max=4,
                              dt=1.0 / 500))
        want = np.abs(zc) ** 2  # (S, T, C)
        got = np.asarray(out.trials[0])[:, 0, :, :]  # (T, S, C)
        np.testing.assert_allclose(got, np.transpose(want, (1, 0, 2)),
                                   rtol=2e-4, atol=1e-8)
