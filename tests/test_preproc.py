# -*- coding: utf-8 -*-
# Preprocessing tests (modeled on reference tests/test_preproc.py and
# tests/backend/test_resampling.py): filter attenuation, scipy parity,
# hilbert, resampling, detrend/zscore/rectify.

import numpy as np
import pytest
import scipy.signal as sp_sig

import syncopy_tpu as spy


def two_band_signal(nTrials=4, nSamples=1000, samplerate=1000.0):
    """10 Hz + 200 Hz harmonics + small noise."""
    rng = np.random.default_rng(0)
    t = np.arange(nSamples) / samplerate
    trls = []
    for _ in range(nTrials):
        sig = np.cos(2 * np.pi * 10 * t) + np.cos(2 * np.pi * 200 * t)
        sig = sig + 0.05 * rng.normal(size=nSamples)
        trls.append(np.column_stack([sig, sig]).astype("f4"))
    return spy.AnalogData(data=trls, samplerate=samplerate)


def band_power(adata, flo, fhi):
    spec = spy.freqanalysis(adata, method="mtmfft", taper="hann", keeptrials=False)
    arr = np.asarray(spec.data)[0, 0, :, 0]
    mask = (spec.freq >= flo) & (spec.freq <= fhi)
    return arr[mask].max()


class TestButterworth:
    def test_lowpass_attenuation(self):
        data = two_band_signal()
        filt = spy.preprocessing(data, filter_class="but", filter_type="lp", freq=50)
        assert band_power(filt, 5, 15) > 0.1
        assert band_power(filt, 195, 205) < 1e-4

    def test_highpass(self):
        data = two_band_signal()
        filt = spy.preprocessing(data, filter_class="but", filter_type="hp", freq=100)
        assert band_power(filt, 5, 15) < 1e-4
        assert band_power(filt, 195, 205) > 0.1

    def test_bandstop(self):
        data = two_band_signal()
        filt = spy.preprocessing(data, filter_class="but", filter_type="bs", freq=[150, 250])
        assert band_power(filt, 5, 15) > 0.1
        assert band_power(filt, 195, 205) < 1e-4

    def test_twopass_matches_scipy(self):
        rng = np.random.default_rng(1)
        sig = rng.normal(size=(800, 2)).astype("f4")
        data = spy.AnalogData(data=sig, samplerate=1000)
        filt = spy.preprocessing(data, filter_class="but", filter_type="lp", freq=100, order=6)
        sos = sp_sig.butter(6, 100, "lp", fs=1000, output="sos")
        ref = sp_sig.sosfiltfilt(sos, sig.astype(np.float64), axis=0)
        assert np.allclose(np.asarray(filt.data), ref, atol=1e-4)

    def test_onepass_matches_scipy(self):
        rng = np.random.default_rng(2)
        sig = rng.normal(size=(500, 1)).astype("f4")
        data = spy.AnalogData(data=sig, samplerate=500)
        filt = spy.preprocessing(
            data, filter_class="but", filter_type="lp", freq=50, order=4, direction="onepass"
        )
        sos = sp_sig.butter(4, 50, "lp", fs=500, output="sos")
        ref = sp_sig.sosfilt(sos, sig.astype(np.float64), axis=0)
        assert np.allclose(np.asarray(filt.data), ref, atol=1e-4)


class TestFIRWS:
    def test_lowpass(self):
        data = two_band_signal()
        filt = spy.preprocessing(data, filter_class="firws", filter_type="lp", freq=50)
        assert band_power(filt, 5, 15) > 0.1
        assert band_power(filt, 195, 205) < 1e-4

    def test_bandpass(self):
        data = two_band_signal()
        filt = spy.preprocessing(data, filter_class="firws", filter_type="bp", freq=[150, 250])
        assert band_power(filt, 5, 15) < 1e-4
        assert band_power(filt, 195, 205) > 0.1

    def test_minphase(self):
        data = two_band_signal()
        filt = spy.preprocessing(
            data, filter_class="firws", filter_type="lp", freq=50,
            direction="onepass-minphase",
        )
        assert band_power(filt, 195, 205) < 1e-3

    def test_minphase_rejected_for_but(self):
        data = two_band_signal(nTrials=1)
        with pytest.raises(spy.SPYValueError):
            spy.preprocessing(
                data, filter_class="but", filter_type="lp", freq=50, direction="onepass-minphase"
            )


class TestHilbert:
    def test_envelope(self):
        # amplitude-modulated carrier: |analytic| recovers the envelope
        fs = 1000.0
        t = np.arange(2000) / fs
        env = 1 + 0.5 * np.cos(2 * np.pi * 2 * t)
        sig = (env * np.cos(2 * np.pi * 100 * t)).astype("f4")
        data = spy.AnalogData(data=sig[:, None], samplerate=fs)
        out = spy.preprocessing(data, filter_class=None, polyremoval=0, hilbert="abs")
        got = np.asarray(out.data)[:, 0]
        interior = slice(200, 1800)
        assert np.allclose(got[interior], env[interior], atol=0.05)

    def test_complex_output(self):
        data = two_band_signal(nTrials=1)
        out = spy.preprocessing(
            data, filter_class="but", filter_type="lp", freq=50, hilbert="complex"
        )
        assert np.iscomplexobj(np.asarray(out.data))


class TestRectify:
    def test_rectify(self):
        data = two_band_signal(nTrials=1)
        out = spy.preprocessing(data, filter_class=None, polyremoval=0, rectify=True)
        assert np.all(np.asarray(out.data) >= 0)

    @pytest.mark.parametrize("output", ["abs", "real", "imag", "absreal",
                                        "absimag", "angle"])
    def test_hilbert_outputs_vs_scipy(self, output):
        rng = np.random.default_rng(9)
        sig = rng.normal(size=(500, 2)).astype("f4")
        data = spy.AnalogData(data=sig, samplerate=500)
        out = spy.preprocessing(data, filter_class=None, polyremoval=0,
                                hilbert=output)
        # polyremoval=0 demeans before the transform — mirror it
        demeaned = sig.astype(np.float64) - sig.astype(np.float64).mean(axis=0)
        analytic = sp_sig.hilbert(demeaned, axis=0)
        expected = {
            "abs": np.abs(analytic), "real": analytic.real,
            "imag": analytic.imag, "absreal": np.abs(analytic.real),
            "absimag": np.abs(analytic.imag), "angle": np.angle(analytic),
        }[output]
        assert np.allclose(np.asarray(out.data), expected, atol=1e-4), output

    def test_rectify_and_hilbert_conflict(self):
        data = two_band_signal(nTrials=1)
        with pytest.raises(spy.SPYValueError):
            spy.preprocessing(data, filter_class=None, polyremoval=0, rectify=True, hilbert="abs")


class TestDetrendZscore:
    def test_detrend(self):
        data = spy.synthdata.linear_trend(y_max=10, nTrials=2, nSamples=500, nChannels=2)
        out = spy.preprocessing(data, filter_class=None, polyremoval=1)
        arr = np.asarray(out.data)
        assert np.abs(arr.mean()) < 1e-5
        assert np.abs(arr).max() < 0.1  # pure trend is fully removed

    def test_zscore(self):
        data = two_band_signal(nTrials=3)
        out = spy.preprocessing(data, filter_class=None, polyremoval=0, zscore=True)
        for trl in out.trials:
            arr = np.asarray(trl)
            assert np.allclose(arr.std(axis=0), 1.0, atol=1e-4)
            assert np.allclose(arr.mean(axis=0), 0.0, atol=1e-5)

    def test_nothing_requested(self):
        data = two_band_signal(nTrials=1)
        with pytest.raises(spy.SPYValueError):
            spy.preprocessing(data, filter_class=None)


class TestResampling:
    def test_downsample(self):
        data = two_band_signal(nSamples=1000, samplerate=1000.0)
        out = spy.resampledata(data, method="downsample", resamplefs=500)
        assert out.samplerate == 500
        assert np.asarray(out.trials[0]).shape[0] == 500
        # data is subsampled raw (no AA filter by default)
        assert np.allclose(
            np.asarray(out.trials[0]), np.asarray(data.trials[0])[::2], atol=1e-6
        )

    def test_downsample_rejects_noninteger(self):
        data = two_band_signal(nTrials=1)
        with pytest.raises(spy.SPYValueError):
            spy.resampledata(data, method="downsample", resamplefs=300)

    def test_downsample_with_aa_filter(self):
        data = two_band_signal(nSamples=1000, samplerate=1000.0)
        out = spy.resampledata(data, method="downsample", resamplefs=500, lpfreq=200)
        assert out.samplerate == 500

    def test_resample_vs_scipy(self):
        rng = np.random.default_rng(3)
        sig = rng.normal(size=(1000, 2)).astype("f4")
        data = spy.AnalogData(data=sig, samplerate=1000)
        out = spy.resampledata(data, method="resample", resamplefs=400)
        assert out.samplerate == 400
        assert np.asarray(out.trials[0]).shape[0] == 400
        # compare against scipy polyphase with the same kernel
        from syncopy_tpu.ops.filtering import _resample_kernel

        k = _resample_kernel(2, 5, 1000, None, None, 1000.0)
        ref = sp_sig.resample_poly(sig.astype(np.float64), 2, 5, window=k, axis=0)
        assert np.allclose(np.asarray(out.trials[0]), ref, atol=1e-4)

    def test_resample_preserves_low_freq(self):
        data = spy.synthdata.harmonic(freq=20, samplerate=1000, nTrials=2, nSamples=1000, nChannels=1)
        out = spy.resampledata(data, method="resample", resamplefs=250)
        spec = spy.freqanalysis(out, method="mtmfft", taper="hann", keeptrials=False)
        arr = np.asarray(spec.data)[0, 0, :, 0]
        assert spec.freq[np.argmax(arr)] == pytest.approx(20, abs=2)


class TestResamplePower:
    """Spectral-power conservation through rate conversion (reference
    tests/test_resampledata.py:45-145): naive decimation of white noise
    doubles per-bin power (aliasing folds the removed band back in),
    anti-alias filtering and polyphase resampling conserve it."""

    fs, nSamples, nTrials = 200, 991, 60

    @pytest.fixture(scope="class")
    def noise_and_pow(self):
        adata = spy.synthdata.white_noise(
            nTrials=self.nTrials, nChannels=2, nSamples=self.nSamples,
            samplerate=self.fs, seed=42,
        )
        spec = spy.freqanalysis(adata, tapsmofrq=1, keeptrials=False)
        pow_orig = np.asarray(spec.data)[0, 0, 5:, 0].mean()
        return adata, pow_orig

    def _mean_power(self, ds, fmax=None):
        spec = spy.freqanalysis(ds, tapsmofrq=1, keeptrials=False)
        arr = np.asarray(spec.data)[0, 0, :, 0]
        if fmax is not None:
            arr = arr[np.asarray(spec.freq) <= fmax]
        return arr[5:].mean()

    def test_naive_decimation_doubles_power(self, noise_and_pow):
        adata, pow_orig = noise_and_pow
        ds = spy.resampledata(adata, method="downsample", resamplefs=self.fs // 2)
        lens = np.unique(np.diff(ds.sampleinfo, axis=1))
        assert lens.size == 1  # equal trials stay equal
        assert np.allclose(2 * pow_orig, self._mean_power(ds), rtol=0.15)

    def test_aa_filter_conserves_power(self, noise_and_pow):
        adata, pow_orig = noise_and_pow
        ds = spy.resampledata(adata, method="downsample",
                              resamplefs=self.fs // 2, lpfreq=self.fs // 4)
        # away from the filter roll-off the plateau matches the original
        assert np.allclose(pow_orig, self._mean_power(ds, fmax=self.fs / 4 - 5),
                           rtol=0.15)

    def test_polyphase_resample_conserves_power(self, noise_and_pow):
        adata, pow_orig = noise_and_pow
        rs = spy.resampledata(adata, method="resample",
                              resamplefs=self.fs * 0.43, order=5000)
        lens = np.unique(np.diff(rs.sampleinfo, axis=1))
        assert lens.size == 1
        assert np.allclose(pow_orig,
                           self._mean_power(rs, fmax=self.fs * 0.43 / 2 - 3),
                           rtol=0.15)

    def test_lpfreq_beyond_new_nyquist_rejected(self, noise_and_pow):
        adata, _ = noise_and_pow
        with pytest.raises(spy.SPYValueError, match="lpfreq"):
            spy.resampledata(adata, method="downsample",
                             resamplefs=self.fs // 2, lpfreq=self.fs / 1.5)

    def test_selection_through_resample(self, noise_and_pow):
        adata, pow_orig = noise_and_pow
        ds = spy.resampledata(adata, method="downsample",
                              resamplefs=self.fs // 2, lpfreq=self.fs // 4,
                              select={"trials": list(range(20)), "channel": [1]})
        assert len(ds.trials) == 20 and len(ds.channel) == 1
        assert np.all(np.isfinite(np.asarray(ds.data)))
        # no power lost relative to the original plateau
        assert self._mean_power(ds, fmax=self.fs / 4 - 5) >= 0.7 * pow_orig


class TestChained:
    def test_filter_then_spectrum(self):
        data = two_band_signal()
        filt = spy.preprocessing(data, filter_class="but", filter_type="lp", freq=50)
        spec = spy.freqanalysis(filt, method="mtmfft", taper="hann")
        assert "preprocessing" in filt.cfg
        assert "freqanalysis" in spec.cfg
        assert "preprocessing" in spec.cfg  # chained provenance

    def test_parallel_preproc(self, testmesh):
        data = two_band_signal(nTrials=8)
        seq = spy.preprocessing(data, filter_class="but", filter_type="lp", freq=50)
        with spy.use_mesh(testmesh):
            par = spy.preprocessing(data, filter_class="but", filter_type="lp", freq=50)
        assert np.allclose(np.asarray(seq.data), np.asarray(par.data), atol=1e-5)


class TestPreprocSelection:
    def test_select_through_filter(self):
        data = two_band_signal(nTrials=4)
        filt = spy.preprocessing(
            data, filter_class="but", filter_type="lp", freq=50,
            select={"trials": [0, 2], "channel": [1]},
        )
        assert len(filt.trials) == 2
        assert filt.data.shape[1] == 1
        ref = spy.preprocessing(data, filter_class="but", filter_type="lp", freq=50)
        assert np.allclose(
            np.asarray(filt.trials[0]), np.asarray(ref.trials[0])[:, [1]], atol=1e-5
        )
        assert data.selection is None

    def test_resample_with_selection(self):
        data = two_band_signal(nTrials=4)
        out = spy.resampledata(
            data, method="downsample", resamplefs=500, select={"trials": [1]}
        )
        assert len(out.trials) == 1


class TestNaNMetadata:
    """Per-trial NaN flags through the aux side-channel
    (reference test_preproc.py:251-271)."""

    def _nan_data(self):
        arr = [(i + 1.0) * np.ones((20, 3), dtype="f4") for i in range(5)]
        arr[1][5, 1] = np.nan
        arr[4][10:15, 2] = np.nan
        return spy.AnalogData(data=arr, samplerate=50)

    def test_but_nan_trials(self):
        res = spy.preprocessing(self._nan_data(), filter_class="but",
                                filter_type="lp", freq=20)
        assert res.info["nan_trials"] == [1, 4]
        # IIR filters cannot work around NaNs: affected trials are all-NaN
        assert np.isnan(np.asarray(res.trials[1])[:, 1]).all()
        assert not np.isnan(np.asarray(res.trials[0])).any()

    def test_firws_nan_trials(self):
        res = spy.preprocessing(self._nan_data(), filter_class="firws",
                                filter_type="lp", freq=20, order=40)
        assert res.info["nan_trials"] == [1, 4]

    def test_detrend_nan_trials(self):
        res = spy.preprocessing(self._nan_data(), filter_class=None, polyremoval=1)
        assert res.info["nan_trials"] == [1, 4]

    def test_clean_data_empty_list(self):
        clean = spy.synthdata.white_noise(nTrials=3, nSamples=64, nChannels=2, seed=0)
        res = spy.preprocessing(clean, filter_class="but", filter_type="lp", freq=100)
        assert res.info["nan_trials"] == []

    def test_nan_flags_with_chunking(self, monkeypatch):
        from syncopy_tpu.engine import routine

        monkeypatch.setattr(routine, "MAX_CHUNK_TRIALS", 2)
        res = spy.preprocessing(self._nan_data(), filter_class="but",
                                filter_type="lp", freq=20)
        assert res.info["nan_trials"] == [1, 4]


class TestPreprocValidationMatrix:
    """Frontend validation (reference test_preproc.py exception blocks)."""

    @pytest.fixture(scope="class")
    def d(self):
        return spy.synthdata.white_noise(nTrials=2, nSamples=500,
                                         samplerate=500, nChannels=2, seed=0)

    @pytest.mark.parametrize("freq", [-10, 400])
    def test_freq_outside_nyquist(self, d, freq):
        with pytest.raises(spy.SPYValueError, match="freq"):
            spy.preprocessing(d, filter_class="but", filter_type="lp",
                              freq=freq)

    def test_band_filters_need_two_freqs(self, d):
        with pytest.raises((spy.SPYTypeError, spy.SPYValueError)):
            spy.preprocessing(d, filter_class="but", filter_type="bp", freq=50)
        with pytest.raises((spy.SPYTypeError, spy.SPYValueError)):
            spy.preprocessing(d, filter_class="firws", filter_type="bs", freq=50)

    def test_invalid_class_direction_order(self, d):
        with pytest.raises(spy.SPYValueError, match="filter_class"):
            spy.preprocessing(d, filter_class="cheby", filter_type="lp", freq=50)
        with pytest.raises(spy.SPYValueError, match="direction"):
            spy.preprocessing(d, filter_class="but", filter_type="lp", freq=50,
                              direction="threepass")
        with pytest.raises(spy.SPYValueError, match="order"):
            spy.preprocessing(d, filter_class="firws", filter_type="lp",
                              freq=50, order=-5)

    def test_downsample_cannot_upsample(self, d):
        with pytest.raises(spy.SPYValueError, match="resamplefs"):
            spy.resampledata(d, method="downsample", resamplefs=700)


class TestFilterAttenuationMatrix:
    """Quantitative stop-band attenuation for every filter_type x
    filter_class combination, measured on a two-tone signal (reference
    test_preproc.py frequency-response sweeps)."""

    FS = 1000.0

    def _two_tone(self):
        t = np.arange(4000) / self.FS
        sig = (np.cos(2 * np.pi * 30 * t) + np.cos(2 * np.pi * 200 * t))
        return spy.AnalogData(data=sig[:, None].astype("f4"),
                              samplerate=self.FS)

    def _band_power(self, filtered, f0):
        spec = spy.freqanalysis(filtered, method="mtmfft", taper="hann")
        arr = np.asarray(spec.data)[0, 0, :, 0]
        freqs = np.asarray(spec.freq)
        return arr[np.argmin(np.abs(freqs - f0))]

    @pytest.mark.parametrize("fclass", ["but", "firws"])
    def test_lowpass_kills_high_tone(self, fclass):
        ad = self._two_tone()
        flt = spy.preprocessing(ad, filter_class=fclass, filter_type="lp",
                                freq=100)
        assert self._band_power(flt, 30) > 100 * self._band_power(flt, 200)

    @pytest.mark.parametrize("fclass", ["but", "firws"])
    def test_highpass_kills_low_tone(self, fclass):
        ad = self._two_tone()
        flt = spy.preprocessing(ad, filter_class=fclass, filter_type="hp",
                                freq=100)
        assert self._band_power(flt, 200) > 100 * self._band_power(flt, 30)

    @pytest.mark.parametrize("fclass", ["but", "firws"])
    def test_bandpass_keeps_only_inside(self, fclass):
        ad = self._two_tone()
        flt = spy.preprocessing(ad, filter_class=fclass, filter_type="bp",
                                freq=[150, 250])
        assert self._band_power(flt, 200) > 100 * self._band_power(flt, 30)

    @pytest.mark.parametrize("fclass", ["but", "firws"])
    def test_bandstop_notches_inside(self, fclass):
        ad = self._two_tone()
        flt = spy.preprocessing(ad, filter_class=fclass, filter_type="bs",
                                freq=[150, 250])
        assert self._band_power(flt, 30) > 100 * self._band_power(flt, 200)

    def test_twopass_is_zero_phase_for_iir(self):
        """Butterworth twopass cancels the IIR phase shift; onepass keeps
        it (the reference's filtfilt-vs-lfilter contract)."""
        fs = 1000.0
        t = np.arange(2000) / fs
        tone = np.cos(2 * np.pi * 40 * t)[:, None].astype("f4")
        ad = spy.AnalogData(data=tone, samplerate=fs)
        two = spy.preprocessing(ad, filter_class="but", filter_type="lp",
                                freq=60, direction="twopass", order=4)
        one = spy.preprocessing(ad, filter_class="but", filter_type="lp",
                                freq=60, direction="onepass", order=4)
        mid = slice(500, 1500)
        ref = tone[mid, 0]
        err_two = np.abs(np.asarray(two.data)[mid, 0] - ref).max()
        err_one = np.abs(np.asarray(one.data)[mid, 0] - ref).max()
        assert err_two < 0.05
        assert err_one > 5 * err_two  # phase-shifted near the cutoff

    def test_firws_twopass_doubles_attenuation(self):
        ad = self._two_tone()
        one = spy.preprocessing(ad, filter_class="firws", filter_type="lp",
                                freq=100, direction="onepass", order=100)
        two = spy.preprocessing(ad, filter_class="firws", filter_type="lp",
                                freq=100, direction="twopass", order=100)
        stop_one = self._band_power(one, 200)
        stop_two = self._band_power(two, 200)
        assert stop_two < stop_one / 10  # squared response in the stop band

    def test_minphase_kernel_properties(self):
        """minphaserceps: same magnitude response, energy concentrated at
        the kernel start (reference firws.py:168)."""
        from syncopy_tpu.ops.filtering import design_wsinc, minphaserceps

        lin = np.asarray(design_wsinc("hamming", 200, 0.1, "lp"))
        mp = np.asarray(minphaserceps(lin))
        H_lin = np.abs(np.fft.rfft(lin, n=1024))
        H_mp = np.abs(np.fft.rfft(mp, n=1024))
        assert np.allclose(H_lin, H_mp, atol=1e-3)
        # front-loaded energy: first quarter holds nearly everything
        q = len(mp) // 4
        assert np.sum(mp[:q] ** 2) > 0.9 * np.sum(mp ** 2)
        # the linear-phase original is centered instead
        assert np.sum(lin[:q] ** 2) < 0.5 * np.sum(lin ** 2)


class TestFilterGemmPath:
    """Direct-GEMM forms of apply_fir/hilbert (ops/filtering.py): equality
    against the FFT forms, and the preprocessing frontend end to end."""

    def test_apply_fir_matches_fft(self, monkeypatch):
        from syncopy_tpu.ops.filtering import apply_fir, design_wsinc
        import jax.numpy as jnp

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((333, 3)).astype("f4"))
        k = design_wsinc("hamming", 120, 0.2, "lp")
        monkeypatch.setenv("SPY_TPU_FILTER_GEMM", "0")
        ref = np.asarray(apply_fir(x, k))
        monkeypatch.setenv("SPY_TPU_FILTER_GEMM", "1")
        new = np.asarray(apply_fir(x, k))
        assert np.max(np.abs(new - ref)) / np.max(np.abs(ref)) < 2e-5

    @pytest.mark.parametrize("T", [250, 251])
    def test_hilbert_matches_fft(self, monkeypatch, T):
        from syncopy_tpu.ops.filtering import hilbert
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((T, 2)).astype("f4"))
        monkeypatch.setenv("SPY_TPU_FILTER_GEMM", "0")
        ref = np.asarray(hilbert(x))
        monkeypatch.setenv("SPY_TPU_FILTER_GEMM", "1")
        new = np.asarray(hilbert(x))
        assert np.max(np.abs(new - ref)) / np.max(np.abs(ref)) < 2e-5

    def test_preprocessing_frontend_parity(self, monkeypatch):
        rng = np.random.default_rng(4)
        trls = [rng.standard_normal((400, 3)).astype("f4") for _ in range(3)]
        data = spy.AnalogData(data=trls, samplerate=1000.0)
        monkeypatch.setenv("SPY_TPU_FILTER_GEMM", "0")
        ref = spy.preprocessing(data, filter_class="firws", filter_type="bp",
                                freq=[20, 60], order=200, hilbert="abs")
        monkeypatch.setenv("SPY_TPU_FILTER_GEMM", "1")
        new = spy.preprocessing(data, filter_class="firws", filter_type="bp",
                                freq=[20, 60], order=200, hilbert="abs")
        ra, rb = np.asarray(new.data), np.asarray(ref.data)
        assert np.max(np.abs(ra - rb)) / np.max(np.abs(rb)) < 2e-5
