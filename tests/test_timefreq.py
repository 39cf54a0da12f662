# -*- coding: utf-8 -*-
# Time-frequency method tests: mtmconvol/wavelet/superlet/welch + summary
# statistics (modeled on reference tests/backend/test_timefreq.py,
# test_specest.py, test_welch.py, test_statistics.py).

import numpy as np
import pytest

import syncopy_tpu as spy


def chirp_signal(nTrials=3, nSamples=1000, samplerate=500.0, f0=10, f1=60, nChannels=2):
    t = np.arange(nSamples) / samplerate
    inst_f = f0 + (f1 - f0) * t / t[-1]
    phase = 2 * np.pi * np.cumsum(inst_f) / samplerate
    sig = np.cos(phase).astype("f4")
    trls = [np.column_stack([sig] * nChannels) for _ in range(nTrials)]
    return spy.AnalogData(data=trls, samplerate=samplerate)


class TestMtmconvol:
    def test_chirp_tracking(self):
        data = chirp_signal()
        tf = spy.freqanalysis(data, method="mtmconvol", t_ftimwin=0.25, toi=0.5, taper="hann")
        arr = np.asarray(tf.data)
        n_time = arr.shape[0] // 3  # per trial
        # instantaneous peak frequency should increase over the trial
        peaks = tf.freq[np.argmax(arr[:n_time, 0, :, 0], axis=1)]
        interior = peaks[2:-2]
        assert interior[-1] > interior[0]
        assert np.all(np.diff(interior) >= -4.1)  # monotone up to bin width

    def test_output_geometry_percent(self):
        data = chirp_signal(nSamples=1000, samplerate=500.0)
        tf = spy.freqanalysis(data, method="mtmconvol", t_ftimwin=0.2, toi=0.5, taper="hann")
        # nperseg=100, hop=50 -> 20 windows/trial, new samplerate = 10 Hz
        assert tf.data.shape[0] == 60
        assert tf.samplerate == pytest.approx(10.0)

    def test_toi_all(self):
        data = chirp_signal(nTrials=2, nSamples=500)
        tf = spy.freqanalysis(data, method="mtmconvol", t_ftimwin=0.2, toi="all", taper="hann")
        assert tf.data.shape[0] == 1000
        assert tf.samplerate == data.samplerate

    def test_toi_array(self):
        data = chirp_signal(nTrials=2, nSamples=1000, samplerate=500.0)
        toi = np.linspace(0.2, 1.8, 9)
        tf = spy.freqanalysis(data, method="mtmconvol", t_ftimwin=0.2, toi=toi, taper="hann")
        assert tf.data.shape[0] == 18
        assert np.asarray(tf.time[0])[0] == pytest.approx(0.2, abs=1e-6)

    def test_multitaper(self):
        data = chirp_signal(nTrials=2)
        tf = spy.freqanalysis(
            data, method="mtmconvol", t_ftimwin=0.4, toi=0.5, tapsmofrq=10,
            keeptapers=True, output="pow",
        )
        assert tf.data.shape[1] > 1

    def test_vs_scipy_stft(self):
        """Power of hann mtmconvol matches scipy.signal.stft-based estimate."""
        from scipy.signal import stft as sp_stft

        rng = np.random.default_rng(0)
        sig = rng.normal(size=1024).astype("f4")
        data = spy.AnalogData(data=sig[:, None], samplerate=1000.0)
        nperseg = 128
        tf = spy.freqanalysis(
            data, method="mtmconvol", t_ftimwin=nperseg / 1000.0, toi=0.5,
            taper="hann", output="pow", polyremoval=None,
        )
        f, t, Z = sp_stft(
            sig, fs=1000.0, window="hann", nperseg=nperseg, noverlap=nperseg // 2,
            boundary="zeros", padded=True, detrend=False,
        )
        # reference norm: |ftr|^2 * (4/3) * 2 / relative to scipy 'spectrum'...
        # compare shapes + peak positions only (norms differ by a known factor)
        got = np.asarray(tf.data)[:, 0, :, 0]
        # scipy windows are 'sym=False' equivalents; compare the time-freq
        # energy landscape via correlation
        ref = (np.abs(Z) ** 2).T[: got.shape[0]]
        gotn = got[: ref.shape[0]]
        corr = np.corrcoef(ref.ravel(), gotn.ravel())[0, 1]
        assert corr > 0.99


class TestWavelet:
    def test_harmonic_peak(self):
        data = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=2, nSamples=1000, nChannels=2)
        wl = spy.freqanalysis(data, method="wavelet", foi=np.arange(10, 60, 2))
        arr = np.asarray(wl.data)
        assert wl.freq[np.argmax(arr[500, 0, :, 0])] == pytest.approx(30, abs=2)

    def test_optimal_scales(self):
        data = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=1, nSamples=1000, nChannels=1)
        wl = spy.freqanalysis(data, method="wavelet")
        assert wl.freq.size > 5
        assert np.all(np.diff(wl.freq) > 0)  # low-to-high ordering

    def test_toi_array(self):
        data = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=2, nSamples=1000, nChannels=1)
        toi = np.linspace(0.5, 1.5, 11)
        wl = spy.freqanalysis(data, method="wavelet", foi=[20, 30, 40], toi=toi)
        assert wl.data.shape[0] == 22

    def test_paul_dog(self):
        data = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=1, nSamples=500, nChannels=1)
        for wv in ("Paul", "DOG"):
            wl = spy.freqanalysis(data, method="wavelet", wavelet=wv, foi=np.arange(10, 60, 5))
            arr = np.asarray(wl.data)
            assert wl.freq[np.argmax(arr[250, 0, :, 0])] == pytest.approx(30, abs=6)


class TestSuperlet:
    def test_harmonic_peak_sharper_than_wavelet(self):
        data = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=1, nSamples=1000, nChannels=1)
        foi = np.arange(10, 60, 2.0)
        sl = spy.freqanalysis(data, method="superlet", foi=foi, order_max=20, c_1=3, adaptive=False)
        arr = np.asarray(sl.data)[500, 0, :, 0]
        assert foi[np.argmax(arr)] == pytest.approx(30, abs=2)

    def test_adaptive(self):
        data = spy.synthdata.harmonic(freq=40, samplerate=500, nTrials=1, nSamples=800, nChannels=1)
        sl = spy.freqanalysis(
            data, method="superlet", foi=np.arange(10, 80, 5.0), order_max=10, adaptive=True
        )
        arr = np.asarray(sl.data)[400, 0, :, 0]
        assert sl.freq[np.argmax(arr)] == pytest.approx(40, abs=5)


class TestScaleBuckets:
    """Per-scale FFT-length bucketing (ops/wavelet.py): wide scale ranges
    split into multiple padded lengths; every scale row must equal the
    single-scale computation (which is trivially one bucket)."""

    def test_cwt_bucketed_rows_match_single_scale(self):
        import jax.numpy as jnp

        from syncopy_tpu.ops.fft import preferred_fft_len
        from syncopy_tpu.ops.wavelet import Morlet, cwt

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(400, 3)).astype(np.float32))
        dt = 1 / 500.0
        # frequencies 5..100 Hz: supports span ~20x -> multiple buckets
        scales = Morlet().scale_from_period(1.0 / np.array([5.0, 12.0, 30.0, 80.0]))
        Ls = {preferred_fft_len(400 + int(np.ceil(10 * s / dt)) + 1) for s in scales}
        assert len(Ls) > 1, "expected a multi-bucket scale set"
        full = np.asarray(cwt(x, Morlet(), scales, dt))
        for i, s in enumerate(scales):
            one = np.asarray(cwt(x, Morlet(), np.array([s]), dt))[0]
            assert np.abs(full[i] - one).max() <= 1e-6 * np.abs(one).max()

    def test_bucket_merge_cap(self):
        from syncopy_tpu.ops.wavelet import _scale_buckets

        Ls = [512, 640, 768, 1024, 1536, 2048, 3072, 4096]
        items = _scale_buckets(Ls, max_buckets=4)
        assert len(items) == 4
        # every index lands in a bucket with L >= its own requirement
        for L_b, idx in items:
            assert all(Ls[i] <= L_b for i in idx)
        # all indices present exactly once
        got = sorted(i for _, idx in items for i in idx)
        assert got == list(range(len(Ls)))
        # a small set stays untouched
        assert _scale_buckets([1024, 2048]) == [(1024, [0]), (2048, [1])]

    def test_superlet_bucketed_rows_match_single_scale(self):
        import jax.numpy as jnp

        from syncopy_tpu.ops.wavelet import superlet

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(400, 2)).astype(np.float32))
        dt = 1 / 500.0
        foi = np.array([5.0, 15.0, 40.0, 90.0])
        scales = (1.0 / foi) / (2 * np.pi)
        full = np.asarray(superlet(x, scales, order_max=4, dt=dt,
                                   magnitude_only=True))
        for i, s in enumerate(scales):
            one = np.asarray(superlet(x, np.array([s]), order_max=4, dt=dt,
                                      magnitude_only=True))[0]
            assert np.abs(full[i] - one).max() <= 1e-5 * np.abs(one).max()


class TestWelch:
    def test_basic(self):
        data = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=4, nSamples=1000, nChannels=2)
        res = spy.freqanalysis(data, method="welch", t_ftimwin=0.25, toi=0.5)
        assert res.data.shape[0] == 4  # one spectral estimate per trial
        assert res.data.shape[1] == 1
        arr = np.asarray(res.data)
        assert res.freq[np.argmax(arr[0, 0, :, 0])] == pytest.approx(30, abs=4.1)

    def test_variance_reduction(self):
        """Welch averaging reduces spectral variance vs raw periodogram."""
        data = spy.synthdata.white_noise(nTrials=6, nSamples=2000, nChannels=1, seed=0)
        raw = spy.freqanalysis(data, method="mtmfft", taper="hann")
        wel = spy.freqanalysis(data, method="welch", t_ftimwin=0.25, toi=0.5)
        raw_cv = np.std(np.asarray(raw.data)) / np.mean(np.asarray(raw.data))
        wel_cv = np.std(np.asarray(wel.data)) / np.mean(np.asarray(wel.data))
        assert wel_cv < raw_cv / 1.5

    def test_welch_rejects_bad_toi(self):
        data = spy.synthdata.white_noise(nTrials=2, nSamples=500, nChannels=1, seed=0)
        with pytest.raises(spy.SPYValueError):
            spy.freqanalysis(data, method="welch", t_ftimwin=0.25, toi="all")

    def test_welch_rejects_fourier_output(self):
        data = spy.synthdata.white_noise(nTrials=2, nSamples=500, nChannels=1, seed=0)
        with pytest.raises(spy.SPYValueError):
            spy.freqanalysis(data, method="welch", t_ftimwin=0.25, toi=0.5, output="fourier")

    def test_welch_multitaper(self):
        data = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=3, nSamples=1000, nChannels=1)
        res = spy.freqanalysis(data, method="welch", t_ftimwin=0.5, toi=0.5, tapsmofrq=6)
        arr = np.asarray(res.data)
        assert res.freq[np.argmax(arr[0, 0, :, 0])] == pytest.approx(30, abs=6)

    def test_welch_keeptrials_false(self):
        data = spy.synthdata.white_noise(nTrials=4, nSamples=1000, nChannels=2, seed=1)
        res = spy.freqanalysis(data, method="welch", t_ftimwin=0.25, toi=0.5, keeptrials=False)
        assert res.data.shape[0] == 1


class TestSummaryStats:
    def test_mean_channel(self, adata_equal):
        res = spy.mean(adata_equal, dim="channel")
        assert res.data.shape[1] == 1
        expected = np.asarray(adata_equal.data).mean(axis=1, keepdims=True)
        assert np.allclose(np.asarray(res.data), expected, atol=1e-6)

    def test_mean_trials(self, adata_equal):
        res = spy.mean(adata_equal, dim="trials")
        assert len(res.trials) == 1
        expected = np.stack([np.asarray(t) for t in adata_equal.trials]).mean(axis=0)
        assert np.allclose(np.asarray(res.data), expected, atol=1e-6)

    def test_var_std(self, adata_equal):
        v = spy.var(adata_equal, dim="trials")
        s = spy.std(adata_equal, dim="trials")
        assert np.allclose(np.asarray(s.data) ** 2, np.asarray(v.data), atol=1e-5)

    def test_median_dim(self, adata_equal):
        res = spy.median(adata_equal, dim="channel")
        expected = np.median(np.asarray(adata_equal.data), axis=1, keepdims=True)
        assert np.allclose(np.asarray(res.data), expected, atol=1e-6)

    def test_itc(self):
        # phase-locked harmonic -> ITC ~ 1 at the harmonic frequency
        data = spy.synthdata.harmonic(freq=40, samplerate=1000, nTrials=10, nSamples=1000, nChannels=1)
        spec = spy.freqanalysis(data, method="mtmfft", taper="hann", output="fourier")
        res = spy.itc(spec)
        arr = np.asarray(res.data)
        f40 = np.argmin(np.abs(res.freq - 40))
        assert arr[0, 0, f40, 0] == pytest.approx(1.0, abs=1e-3)

    def test_itc_random_low(self):
        data = spy.synthdata.white_noise(nTrials=50, nSamples=500, nChannels=1, seed=0)
        spec = spy.freqanalysis(data, method="mtmfft", taper="hann", output="fourier")
        res = spy.itc(spec)
        arr = np.asarray(res.data)
        assert np.mean(arr) < 0.35

    def test_itc_rejects_real(self, adata_equal):
        spec = spy.freqanalysis(adata_equal, method="mtmfft", taper="hann", output="pow")
        with pytest.raises(spy.SPYValueError):
            spy.itc(spec)

    def test_selection_stats(self, adata_equal):
        res = spy.mean(adata_equal, dim="trials", select={"trials": [0, 1]})
        expected = np.stack([np.asarray(adata_equal.trials[k]) for k in (0, 1)]).mean(axis=0)
        assert np.allclose(np.asarray(res.data), expected, atol=1e-6)


class TestTimeFreqITC:
    def test_itc_over_tf_spectra(self):
        data = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=8, nSamples=500, nChannels=1)
        tf = spy.freqanalysis(
            data, method="mtmconvol", t_ftimwin=0.2, toi=0.5, taper="hann", output="fourier"
        )
        res = spy.itc(tf)
        arr = np.asarray(res.data)
        f30 = np.argmin(np.abs(res.freq - 30))
        # phase-locked harmonic: ITC ~ 1 at 30 Hz in interior windows
        assert arr[2, 0, f30, 0] > 0.99
        assert arr.shape[0] == np.asarray(tf.trials[0]).shape[0]


class TestRaggedConnectivity:
    def test_coherence_with_ragged_trials(self):
        rng = np.random.default_rng(5)
        trls = [rng.normal(size=(n, 2)).astype("f4") for n in (400, 500, 450, 500, 400, 450)]
        ad = spy.AnalogData(data=trls, samplerate=1000)
        coh = spy.connectivityanalysis(ad, method="coh", tapsmofrq=5)
        arr = np.asarray(coh.data)
        # padding to maxperlen unifies the frequency grid
        assert arr.shape[1] == 251
        assert np.allclose(arr[0, :, 0, 0], 1.0, atol=1e-4)


class TestNonPow2TrialCount:
    def test_wavelet_aux_padding(self):
        """Chunk zero-padding must pad per-trial aux inputs too (regression:
        61 trials -> 64-trial chunk crashed vmap on the toi gather indices)."""
        d = spy.synthdata.white_noise(nTrials=61, nSamples=300, nChannels=2, seed=12)
        toi = np.linspace(0.05, 0.25, 9)
        tfr = spy.freqanalysis(d, method="wavelet", foi=[15, 30, 60], toi=toi)
        assert tfr.data.shape == (61 * 9, 1, 3, 2)
        # last trial's values identical to a small-batch run of the same trial
        solo = spy.freqanalysis(d, method="wavelet", foi=[15, 30, 60], toi=toi,
                                select={"trials": [60]})
        assert np.allclose(np.asarray(tfr.trials[60]), np.asarray(solo.data), atol=1e-5)


class TestWaveletAliases:
    def test_marr_mexican_hat(self):
        """'Marr' and 'Mexican_hat' alias the 2nd-order DOG (reference
        freqanalysis.py:55)."""
        d = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=2, nSamples=400, nChannels=1)
        base = spy.freqanalysis(d, method="wavelet", wavelet="Ricker", foi=[10, 30], toi="all", output="real")
        for alias in ("Marr", "Mexican_hat"):
            got = spy.freqanalysis(d, method="wavelet", wavelet=alias, foi=[10, 30], toi="all", output="real")
            assert np.allclose(np.asarray(got.data), np.asarray(base.data))


class TestTFRMatrix:
    """Time-frequency option matrix: toi forms, output flavors, foi grids
    (reference test_specest.py TF sections)."""

    @pytest.fixture()
    def chirpy(self):
        # 20 Hz for the first half, 60 Hz for the second
        t = np.arange(1000) / 1000.0
        sig = np.where(t < 0.5, np.sin(2 * np.pi * 20 * t), np.sin(2 * np.pi * 60 * t))
        arr = np.tile(sig[:, None], (3, 2)).astype("f4")
        trl = np.column_stack([np.arange(0, 3000, 1000), np.arange(1000, 3001, 1000),
                               np.zeros(3)])
        return spy.AnalogData(data=arr, samplerate=1000.0, trialdefinition=trl)

    def test_mtmconvol_resolves_chirp(self, chirpy):
        tf = spy.freqanalysis(chirpy, method="mtmconvol", t_ftimwin=0.25,
                              toi="all", taper="hann")
        arr = np.asarray(tf.data)[:1000, 0]  # (time, freq, chan) trial 0
        freqs = np.asarray(tf.freq)
        early = arr[100:350].mean(axis=0)[:, 0]
        late = arr[650:900].mean(axis=0)[:, 0]
        assert abs(freqs[early.argmax()] - 20) <= 6
        assert abs(freqs[late.argmax()] - 60) <= 6

    def test_toi_array_subset(self, chirpy):
        toi = np.array([0.2, 0.5, 0.8])
        tf = spy.freqanalysis(chirpy, method="mtmconvol", t_ftimwin=0.2,
                              toi=toi, taper="hann")
        # three window centers per trial
        assert tf.data.shape[0] == 3 * len(chirpy.trials)
        assert tf.samplerate == pytest.approx(1.0 / 0.3, rel=1e-6)

    def test_toi_overlap_fraction(self, chirpy):
        tf = spy.freqanalysis(chirpy, method="mtmconvol", t_ftimwin=0.2,
                              toi=0.5, taper="hann")
        # hop = nperseg/2 = 100 samples -> 10 windows per 1000-sample trial
        assert tf.data.shape[0] == 10 * len(chirpy.trials)

    def test_wavelet_output_flavors(self, chirpy):
        foi = np.array([15.0, 20.0, 60.0, 80.0])
        four = spy.freqanalysis(chirpy, method="wavelet", foi=foi,
                                output="fourier", keeptrials=True)
        powd = spy.freqanalysis(chirpy, method="wavelet", foi=foi,
                                output="pow", keeptrials=True)
        assert np.allclose(np.abs(np.asarray(four.data)) ** 2,
                           np.asarray(powd.data), rtol=1e-4, atol=1e-6)

    def test_wavelet_resolves_chirp(self, chirpy):
        foi = np.linspace(10, 90, 17)
        tf = spy.freqanalysis(chirpy, method="wavelet", foi=foi, output="pow")
        arr = np.asarray(tf.data)[:1000, 0, :, 0]
        assert abs(foi[arr[150:350].mean(axis=0).argmax()] - 20) <= 5
        assert abs(foi[arr[650:850].mean(axis=0).argmax()] - 60) <= 5

    def test_superlet_sharper_than_wavelet(self, chirpy):
        foi = np.linspace(10, 90, 33)
        wl = spy.freqanalysis(chirpy, method="wavelet", foi=foi, output="pow")
        sl = spy.freqanalysis(chirpy, method="superlet", foi=foi,
                              order_max=10, output="pow")

        def bandwidth(tf):
            arr = np.asarray(tf.data)[650:850, 0, :, 0].mean(axis=0)
            half = arr > arr.max() / 2
            return foi[half].max() - foi[half].min()

        assert bandwidth(sl) <= bandwidth(wl) + 1e-9

    def test_wavelet_families_run(self, chirpy):
        for wav in ("Morlet", "Paul", "DOG", "Ricker"):
            out = "pow" if wav in ("Morlet", "Paul") else "real"
            tf = spy.freqanalysis(chirpy, method="wavelet", wavelet=wav,
                                  foi=np.array([10.0, 40.0]), output=out,
                                  select={"trials": [0]})
            assert np.isfinite(np.asarray(tf.data)).all()


class TestResamplingMatrix:
    """Down/resampling behaviors vs scipy (reference test_resampledata)."""

    @pytest.fixture()
    def tone(self):
        t = np.arange(4000) / 1000.0
        sig = np.sin(2 * np.pi * 25 * t)[:, None].astype("f4")
        trl = np.column_stack([np.arange(0, 4000, 1000),
                               np.arange(1000, 4001, 1000), np.zeros(4)])
        return spy.AnalogData(data=np.tile(sig, (1, 2)), samplerate=1000.0,
                              trialdefinition=trl)

    def test_downsample_preserves_tone(self, tone):
        ds = spy.resampledata(tone, resamplefs=250.0, method="downsample")
        assert ds.samplerate == 250.0
        spec = spy.freqanalysis(ds, method="mtmfft", taper="hann")
        p = np.asarray(spec.data)[0, 0, :, 0]
        assert abs(spec.freq[p.argmax()] - 25) < 2

    def test_resample_non_integer_factor(self, tone):
        rs = spy.resampledata(tone, resamplefs=400.0, method="resample")
        assert rs.samplerate == 400.0
        assert abs(rs.data.shape[0] - 4 * 400) <= 4
        spec = spy.freqanalysis(rs, method="mtmfft", taper="hann")
        p = np.asarray(spec.data)[0, 0, :, 0]
        assert abs(spec.freq[p.argmax()] - 25) < 2

    def test_trialdefinition_rescaled(self, tone):
        ds = spy.resampledata(tone, resamplefs=500.0, method="downsample")
        trl = ds.trialdefinition
        assert np.allclose(trl[:, 1] - trl[:, 0], 500)

    def test_downsample_rejects_noninteger_factor(self, tone):
        with pytest.raises(spy.SPYValueError):
            spy.resampledata(tone, resamplefs=333.0, method="downsample")


class TestCfgReplayMatrix:
    """Every frontend's out.cfg must replay to identical results
    (reference test_cfg.py)."""

    @pytest.fixture()
    def ad(self):
        return spy.synthdata.ar2_network(nTrials=12, samplerate=200,
                                         nSamples=400, seed=31)

    @pytest.mark.parametrize("call", [
        lambda d: spy.freqanalysis(d, method="mtmfft", tapsmofrq=3,
                                   foilim=[5, 80], keeptrials=False),
        lambda d: spy.freqanalysis(d, method="welch", t_ftimwin=0.25, toi=0.0),
        lambda d: spy.connectivityanalysis(d, method="coh", tapsmofrq=3,
                                           output="imag"),
        lambda d: spy.preprocessing(d, filter_class="but", filter_type="bp",
                                    freq=[8, 30], order=6),
        lambda d: spy.resampledata(d, resamplefs=100.0, method="downsample"),
    ])
    def test_replay(self, ad, call):
        res = call(ad)
        fe_name = [k for k in res.cfg if k in
                   ("freqanalysis", "connectivityanalysis", "preprocessing",
                    "resampledata")][-1]
        frontend = getattr(spy, fe_name)
        replay = frontend(ad, res.cfg)
        assert np.allclose(np.asarray(res.data), np.asarray(replay.data),
                           atol=1e-6)


class TestUnevenToi:
    """True non-equidistant `toi`: spectra are computed at the EXACT
    requested window centers and the output's time axis equals the request
    (the reference warns and falls back to a misrepresenting 1 Hz axis,
    reference compRoutines.py:864-874)."""

    def _make(self, nTrials=2):
        return spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=nTrials,
                                      nSamples=1000, nChannels=2)

    def test_uneven_toi_time_axis_equals_request(self):
        import warnings

        d = self._make()
        toi = np.array([0.3, 0.35, 0.9, 1.5])
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            tf = spy.freqanalysis(d, method="mtmconvol", t_ftimwin=0.2,
                                  toi=toi, taper="hann")
        assert not any("unevenly spaced" in str(w.message) for w in rec)
        assert tf.data.shape[0] == 2 * toi.size
        arr = np.asarray(tf.data)
        assert np.isfinite(arr).all()
        # the time axis IS the request, for every trial
        for k in range(len(tf.trials)):
            assert np.array_equal(tf.time[k], toi)
        assert np.array_equal(tf.irregular_time, toi)
        # the spectral content is correct per window
        assert tf.freq[np.argmax(arr[0, 0, :, 0])] == pytest.approx(30, abs=3)

    def test_uneven_toi_values_match_dense_grid(self):
        """The spectrum at an uneven toi point equals the same window of a
        toi='all' run (same centers, same geometry)."""
        d = self._make(nTrials=1)
        toi = np.array([0.3, 0.35, 0.9, 1.5])
        tf = spy.freqanalysis(d, method="mtmconvol", t_ftimwin=0.2,
                              toi=toi, taper="hann", output="fourier")
        dense = spy.freqanalysis(d, method="mtmconvol", t_ftimwin=0.2,
                                 toi="all", taper="hann", output="fourier")
        samples = np.round(toi * 500.0).astype(int)
        got = np.asarray(tf.data)
        ref = np.asarray(dense.data)[samples]
        assert np.allclose(got, ref, atol=1e-6)

    def test_uneven_toi_saveload_roundtrip(self, tmp_path):
        d = self._make()
        toi = np.array([0.3, 0.35, 0.9])
        tf = spy.freqanalysis(d, method="mtmconvol", t_ftimwin=0.2,
                              toi=toi, taper="hann")
        container = str(tmp_path / "uneven")
        spy.save(tf, container=container)
        loaded = spy.load(container + ".spy")
        assert np.array_equal(loaded.irregular_time, toi)
        assert np.array_equal(loaded.time[0], toi)
        assert loaded == tf

    def test_uneven_toi_latency_selection(self):
        """latency selections on an irregular axis use the EXACT points."""
        d = self._make()
        toi = np.array([0.3, 0.35, 0.9, 1.5])
        tf = spy.freqanalysis(d, method="mtmconvol", t_ftimwin=0.2,
                              toi=toi, taper="hann")
        sub = tf.selectdata(latency=[0.34, 1.0])
        assert np.array_equal(sub.irregular_time, np.array([0.35, 0.9]))
        assert np.array_equal(sub.time[0], np.array([0.35, 0.9]))
        assert sub.data.shape[0] == 2 * 2
        full = np.asarray(tf.data).reshape(2, toi.size, *tf.data.shape[1:])
        got = np.asarray(sub.data).reshape(2, 2, *sub.data.shape[1:])
        assert np.allclose(got, full[:, 1:3], atol=0)

    def test_uneven_toi_wavelet(self):
        d = self._make(nTrials=1)
        toi = np.array([0.25, 0.3, 1.1])
        tf = spy.freqanalysis(d, method="wavelet", toi=toi,
                              foi=np.arange(10, 60, 10.0))
        assert np.array_equal(tf.time[0], toi)

    def test_even_toi_sets_rate(self):
        d = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=1,
                                   nSamples=1000, nChannels=1)
        toi = np.arange(0.2, 1.8, 0.2)
        tf = spy.freqanalysis(d, method="mtmconvol", t_ftimwin=0.2,
                              toi=toi, taper="hann")
        assert tf.samplerate == pytest.approx(5.0)
        assert np.allclose(tf.time[0], toi)
        assert tf.irregular_time is None  # uniform axes stay uniform

    def test_single_toi_point(self):
        d = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=1,
                                   nSamples=1000, nChannels=1)
        tf = spy.freqanalysis(d, method="mtmconvol", t_ftimwin=0.2,
                              toi=np.array([0.5]), taper="hann")
        assert tf.data.shape[0] == 1
        assert tf.irregular_time is None


class TestIrregularLatencyCoverage:
    def test_window_beyond_nominal_rate_accepted(self):
        """Latency windows must be validated against the EXACT irregular
        points, not the nominal 1 Hz bookkeeping rate."""
        d = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=1,
                                   nSamples=12000, nChannels=1)
        toi = np.array([0.5, 0.6, 5.0, 20.0])
        tf = spy.freqanalysis(d, method="mtmconvol", t_ftimwin=0.2,
                              toi=toi, taper="hann")
        # nominal 1 Hz axis spans [0.5, 3.5]; the real points reach 20 s
        sub = tf.selectdata(latency=[4.0, 20.0])
        assert np.array_equal(sub.irregular_time, [5.0, 20.0])
        assert sub.data.shape[0] == 2

    def test_shorthand_latency_on_irregular_axis(self):
        """'maxperiod'/'poststim' shorthands resolve from the EXACT
        irregular points, not the nominal 1 Hz rate."""
        d = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=1,
                                   nSamples=12000, nChannels=1)
        toi = np.array([0.5, 0.6, 5.0, 20.0])
        tf = spy.freqanalysis(d, method="mtmconvol", t_ftimwin=0.2,
                              toi=toi, taper="hann")
        full = tf.selectdata(latency="maxperiod")
        assert full.data.shape[0] == toi.size  # nothing silently dropped
        assert np.array_equal(full.irregular_time, toi)

    def test_plot_with_string_latency_on_irregular_axis(self):
        pytest.importorskip("matplotlib")
        d = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=1,
                                   nSamples=12000, nChannels=1)
        toi = np.array([0.5, 0.6, 5.0, 20.0])
        tf = spy.freqanalysis(d, method="mtmconvol", t_ftimwin=0.2,
                              toi=toi, taper="hann")
        fig, ax = spy.singlepanelplot(tf, latency="all")
        assert ax.get_images()
        import matplotlib.pyplot as plt

        plt.close(fig)


class TestIrregularTrialsTF:
    """TF methods over unequal-length trials with nonzero offsets
    (reference test_specest.py::test_tf/wav/slet_irregular_trials): each
    trial's output must equal the same method applied to that trial alone,
    and the per-trial time axes must carry the offsets."""

    @pytest.fixture(scope="class")
    def ragged(self):
        rng = np.random.default_rng(3)
        lens = (300, 420, 360)
        trls = [rng.normal(size=(n, 2)).astype("f4") for n in lens]
        d = spy.AnalogData(data=trls, samplerate=500.0)
        trl = np.asarray(d.trialdefinition)
        trl[:, 2] = [-50, 0, 25]  # sample offsets
        d.trialdefinition = trl
        return d

    def _single_trial_oracle(self, ragged, k, **kw):
        arr = np.asarray(ragged.trials[k])
        solo = spy.AnalogData(data=[arr], samplerate=ragged.samplerate)
        trl = np.asarray(solo.trialdefinition)
        trl[0, 2] = np.asarray(ragged.trialdefinition)[k, 2]
        solo.trialdefinition = trl
        return spy.freqanalysis(solo, **kw)

    @pytest.mark.parametrize("kw", [
        # pad pinned so the solo oracle shares the multi-trial object's
        # common frequency axis (default pad='maxperiod' spans ALL trials)
        dict(method="mtmfft", taper="hann", output="pow", pad=0.84),
        dict(method="mtmconvol", t_ftimwin=0.1, toi=0.5, taper="hann",
             output="pow"),
        dict(method="wavelet", foi=np.arange(10, 60, 10.0), output="pow"),
        dict(method="superlet", foi=np.arange(10, 60, 10.0), order_max=4,
             output="pow"),
    ], ids=["mtmfft", "mtmconvol", "wavelet", "superlet"])
    def test_per_trial_equals_solo(self, ragged, kw):
        out = spy.freqanalysis(ragged, keeptrials=True, **kw)
        assert len(out.trials) == len(ragged.trials)
        for k in range(len(ragged.trials)):
            solo = self._single_trial_oracle(ragged, k, keeptrials=True, **kw)
            got = np.asarray(out.trials[k])
            want = np.asarray(solo.trials[0])
            assert got.shape == want.shape, (k, got.shape, want.shape)
            denom = np.abs(want).max() or 1.0
            assert np.abs(got - want).max() / denom < 2e-5, k
            # offsets propagate into the per-trial time axis
            np.testing.assert_allclose(out.time[k], solo.time[0], atol=1e-9)

    def test_offsets_in_time_axis(self, ragged):
        out = spy.freqanalysis(ragged, method="wavelet",
                               foi=np.arange(10, 60, 10.0), keeptrials=True)
        offs = np.asarray(ragged.trialdefinition)[:, 2]
        for k, off in enumerate(offs):
            assert abs(out.time[k][0] - off / ragged.samplerate) < 1e-9
