# -*- coding: utf-8 -*-
# Spectral-estimation tests: kernel vs independent numpy/scipy reference
# computation + frontend integration (modeled on reference
# tests/backend/test_timefreq.py and tests/test_specest.py).

import numpy as np
import pytest
from scipy.signal import windows as sp_windows

import syncopy_tpu as spy


def np_mtmfft(data, samplerate, taper="hann", taper_opt=None, nfft=None):
    """Independent numpy implementation of the reference mtmfft math
    (reference specest/mtmfft.py:16-129) used as test oracle."""
    signal_length = data.shape[0]
    if nfft is None:
        nfft = signal_length
    win_fn = getattr(sp_windows, taper or "boxcar")
    wins = np.atleast_2d(win_fn(signal_length, **(taper_opt or {})))
    if (taper or "boxcar") == "dpss":
        wins = wins * np.sqrt(nfft)
    elif (taper or "boxcar") == "boxcar":
        wins = wins * np.sqrt(nfft / wins.sum())
    else:
        wins = wins * np.sqrt(4 / 3) * np.sqrt(nfft / wins.sum())
    ftr = np.zeros((wins.shape[0], nfft // 2 + 1, data.shape[1]), dtype="complex64")
    for k, win in enumerate(wins):
        tapered = win[:, None] * data
        ftr[k] = np.fft.rfft(tapered, n=nfft, axis=0)
        n_eff = signal_length * np.sqrt(nfft / signal_length)
        ftr[k] *= np.sqrt(2) / n_eff
    return ftr, np.fft.rfftfreq(nfft, 1 / samplerate)


class TestMtmfftKernel:
    def test_vs_numpy_oracle(self):
        rng = np.random.default_rng(0)
        data = rng.normal(size=(1000, 4)).astype("f4")
        ref, freqs = np_mtmfft(data, 1000.0, taper="hann")

        from syncopy_tpu.ops.spectral import mtmfft as jax_mtmfft
        from syncopy_tpu.ops.windows import make_tapers

        tapers = make_tapers("hann", None, 1000, 1000, 1000.0)
        got = np.asarray(jax_mtmfft(data, tapers, 1000))
        assert np.allclose(got, ref, atol=1e-5)

    def test_padding_invariance(self):
        """Power of an unpadded vs zero-padded harmonic stays comparable
        (the padding-invariant normalization, reference mtmfft.py:119-128)."""
        t = np.arange(1000) / 1000.0
        sig = np.cos(2 * np.pi * 50 * t)[:, None].astype("f4")

        from syncopy_tpu.ops.spectral import mtmfft as jax_mtmfft
        from syncopy_tpu.ops.windows import make_tapers

        tapers = make_tapers("hann", None, 1000, 1000, 1000.0)
        pow_nopad = np.abs(np.asarray(jax_mtmfft(sig, tapers, 1000))) ** 2
        tapers_pad = make_tapers("hann", None, 1000, 2000, 1000.0)
        pow_pad = np.abs(np.asarray(jax_mtmfft(sig, tapers_pad, 2000))) ** 2
        # per-bin (peak) power conserved under padding
        assert pow_pad.max() == pytest.approx(pow_nopad.max(), rel=0.05)

    def test_dpss_tapers(self):
        from syncopy_tpu.ops.windows import make_tapers

        tapers = make_tapers("dpss", {"NW": 2, "Kmax": 3}, 500, 500, 1000.0)
        assert tapers.shape == (3, 500)
        # dpss windows are orthonormal before normalization
        raw = sp_windows.dpss(500, 2, 3)
        assert np.allclose(raw @ raw.T, np.eye(3), atol=1e-6)


class TestFreqanalysisFrontend:
    def test_harmonic_peak(self):
        adata = spy.synthdata.harmonic(
            freq=40, samplerate=1000, nTrials=4, nSamples=1000, nChannels=2
        )
        spec = spy.freqanalysis(adata, method="mtmfft", taper="hann")
        assert spec.dimord == ["time", "taper", "freq", "channel"]
        assert spec.data.shape == (4, 1, 501, 2)
        power = np.asarray(spec.data)[0, 0, :, 0]
        assert spec.freq[np.argmax(power)] == pytest.approx(40.0)

    def test_output_flavors(self):
        adata = spy.synthdata.white_noise(nTrials=2, nSamples=500, nChannels=2, seed=0)
        four = spy.freqanalysis(adata, method="mtmfft", taper="hann", output="fourier")
        assert np.iscomplexobj(np.asarray(four.data))
        powd = spy.freqanalysis(adata, method="mtmfft", taper="hann", output="pow")
        assert np.allclose(
            np.abs(np.asarray(four.data)) ** 2, np.asarray(powd.data), atol=1e-5
        )

    def test_multitaper_smoothing(self):
        adata = spy.synthdata.harmonic(
            freq=100, samplerate=1000, nTrials=3, nSamples=1000, nChannels=1
        )
        spec = spy.freqanalysis(adata, tapsmofrq=5, keeptrials=False)
        power = np.asarray(spec.data)[0, 0, :, 0]
        # smoothing spreads the peak over ~2*tapsmofrq Hz
        halfpow_band = spec.freq[power > power.max() / 2]
        assert 4 <= halfpow_band.max() - halfpow_band.min() <= 14

    def test_keeptapers(self):
        adata = spy.synthdata.white_noise(nTrials=2, nSamples=500, nChannels=2, seed=1)
        spec = spy.freqanalysis(adata, tapsmofrq=4, keeptapers=True, output="fourier")
        assert spec.data.shape[1] > 1
        assert all(t == "dpss" for t in spec.taper)

    def test_foilim(self):
        adata = spy.synthdata.white_noise(nTrials=2, nSamples=1000, nChannels=2, seed=2)
        spec = spy.freqanalysis(adata, method="mtmfft", taper="hann", foilim=[10, 50])
        assert spec.freq[0] >= 10 and spec.freq[-1] <= 50
        assert spec.data.shape[2] == spec.freq.size

    def test_foi(self):
        adata = spy.synthdata.white_noise(nTrials=2, nSamples=1000, nChannels=2, seed=2)
        foi = [10, 20, 30, 40]
        spec = spy.freqanalysis(adata, method="mtmfft", taper="hann", foi=foi)
        assert np.allclose(spec.freq, foi)

    def test_keeptrials_false(self):
        adata = spy.synthdata.white_noise(nTrials=6, nSamples=500, nChannels=2, seed=3)
        single = spy.freqanalysis(adata, method="mtmfft", taper="hann")
        avg = spy.freqanalysis(adata, method="mtmfft", taper="hann", keeptrials=False)
        assert avg.data.shape[0] == 1
        assert np.allclose(
            np.asarray(avg.data)[0], np.asarray(single.data).mean(axis=0), atol=1e-6
        )

    def test_selection(self):
        adata = spy.synthdata.white_noise(nTrials=5, nSamples=500, nChannels=4, seed=4)
        spec = spy.freqanalysis(
            adata, method="mtmfft", taper="hann", select={"trials": [0, 2], "channel": [1, 3]}
        )
        assert spec.data.shape[0] == 2
        assert spec.data.shape[3] == 2
        assert list(spec.channel) == ["channel2", "channel4"]
        # selection is restored afterwards
        assert adata.selection is None

    def test_parallel_mesh(self, testmesh):
        adata = spy.synthdata.white_noise(nTrials=8, nSamples=512, nChannels=4, seed=5)
        seq = spy.freqanalysis(adata, method="mtmfft", taper="hann")
        with spy.use_mesh(testmesh):
            par = spy.freqanalysis(adata, method="mtmfft", taper="hann")
        assert np.allclose(np.asarray(seq.data), np.asarray(par.data), atol=1e-6)

    def test_polyremoval(self):
        adata = spy.synthdata.linear_trend(y_max=10, nTrials=2, nSamples=500, nChannels=1)
        spec0 = spy.freqanalysis(adata, method="mtmfft", taper=None, polyremoval=None)
        spec1 = spy.freqanalysis(adata, method="mtmfft", taper=None, polyremoval=1)
        # linear detrending kills the DC/low-freq dominance
        assert np.asarray(spec1.data)[0, 0, 0, 0] < np.asarray(spec0.data)[0, 0, 0, 0] / 100

    def test_cfg_replay(self):
        adata = spy.synthdata.white_noise(nTrials=3, nSamples=500, nChannels=2, seed=6)
        spec = spy.freqanalysis(adata, method="mtmfft", taper="hann", foilim=[5, 100])
        replay = spy.freqanalysis(adata, spec.cfg)
        assert np.allclose(np.asarray(spec.data), np.asarray(replay.data))

    def test_invalid_args(self):
        adata = spy.synthdata.white_noise(nTrials=2, nSamples=100, nChannels=2, seed=7)
        with pytest.raises(spy.SPYValueError):
            spy.freqanalysis(adata, method="nope")
        with pytest.raises(spy.SPYValueError):
            spy.freqanalysis(adata, method="mtmfft", output="nope")
        with pytest.raises(spy.SPYValueError):
            spy.freqanalysis(adata, method="mtmfft", foi=[10], foilim=[10, 20])


class TestOutParameter:
    def test_preallocated_out(self):
        adata = spy.synthdata.white_noise(nTrials=3, nSamples=400, nChannels=2, seed=10)
        out = spy.SpectralData(dimord=spy.SpectralData._defaultDimord)
        res = spy.freqanalysis(adata, method="mtmfft", taper="hann", out=out)
        assert res is out
        assert out.data.shape[0] == 3

    def test_out_wrong_class_rejected(self):
        adata = spy.synthdata.white_noise(nTrials=2, nSamples=200, nChannels=2, seed=11)
        with pytest.raises(spy.SPYValueError):
            spy.freqanalysis(adata, method="mtmfft", taper="hann", out=adata)


class TestWelchFused:
    def test_welch_equals_mtmconvol_plus_mean(self):
        """The on-device segment average matches the compositional
        definition welch = mtmconvol + mean(dim='time') exactly."""
        d = spy.synthdata.white_noise(nTrials=4, nSamples=800, nChannels=3, seed=13)
        w = spy.freqanalysis(d, method="welch", t_ftimwin=0.2, toi=0.5)
        conv = spy.freqanalysis(d, method="mtmconvol", t_ftimwin=0.2, toi=0.5,
                                taper="hann", output="pow", keeptapers=False)
        ref = spy.mean(conv, dim="time")
        assert w.data.shape == ref.data.shape
        assert w.samplerate == ref.samplerate
        assert np.allclose(np.asarray(w.data), np.asarray(ref.data), atol=1e-6)

    def test_welch_keeptrials_false(self):
        d = spy.synthdata.white_noise(nTrials=4, nSamples=800, nChannels=2, seed=14)
        w = spy.freqanalysis(d, method="welch", t_ftimwin=0.2, toi=0.5, keeptrials=False)
        wt = spy.freqanalysis(d, method="welch", t_ftimwin=0.2, toi=0.5)
        assert w.data.shape[0] == 1
        assert np.allclose(np.asarray(w.data)[0], np.asarray(wt.data).mean(axis=0), atol=1e-6)


class TestSpectralOptionMatrix:
    """pad x taper x output x keeptapers matrix against independent numpy
    oracles (reference test_specest.py parameter sweeps)."""

    @pytest.fixture()
    def ad(self):
        rng = np.random.default_rng(17)
        return spy.AnalogData(
            data=[rng.normal(size=(300, 2)).astype("f4") for _ in range(4)],
            samplerate=500.0,
        )

    @pytest.mark.parametrize("pad,expected_nfft", [
        ("maxperlen", 300), ("nextpow2", 512), (1.0, 500),
    ])
    def test_pad_options_set_grid(self, ad, pad, expected_nfft):
        spec = spy.freqanalysis(ad, method="mtmfft", taper="hann", pad=pad)
        assert len(spec.freq) == expected_nfft // 2 + 1
        assert spec.freq[-1] == pytest.approx(250.0)

    def test_pad_too_short_rejected(self, ad):
        with pytest.raises(spy.shared.errors.SPYValueError):
            spy.freqanalysis(ad, method="mtmfft", taper="hann", pad=0.1)

    @pytest.mark.parametrize("output,transform", [
        ("pow", lambda z: np.abs(z) ** 2),
        ("abs", np.abs),
        ("real", np.real),
        ("imag", np.imag),
        ("angle", np.angle),
    ])
    def test_output_flavors_match_fourier(self, ad, output, transform):
        four = spy.freqanalysis(ad, method="mtmfft", taper="hann",
                                output="fourier", keeptrials=True)
        got = spy.freqanalysis(ad, method="mtmfft", taper="hann",
                               output=output, keeptrials=True)
        assert np.allclose(np.asarray(got.data),
                           transform(np.asarray(four.data)), atol=1e-5)

    def test_dpss_keeptapers_axis(self, ad):
        spec = spy.freqanalysis(ad, method="mtmfft", tapsmofrq=5,
                                keeptapers=True, output="pow")
        n_tap = spec.data.shape[spec.dimord.index("taper")]
        assert n_tap > 1
        assert len(spec.taper) == n_tap
        avg = spy.freqanalysis(ad, method="mtmfft", tapsmofrq=5,
                               keeptapers=False, output="pow")
        assert np.allclose(np.asarray(spec.data).mean(axis=1, keepdims=True),
                           np.asarray(avg.data), atol=1e-5)

    def test_parseval_energy(self, ad):
        """Hann-tapered power integrates to the tapered signal energy
        (independent physical check, no reference code involved)."""
        spec = spy.freqanalysis(ad, method="mtmfft", taper="hann",
                                output="fourier", keeptrials=True)
        z = np.asarray(spec.data)[0, 0]  # (F, C)
        # undo the kernel's 1/2 one-sided scaling convention: total energy
        # = |DC|^2 + 2 sum |pos freqs|^2 for a real signal
        trial = np.asarray(ad.trials[0]).astype(np.float64)
        trial = trial - trial.mean(axis=0)
        win = np.hanning(300)
        win = win * np.sqrt(2.0 / (win ** 2).sum())
        ref = np.fft.rfft(trial * win[:, None], axis=0)
        assert np.allclose(np.abs(z), np.abs(ref) * np.abs(z[1:, 0]).max()
                           / np.abs(ref[1:, 0]).max(), rtol=2e-4, atol=1e-5)

    def test_foi_grid_snapping(self, ad):
        foi = np.array([10.4, 50.2, 99.9])
        spec = spy.freqanalysis(ad, method="mtmfft", taper="hann", foi=foi)
        # snapped to the rfft grid (maxperlen: df = 500/300 Hz)
        df = 500.0 / 300.0
        k = np.asarray(spec.freq) / df
        assert np.allclose(k, np.round(k), atol=1e-6)
        assert np.abs(spec.freq - foi).max() <= df / 2 + 1e-9


class TestWelchMatrix:
    """Welch behaviors (reference test_welch.py:42-415): statistical
    variance reduction, trial averaging, rejections."""

    def _welch(self, data, **kw):
        kw.setdefault("method", "welch")
        kw.setdefault("t_ftimwin", 0.1)
        kw.setdefault("toi", 0.0)
        return spy.freqanalysis(data, **kw)

    def test_variance_reduction_with_more_windows(self):
        """A longer signal (more Welch windows) must give a lower-variance
        estimate than a short one at the same window count via overlap."""
        wn_long = spy.synthdata.white_noise(nTrials=20, nChannels=1,
                                            nSamples=10000, samplerate=1000, seed=42)
        wn_short = spy.synthdata.white_noise(nTrials=20, nChannels=1,
                                             nSamples=1000, samplerate=1000, seed=42)
        spec_long = self._welch(wn_long, t_ftimwin=0.1, toi=0.0, foilim=[5, 200])
        spec_short = self._welch(wn_short, t_ftimwin=0.02, toi=0.5, foilim=[5, 200])
        var_long = spy.var(spec_long, dim="trials")
        var_short = spy.var(spec_short, dim="trials")
        assert var_long.data.shape[0] == 1
        assert np.mean(np.asarray(var_long.data)) < np.mean(np.asarray(var_short.data))

    def test_overlap_reduces_variance(self):
        wn = spy.synthdata.white_noise(nTrials=20, nChannels=1,
                                       nSamples=2000, samplerate=1000, seed=1)
        v0 = spy.var(self._welch(wn, toi=0.0), dim="trials")
        v5 = spy.var(self._welch(wn, toi=0.5), dim="trials")
        assert np.mean(np.asarray(v5.data)) < np.mean(np.asarray(v0.data))

    def test_trial_averaging(self):
        wn = spy.synthdata.white_noise(nTrials=10, nChannels=2,
                                       nSamples=1000, samplerate=1000, seed=2)
        per_trial = self._welch(wn, keeptrials=True)
        avg = self._welch(wn, keeptrials=False)
        assert len(avg.trials) == 1
        assert np.allclose(np.asarray(per_trial.data).mean(axis=0, keepdims=True),
                           np.asarray(avg.data), atol=1e-6)

    def test_rejects_keeptapers(self):
        wn = spy.synthdata.white_noise(nTrials=2, nChannels=1,
                                       nSamples=1000, samplerate=1000, seed=3)
        with pytest.raises(spy.SPYValueError, match="keeptapers"):
            self._welch(wn, tapsmofrq=2, keeptapers=True)

    def test_rejects_invalid_toi_and_output(self):
        wn = spy.synthdata.white_noise(nTrials=2, nChannels=1,
                                       nSamples=1000, samplerate=1000, seed=3)
        with pytest.raises(spy.SPYValueError, match="toi"):
            self._welch(wn, toi="all")
        with pytest.raises(spy.SPYValueError, match="toi"):
            self._welch(wn, toi=np.linspace(0, 1, 5))
        with pytest.raises(spy.SPYValueError, match="output"):
            self._welch(wn, output="fourier")


class TestAllTapers:
    def test_every_available_taper_runs(self):
        """Every window in availableTapers (all scipy windows minus the
        parametric exceptions, reference const_def.py:40-46) produces a
        finite power spectrum with Parseval-scale energy."""
        from syncopy_tpu.shared.const_def import availableTapers

        d = spy.synthdata.white_noise(nTrials=2, nSamples=256, nChannels=2,
                                      samplerate=256, seed=0)
        needs_param = {"chebwin": {"at": 100}, "gaussian": {"std": 30},
                       "general_cosine": {"a": [0.54, 0.46]},
                       "general_gaussian": {"p": 1.5, "sig": 30},
                       "general_hamming": {"alpha": 0.54},
                       "kaiser": {"beta": 14},
                       "kaiser_bessel_derived": {"beta": 14},
                       "tukey": {"alpha": 0.5},
                       "taylor": {"nbar": 4, "sll": 30, "norm": True},
                       "dpss": None}
        ran = 0
        for taper in availableTapers:
            opt = needs_param.get(taper, {})
            if opt is None:
                continue
            spec = spy.freqanalysis(d, method="mtmfft", taper=taper,
                                    taper_opt=opt or None, keeptrials=False)
            arr = np.asarray(spec.data)
            assert np.isfinite(arr).all(), taper
            assert arr.sum() > 0, taper
            ran += 1
        assert ran >= 20


class TestMethodOutputMatrix:
    @pytest.mark.parametrize("method,extra", [
        ("mtmfft", {}),
        ("mtmconvol", {"t_ftimwin": 0.25, "toi": 0.5}),
        ("wavelet", {"foi": np.array([10.0, 20.0, 40.0])}),
        ("superlet", {"foi": np.array([10.0, 20.0, 40.0]), "order_max": 4}),
    ])
    @pytest.mark.parametrize("output", ["pow", "fourier", "abs", "real",
                                        "imag", "angle", "absreal", "absimag"])
    def test_runs_with_correct_dtype(self, method, extra, output):
        from syncopy_tpu.shared.const_def import spectralDTypes

        d = spy.synthdata.harmonic(freq=20, samplerate=256, nTrials=2,
                                   nSamples=256, nChannels=2)
        spec = spy.freqanalysis(d, method=method, taper="hann",
                                output=output, **extra)
        arr = np.asarray(spec.data)
        assert arr.dtype == spectralDTypes[output], (method, output)
        assert np.isfinite(arr).all() if output != "angle" else True
        assert arr.shape[-1] == 2


class TestFreqanalysisValidationMatrix:
    """Frontend argument validation (reference test_specest.py:315-1560
    exception blocks): every invalid setting raises a typed error with an
    actionable message, never a crash downstream."""

    @pytest.fixture(scope="class")
    def d(self):
        return spy.synthdata.white_noise(nTrials=2, nSamples=500,
                                         samplerate=500, nChannels=2, seed=0)

    @pytest.mark.parametrize("foi", [[-0.5, 100], [10, 500], [300, 400]])
    def test_foi_outside_nyquist(self, d, foi):
        with pytest.raises(spy.SPYValueError, match="foi"):
            spy.freqanalysis(d, method="mtmfft", taper="hann", foi=foi)

    def test_foi_and_foilim_conflict(self, d):
        with pytest.raises(spy.SPYValueError):
            spy.freqanalysis(d, method="mtmfft", taper="hann",
                             foi=[10, 20], foilim=[5, 50])

    def test_invalid_method(self, d):
        with pytest.raises(spy.SPYValueError, match="method"):
            spy.freqanalysis(d, method="spectrogram")

    def test_invalid_output(self, d):
        with pytest.raises(spy.SPYValueError, match="output"):
            spy.freqanalysis(d, method="mtmfft", output="power")

    @pytest.mark.parametrize("toi", [[0.3, -0.1, 0.2], [5.0, 6.0], [-2.0, 0.5]])
    def test_bad_toi_arrays(self, d, toi):
        with pytest.raises(spy.SPYValueError, match="toi"):
            spy.freqanalysis(d, method="mtmconvol", t_ftimwin=0.1,
                             toi=np.asarray(toi, dtype=float))

    @pytest.mark.parametrize("t_ftimwin", [5.0, -0.1, 0.0])
    def test_bad_window_lengths(self, d, t_ftimwin):
        with pytest.raises(spy.SPYValueError, match="t_ftimwin"):
            spy.freqanalysis(d, method="mtmconvol", t_ftimwin=t_ftimwin,
                             toi=0.5)

    def test_wavelet_toi_out_of_bounds(self, d):
        with pytest.raises(spy.SPYValueError, match="toi"):
            spy.freqanalysis(d, method="wavelet", foi=[10.0, 20.0],
                             toi=np.array([5.0, 6.0]))

    def test_invalid_taper_name(self, d):
        with pytest.raises(spy.SPYValueError, match="taper"):
            spy.freqanalysis(d, method="mtmfft", taper="rectangular")

    def test_invalid_taper_opt_key(self, d):
        with pytest.raises(spy.SPYValueError):
            spy.freqanalysis(d, method="mtmfft", taper="kaiser",
                             taper_opt={"bogus_key": 1.0})

    def test_taper_opt_wrong_type(self, d):
        with pytest.raises((spy.SPYValueError, spy.SPYTypeError)):
            spy.freqanalysis(d, method="mtmfft", taper="kaiser",
                             taper_opt="beta=5")

    def test_tapsmofrq_too_small_adjusts(self, d):
        """A sub-resolution tapsmofrq is clamped with a warning, not an
        error (reference process_taper semantics)."""
        import warnings

        with warnings.catch_warnings(record=True):
            warnings.simplefilter("always")
            out = spy.freqanalysis(d, method="mtmfft", tapsmofrq=0.01)
        assert np.isfinite(np.asarray(out.data)).all()

    def test_negative_tapsmofrq_rejected(self, d):
        with pytest.raises(spy.SPYValueError):
            spy.freqanalysis(d, method="mtmfft", tapsmofrq=-2)

    def test_pad_shorter_than_trial_rejected(self, d):
        with pytest.raises(spy.SPYValueError, match="pad"):
            spy.freqanalysis(d, method="mtmfft", taper="hann", pad=0.5)

    def test_polyremoval_out_of_range(self, d):
        with pytest.raises(spy.SPYValueError):
            spy.freqanalysis(d, method="mtmfft", taper="hann", polyremoval=3)


class TestSpectralPhysics:
    """Physical correctness sweeps (reference test_specest.py harmonic /
    resolution blocks)."""

    def test_harmonic_amplitude_calibration(self):
        """A unit harmonic peaks at A^2/2 = 0.5 power (the normalization
        contract, reference _norm_spec.py)."""
        fs, f0 = 1000.0, 100.0
        t = np.arange(2000) / fs
        sig = np.cos(2 * np.pi * f0 * t)[:, None].astype("f4")
        ad = spy.AnalogData(data=np.tile(sig, (1, 1)), samplerate=fs)
        spec = spy.freqanalysis(ad, method="mtmfft", taper=None)
        arr = np.asarray(spec.data)[0, 0, :, 0]
        f_idx = np.argmin(np.abs(np.asarray(spec.freq) - f0))
        assert arr[f_idx] == pytest.approx(0.5, rel=1e-3)

    def test_two_tones_resolved_by_enough_samples(self):
        fs = 1000.0
        t = np.arange(4000) / fs
        sig = (np.cos(2 * np.pi * 98 * t) + np.cos(2 * np.pi * 102 * t))
        ad = spy.AnalogData(data=sig[:, None].astype("f4"), samplerate=fs)
        spec = spy.freqanalysis(ad, method="mtmfft", taper=None,
                                foilim=[90, 110])
        arr = np.asarray(spec.data)[0, 0, :, 0]
        freqs = np.asarray(spec.freq)
        # both tones present, valley between them
        i98 = np.argmin(np.abs(freqs - 98))
        i100 = np.argmin(np.abs(freqs - 100))
        i102 = np.argmin(np.abs(freqs - 102))
        assert arr[i98] > 10 * arr[i100]
        assert arr[i102] > 10 * arr[i100]

    def test_multitaper_trades_variance_for_bandwidth(self):
        d = spy.synthdata.white_noise(nTrials=30, nSamples=1000,
                                      samplerate=1000, nChannels=1, seed=4)
        sharp = spy.freqanalysis(d, method="mtmfft", taper="hann")
        smooth = spy.freqanalysis(d, method="mtmfft", tapsmofrq=5)
        v_sharp = np.asarray(spy.var(sharp, dim="trials").data).mean()
        v_smooth = np.asarray(spy.var(smooth, dim="trials").data).mean()
        assert v_smooth < v_sharp / 2

    def test_chirp_tracked_by_mtmconvol(self):
        fs = 1000.0
        t = np.arange(2000) / fs
        f_inst = 50 + 50 * t  # 50 -> 150 Hz over 2 s
        phase = 2 * np.pi * np.cumsum(f_inst) / fs
        ad = spy.AnalogData(data=np.cos(phase)[:, None].astype("f4"),
                            samplerate=fs)
        tf = spy.freqanalysis(ad, method="mtmconvol", t_ftimwin=0.25,
                              toi=np.arange(0.3, 1.8, 0.25), taper="hann")
        arr = np.asarray(tf.data)[:, 0, :, 0]
        freqs = np.asarray(tf.freq)
        times = tf.time[0]
        for k, tk in enumerate(times):
            peak = freqs[np.argmax(arr[k])]
            assert peak == pytest.approx(50 + 50 * tk, abs=8), (tk, peak)

    def test_chirp_tracked_by_superlet(self):
        fs = 500.0
        t = np.arange(1500) / fs
        f_inst = 30 + 20 * t
        phase = 2 * np.pi * np.cumsum(f_inst) / fs
        ad = spy.AnalogData(data=np.cos(phase)[:, None].astype("f4"),
                            samplerate=fs)
        foi = np.arange(20, 95, 2.0)
        tf = spy.freqanalysis(ad, method="superlet", foi=foi, order_max=10)
        arr = np.asarray(tf.data)[:, 0, :, 0]
        times = (np.arange(arr.shape[0])) / fs
        for k in range(200, 1300, 200):
            peak = foi[np.argmax(arr[k])]
            assert peak == pytest.approx(30 + 20 * times[k], abs=6)
