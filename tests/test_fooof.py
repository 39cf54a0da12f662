# -*- coding: utf-8 -*-
# FOOOF tests (modeled on reference tests/backend/test_fooofspy.py and
# tests/test_specest_fooof.py): synthetic 1/f + gaussian peak ground truth.

import numpy as np
import pytest

import syncopy_tpu as spy
from syncopy_tpu.specest.fooofspy import fooofspy


def synth_spectrum(freqs, offset=1.0, exponent=1.5, peaks=((10, 0.5, 2.0),)):
    log_pow = offset - exponent * np.log10(freqs)
    for ctr, hgt, wid in peaks:
        log_pow = log_pow + hgt * np.exp(-((freqs - ctr) ** 2) / (2 * wid**2))
    return 10**log_pow


class TestFooofKernel:
    def test_aperiodic_recovery(self):
        freqs = np.linspace(1, 100, 200)
        spec = synth_spectrum(freqs, offset=1.0, exponent=1.5, peaks=())
        model, details = fooofspy(spec[:, None], freqs, out_type="fooof")
        ap = details["aperiodic_params"][0]
        assert ap[0] == pytest.approx(1.0, abs=0.1)
        assert ap[1] == pytest.approx(1.5, abs=0.1)
        assert details["r_squared"][0] > 0.99

    def test_peak_recovery(self):
        freqs = np.linspace(1, 100, 300)
        spec = synth_spectrum(freqs, peaks=((10, 0.8, 2.0),))
        model, details = fooofspy(spec[:, None], freqs, out_type="fooof")
        peaks = details["peak_params"][0]
        assert len(peaks) >= 1
        main = max(peaks, key=lambda p: p[1])
        assert main[0] == pytest.approx(10, abs=1.0)
        assert main[1] == pytest.approx(0.8, abs=0.2)

    def test_two_peaks(self):
        freqs = np.linspace(1, 100, 400)
        spec = synth_spectrum(freqs, peaks=((10, 0.8, 2.0), (40, 0.5, 3.0)))
        _, details = fooofspy(spec[:, None], freqs, out_type="fooof")
        centers = sorted(p[0] for p in details["peak_params"][0])
        assert any(abs(c - 10) < 2 for c in centers)
        assert any(abs(c - 40) < 3 for c in centers)

    def test_aperiodic_output(self):
        freqs = np.linspace(1, 100, 200)
        spec = synth_spectrum(freqs, peaks=((10, 0.8, 2.0),))
        ap_model, _ = fooofspy(spec[:, None], freqs, out_type="fooof_aperiodic")
        # the aperiodic model should NOT contain the peak
        at10 = np.argmin(np.abs(freqs - 10))
        assert ap_model[at10, 0] < spec[at10] / 2


class TestFooofFrontend:
    def test_fooof_outputs(self):
        data = spy.synthdata.ar2_network(
            AdjMat=np.zeros((2, 2), dtype=np.float32), nTrials=20,
            samplerate=200, nSamples=1000, seed=0,
        )
        for flavour in ("fooof", "fooof_aperiodic", "fooof_peaks"):
            res = spy.freqanalysis(
                data, method="mtmfft", output=flavour, keeptrials=False,
                foilim=[1, 100], tapsmofrq=2,
            )
            assert isinstance(res, spy.SpectralData)
            assert "fooof_aperiodic_params" in res.info
            assert len(res.trials) == 1

    def test_fooof_rejects_keeptrials(self):
        data = spy.synthdata.white_noise(nTrials=3, nSamples=500, nChannels=1, seed=0)
        with pytest.raises(spy.SPYValueError):
            spy.freqanalysis(data, method="mtmfft", output="fooof", keeptrials=True)

    def test_fooof_peak_detected(self):
        # AR(2) spectrum has a clear resonance near 40 Hz @ 200 Hz sampling
        data = spy.synthdata.ar2_network(nTrials=30, samplerate=200, nSamples=1000, seed=1)
        res = spy.freqanalysis(
            data, method="mtmfft", output="fooof", keeptrials=False,
            foilim=[2, 90], tapsmofrq=1,
        )
        peaks = res.info["fooof_peak_params"][0]
        assert any(abs(p[0] - 40) < 8 for p in peaks)


class TestFooofDepth:
    """Quantitative FOOOF validation on synthetic ground truth (the native
    re-fit must recover known generative parameters; reference test_fooof
    validates against the fooof package the same way)."""

    def _synth(self, offset=1.5, exponent=1.2, peaks=((12.0, 0.8, 1.5),),
               knee=None, f=None):
        if f is None:
            f = np.linspace(2, 80, 157)
        if knee is None:
            log_ap = offset - exponent * np.log10(f)
        else:
            log_ap = offset - np.log10(knee + f ** exponent)
        log_p = log_ap.copy()
        for c, h, w in peaks:
            log_p = log_p + h * np.exp(-((f - c) ** 2) / (2 * w ** 2))
        return f, 10 ** log_p

    def test_parameter_recovery_fixed(self):
        from syncopy_tpu.specest.fooofspy import fooofspy

        f, p = self._synth(offset=1.5, exponent=1.2,
                           peaks=((12.0, 0.8, 1.5), (40.0, 0.5, 3.0)))
        spectra, det = fooofspy(p[:, None], f)
        ap = det["aperiodic_params"][0]
        assert abs(ap[0] - 1.5) < 0.15      # offset
        assert abs(ap[-1] - 1.2) < 0.15     # exponent
        centers = sorted(pk[0] for pk in det["peak_params"][0])
        assert abs(centers[0] - 12.0) < 1.0
        assert abs(centers[-1] - 40.0) < 1.5
        assert det["r_squared"][0] > 0.99

    def test_knee_mode_recovery(self):
        from syncopy_tpu.specest.fooofspy import fooofspy

        f, p = self._synth(offset=2.0, exponent=2.0, peaks=(), knee=150.0)
        spectra, det = fooofspy(
            p[:, None], f, fooof_opt={"aperiodic_mode": "knee"}
        )
        assert det["r_squared"][0] > 0.995
        ap = det["aperiodic_params"][0]
        assert abs(ap[0] - 2.0) < 0.1      # offset
        assert abs(ap[1] - 150.0) < 15.0   # knee
        assert abs(ap[2] - 2.0) < 0.1      # exponent
        # any residual-noise "peaks" must be negligible in height
        assert all(pk[1] < 0.05 for pk in det["peak_params"][0])

    def test_model_reconstruction_error(self):
        from syncopy_tpu.specest.fooofspy import fooofspy

        rng = np.random.default_rng(5)
        f, p = self._synth(peaks=((20.0, 0.6, 2.0),))
        noisy = p * 10 ** (rng.normal(0, 0.02, size=p.size))
        spectra, det = fooofspy(noisy[:, None], f)
        mask = f > 0
        err = np.abs(np.log10(spectra[mask, 0]) - np.log10(p[mask])).mean()
        assert err < 0.05

    def test_freq_range_restriction(self):
        from syncopy_tpu.specest.fooofspy import fooofspy

        f, p = self._synth(peaks=((12.0, 0.9, 1.5), (60.0, 0.9, 2.0)))
        _, det = fooofspy(p[:, None], f, freq_range=[5, 30])
        centers = [pk[0] for pk in det["peak_params"][0]]
        assert all(5 <= c <= 30 for c in centers)

    def test_frontend_info_keys(self):
        d = spy.synthdata.ar2_network(nTrials=20, samplerate=200,
                                      nSamples=500, seed=8)
        res = spy.freqanalysis(d, method="mtmfft", output="fooof",
                               keeptrials=False, tapsmofrq=2)
        for key in ("fooof_aperiodic_params", "fooof_peak_params",
                    "fooof_r_squared", "fooof_n_peaks"):
            assert any(k.startswith(key.split("_params")[0]) for k in res.info), (key, list(res.info))


def _gen_power_spectrum(freq_range=(3, 40), freq_res=0.5,
                        aperiodic_params=(1, 1),
                        periodic_params=((10, 0.2, 1.25), (30, 0.15, 2)),
                        nlv=0.001, seed=0):
    """Replica of fooof.sim.gen.gen_power_spectrum (the generator behind the
    reference's backend fixtures, /root/reference/syncopy/tests/backend/
    test_fooofspy.py:17-33): linear power built in log10 space as
    aperiodic + gaussians + white noise."""
    freqs = np.arange(freq_range[0], freq_range[1] + freq_res / 2, freq_res)
    offset, exponent = aperiodic_params
    log_pow = offset - exponent * np.log10(freqs)
    for cf, pw, bw in periodic_params:
        log_pow = log_pow + pw * np.exp(-((freqs - cf) ** 2) / (2 * bw**2))
    rng = np.random.default_rng(seed)
    log_pow = log_pow + rng.normal(0, nlv, size=freqs.size)
    return freqs, 10**log_pow


class TestFooofReferenceFixtures:
    """Ports of the reference backend suite (/root/reference/syncopy/tests/
    backend/test_fooofspy.py:56-277): same synthetic spectrum definition,
    same acceptance tolerances, same details contract and error messages."""

    freqs, powers = _gen_power_spectrum()
    fooof_opt = {"peak_width_limits": (1.0, 12.0)}

    def test_output_fooof_single_channel(self):
        spectra, details = fooofspy(
            self.powers, self.freqs, out_type="fooof", fooof_opt=self.fooof_opt
        )
        assert spectra.shape == (self.freqs.size, 1)
        assert details["settings_used"]["out_type"] == "fooof"
        for key in ("aperiodic_params", "gaussian_params", "peak_params",
                    "n_peaks", "r_squared", "error", "settings_used"):
            assert key in details
        # defaults surface in settings_used (reference :87-89)
        assert details["settings_used"]["fooof_opt"]["peak_threshold"] == 2.0
        # parameter recovery at the reference's own tolerances (:93-94)
        gauss = details["gaussian_params"][0]
        assert len(gauss) >= 2
        by_cf = sorted(gauss, key=lambda p: p[0])
        assert np.allclose(by_cf[0], [10, 0.2, 1.25], atol=0.5)
        assert np.allclose(by_cf[-1], [30, 0.15, 2], atol=2.0)
        # aperiodic offset/exponent recover the generating [1, 1]
        assert np.allclose(details["aperiodic_params"][0], [1, 1], atol=0.25)

    def test_output_fooof_several_channels(self):
        num_channels = 3
        powers = np.tile(self.powers, num_channels).reshape(
            self.powers.size, num_channels, order="F"
        )
        spectra, details = fooofspy(
            powers, self.freqs, out_type="fooof", fooof_opt=self.fooof_opt
        )
        assert spectra.shape == (self.freqs.size, num_channels)
        assert len(details["aperiodic_params"]) == num_channels
        # identical channels -> identical fits
        assert np.allclose(spectra[:, 0], spectra[:, 2])

    def test_output_fooof_aperiodic(self):
        spectra, details = fooofspy(
            self.powers, self.freqs, out_type="fooof_aperiodic",
            fooof_opt=self.fooof_opt,
        )
        assert spectra.shape == (self.freqs.size, 1)
        assert details["settings_used"]["out_type"] == "fooof_aperiodic"
        # the aperiodic model is smooth/peak-free: monotone decreasing
        assert np.all(np.diff(spectra[:, 0]) < 0)

    def test_output_fooof_peaks(self):
        spectra, details = fooofspy(
            self.powers, self.freqs, out_type="fooof_peaks",
            fooof_opt=self.fooof_opt,
        )
        assert spectra.shape == (self.freqs.size, 1)
        assert details["settings_used"]["out_type"] == "fooof_peaks"

    def test_together(self):
        spec_fooof, det = fooofspy(
            self.powers, self.freqs, out_type="fooof", fooof_opt=self.fooof_opt
        )
        spec_ap, _ = fooofspy(
            self.powers, self.freqs, out_type="fooof_aperiodic",
            fooof_opt=self.fooof_opt,
        )
        spec_pk, _ = fooofspy(
            self.powers, self.freqs, out_type="fooof_peaks",
            fooof_opt=self.fooof_opt,
        )
        assert spec_fooof.shape == spec_ap.shape == spec_pk.shape
        # reference :212: the peak-only model stays below the full model
        assert np.max(spec_pk) < np.max(spec_fooof)
        # decomposition consistency: log-model = log-aperiodic + log-peaks
        lm = np.log10(spec_fooof[:, 0])
        la = np.log10(spec_ap[:, 0])
        lp = np.log10(np.maximum(spec_pk[:, 0], 1e-20))
        np.testing.assert_allclose(lm, la + np.maximum(lp, 0), atol=1e-6)

    def test_the_fooof_opt_settings_are_used(self):
        fooof_opt = {"peak_threshold": 3.0, "peak_width_limits": (1.0, 12.0)}
        spectra, details = fooofspy(
            self.powers, self.freqs, out_type="fooof_peaks", fooof_opt=fooof_opt
        )
        assert details["settings_used"]["fooof_opt"]["peak_threshold"] == 3.0
        assert details["settings_used"]["fooof_opt"]["min_peak_height"] == 0.0

    def test_exception_empty_freqs(self):
        with pytest.raises(ValueError) as err:
            fooofspy(self.powers, None)
        assert "input frequencies are required and must not be None" in str(err.value)

    def test_exception_freq_length_does_not_match_spectrum_length(self):
        with pytest.raises(ValueError) as err:
            fooofspy(np.vstack([self.powers, self.powers]).T,
                     np.arange(self.powers.size + 1))
        assert "signal length" in str(err.value)
        assert "must match the number of frequency labels" in str(err.value)

    def test_exception_on_invalid_output_type(self):
        with pytest.raises(ValueError) as err:
            fooofspy(self.powers, self.freqs, out_type="fooof_invalidout")
        assert "out_type" in str(err.value)

    def test_exception_on_invalid_fooof_opt_entry(self):
        with pytest.raises(ValueError) as err:
            fooofspy(self.powers, self.freqs,
                     fooof_opt={"peak_threshold": 2.0, "invalid_key": 42})
        assert "fooof_opt" in str(err.value)

    def test_peak_params_convention(self):
        """peak_params follow the fooof convention: [CF, PW over aperiodic
        at CF, BW = 2*sigma] derived from gaussian_params."""
        _, details = fooofspy(
            self.powers, self.freqs, out_type="fooof", fooof_opt=self.fooof_opt
        )
        gauss = details["gaussian_params"][0]
        peaks = details["peak_params"][0]
        assert len(gauss) == len(peaks) == details["n_peaks"][0]
        for g, p in zip(gauss, peaks):
            assert p[0] == g[0]          # same center
            assert p[1] >= g[1] - 1e-9   # stacked height >= own height
            assert np.isclose(p[2], 2 * g[2])
