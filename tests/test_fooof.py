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
