# -*- coding: utf-8 -*-
# Direct numerical parity vs the reference's pure-numpy backend kernels.
# The reference modules are loaded standalone (without the reference's
# package __init__, which needs dask) and used purely as test ORACLES —
# no reference code is shipped in syncopy_tpu.

import importlib.util
import pathlib
import sys
import types

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/syncopy")


def _load(modname, relpath, pkg=None):
    """Load a reference module under a synthetic package so its relative
    imports resolve without importing the full reference package."""
    if pkg and pkg not in sys.modules:
        pkgmod = types.ModuleType(pkg)
        pkgmod.__path__ = [str(REF / pkg.split(".", 1)[1].replace(".", "/"))]
        sys.modules[pkg] = pkgmod
    spec = importlib.util.spec_from_file_location(modname, str(REF / relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_mtmfft():
    _load("refspy.specest._norm_spec", "specest/_norm_spec.py", pkg="refspy.specest")
    return _load("refspy.specest.mtmfft", "specest/mtmfft.py", pkg="refspy.specest")


@pytest.fixture(scope="module")
def ref_mtmconvol():
    _load("refspy.specest._norm_spec", "specest/_norm_spec.py", pkg="refspy.specest")
    _load("refspy.specest.stft", "specest/stft.py", pkg="refspy.specest")
    return _load("refspy.specest.mtmconvol", "specest/mtmconvol.py", pkg="refspy.specest")


@pytest.fixture(scope="module")
def ref_superlet():
    return _load("refspy.specest.superlet", "specest/superlet.py", pkg="refspy.specest")


@pytest.fixture(scope="module")
def ref_wavelets():
    pkgname = "refspy.specest.wavelets"
    pkgmod = types.ModuleType(pkgname)
    pkgmod.__path__ = [str(REF / "specest/wavelets")]
    sys.modules[pkgname] = pkgmod
    wav = _load(pkgname + ".wavelets", "specest/wavelets/wavelets.py")
    pkgmod.wavelets = wav
    # transform.py does "from .wavelets import Morlet"
    tra = _load(pkgname + ".transform", "specest/wavelets/transform.py")
    pkgmod.transform = tra
    return wav, tra


@pytest.fixture(scope="module")
def ref_firws():
    return _load("refspy.preproc.firws", "preproc/firws.py", pkg="refspy.preproc")


@pytest.fixture(scope="module")
def ref_resampling(ref_firws):
    # resampling.py does "from syncopy.preproc import firws" — pre-register
    # stub modules so no filesystem import of the reference package happens.
    if "syncopy" not in sys.modules:
        sys.modules["syncopy"] = types.ModuleType("syncopy")
    preproc = types.ModuleType("syncopy.preproc")
    preproc.firws = ref_firws
    sys.modules["syncopy.preproc"] = preproc
    sys.modules["syncopy"].preproc = preproc
    try:
        yield _load("refspy.preproc.resampling", "preproc/resampling.py", pkg="refspy.preproc")
    finally:
        sys.modules.pop("syncopy", None)
        sys.modules.pop("syncopy.preproc", None)


class TestMtmfftParity:
    @pytest.mark.parametrize(
        "taper,topt",
        [("hann", None), (None, None), ("dpss", {"Kmax": 4, "NW": 2.5}), ("kaiser", {"beta": 5.0})],
    )
    def test_spectra_match(self, ref_mtmfft, taper, topt):
        rng = np.random.default_rng(11)
        dat = rng.normal(size=(777, 3))
        ref, ref_freqs = ref_mtmfft.mtmfft(dat.copy(), samplerate=1000.0, taper=taper, taper_opt=topt)

        from syncopy_tpu.ops.spectral import mtmfft as jmtmfft
        from syncopy_tpu.ops.windows import make_tapers

        tapers = make_tapers(taper, topt, 777, 777, 1000.0)
        got = np.asarray(jmtmfft(dat.astype("f4"), tapers, 777))
        assert got.shape == ref.shape
        scale = max(np.abs(ref).max(), 1e-12)
        assert np.abs(got - ref).max() / scale < 2e-6

    def test_padded_spectra_match(self, ref_mtmfft):
        rng = np.random.default_rng(12)
        dat = rng.normal(size=(500, 2))
        nfft = 1024
        padded = np.zeros((nfft, 2))
        padded[:500] = dat
        ref, _ = ref_mtmfft.mtmfft(padded, samplerate=500.0, taper="hamming")

        from syncopy_tpu.ops.spectral import mtmfft as jmtmfft
        from syncopy_tpu.ops.windows import make_tapers

        # reference tapers the *padded* signal; mirror that geometry
        tapers = make_tapers("hamming", None, nfft, nfft, 500.0)
        got = np.asarray(jmtmfft(padded.astype("f4"), tapers, nfft))
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 2e-6


class TestMtmconvolIrregularToiParity:
    """Non-equidistant toi spectrograms match the reference oracle: the
    reference covers every sample (noverlap=nperseg-1, boundary='zeros',
    reference mtmconvol.py:114-190) and postselects the requested toi
    samples (reference compRoutines.py:359-390); our kernel gathers frames
    at exactly those centers."""

    @pytest.mark.parametrize("taper,topt", [("hann", None), ("dpss", {"Kmax": 3, "NW": 2})])
    def test_irregular_toi_matches_reference(self, ref_mtmconvol, taper, topt):
        rng = np.random.default_rng(21)
        fs, nperseg = 1000.0, 128
        dat = rng.normal(size=(512, 3))
        ftr, _ = ref_mtmconvol.mtmconvol(
            dat.copy(), fs, nperseg, noverlap=nperseg - 1, taper=taper,
            taper_opt=None if topt is None else dict(topt),
            boundary="zeros", padded=True,
        )
        toi = np.array([0.051, 0.062, 0.2, 0.333, 0.334, 0.45])
        samples = np.round(toi * fs).astype(int)
        ref_sel = ftr[samples]  # (nToi, nTaper, nFreq, nChan)

        import jax.numpy as jnp

        from syncopy_tpu.ops.stft import mtmconvol as jmtmconvol
        from syncopy_tpu.ops.windows import make_tapers

        topt2 = dict(topt) if topt else None
        if taper == "dpss":
            topt2["sym"] = False  # reference hardcodes sym=False for slepians
        tapers = make_tapers(taper, topt2, nperseg, nperseg, fs)
        got = np.asarray(jmtmconvol(
            jnp.asarray(dat, dtype=jnp.float32), jnp.asarray(tapers),
            jnp.asarray(samples), nperseg, output="fourier", keeptapers=True,
        ))
        assert got.shape == ref_sel.shape
        scale = np.abs(ref_sel).max()
        assert np.abs(got - ref_sel).max() / scale < 2e-6


class TestSuperletParity:
    @pytest.mark.parametrize("adaptive", [False, True])
    def test_transform_match(self, ref_superlet, adaptive):
        rng = np.random.default_rng(13)
        fs = 500.0
        dat = rng.normal(size=(600, 2))
        foi = np.array([10.0, 20.0, 40.0, 70.0])
        scales = (1.0 / foi) / (2 * np.pi)  # reference scale convention (superlet.py:361)
        ref = ref_superlet.superlet(
            dat.copy(), samplerate=fs, scales=scales, order_max=8, order_min=2, c_1=3, adaptive=adaptive
        )

        from syncopy_tpu.ops.wavelet import superlet as jsuperlet

        got = np.asarray(
            jsuperlet(dat.astype("f4"), scales, order_max=8, order_min=2, c_1=3, adaptive=adaptive, dt=1 / fs)
        )
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 5e-6


class TestWaveletParity:
    def test_cwt_morlet_match(self, ref_wavelets):
        wavmod, tramod = ref_wavelets
        rng = np.random.default_rng(14)
        dat = rng.normal(size=(512,))
        dt = 1 / 250.0
        ref_wav = wavmod.Morlet(w0=6)
        scales = ref_wav.scale_from_period(1 / np.array([8.0, 15.0, 30.0, 60.0]))
        ref = tramod.cwt(dat.copy(), wavelet=ref_wav, widths=scales, dt=dt, axis=0)

        from syncopy_tpu.ops.wavelet import Morlet, cwt

        got = np.asarray(cwt(dat.astype("f4")[:, None], Morlet(6), scales, dt))[:, :, 0]
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 5e-6

    @pytest.mark.parametrize("name,args", [("Paul", (4,)), ("DOG", (2,)), ("Ricker", ())])
    def test_wavelet_functions_match(self, ref_wavelets, name, args):
        wavmod, _ = ref_wavelets
        import syncopy_tpu.ops.wavelet as ours

        rw = getattr(wavmod, name)(*args)
        ow = getattr(ours, name)(*args)
        t = np.linspace(-5, 5, 201)
        assert np.allclose(ow.time(t, 1.3), rw.time(t, 1.3), atol=1e-12)
        w = np.linspace(0.1, 40, 100)
        assert np.allclose(ow.frequency(w, 0.7), rw.frequency(w, 0.7), atol=1e-12)
        assert ow.fourier_period(1.1) == pytest.approx(rw.fourier_period(1.1), rel=1e-12)


class TestFirwsParity:
    @pytest.mark.parametrize("freq,band", [(40.0, "lp"), (5.0, "hp"), ((8.0, 30.0), "bp"), ((48.0, 52.0), "bs")])
    def test_kernel_design_match(self, ref_firws, freq, band):
        from syncopy_tpu.ops.filtering import design_wsinc

        fs = 500.0
        order = 400
        ref = ref_firws.design_wsinc("hamming", order=order, f_c=np.array(freq) / fs, filter_type=band)
        got = np.asarray(design_wsinc("hamming", order=order, f_c=np.array(freq) / fs, filter_type=band))
        assert np.abs(got - ref).max() < 1e-12

    def test_minphase_match(self, ref_firws):
        from syncopy_tpu.ops.filtering import design_wsinc, minphaserceps

        kern = np.asarray(design_wsinc("hamming", order=300, f_c=0.12, filter_type="lp"))
        ref = ref_firws.minphaserceps(kern.copy())
        got = np.asarray(minphaserceps(kern))
        assert np.abs(got - ref).max() < 1e-9

    def test_apply_fir_match(self, ref_firws):
        from syncopy_tpu.ops.filtering import apply_fir, design_wsinc

        rng = np.random.default_rng(15)
        dat = rng.normal(size=(800, 2))
        kern = np.asarray(design_wsinc("hamming", order=256, f_c=0.2, filter_type="lp"))
        ref = ref_firws.apply_fir(dat.copy(), kern)
        got = np.asarray(apply_fir(dat.astype("f4"), kern.astype("f4")))
        assert np.abs(got - ref).max() < 1e-4


class TestResamplingParity:
    def test_resample_match(self, ref_resampling):
        rng = np.random.default_rng(16)
        dat = rng.normal(size=(1000, 2))
        ref = ref_resampling.resample(dat.copy(), orig_fs=1000.0, new_fs=400.0)

        from syncopy_tpu.ops.filtering import _resample_kernel, resample_poly

        up, down = 2, 5
        fkern = _resample_kernel(up, down, 1000, None, None, 1000.0)
        got = np.asarray(resample_poly(dat.astype("f4"), up, down, fkern))
        assert got.shape == ref.shape
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 1e-4

    def test_updn_factors(self, ref_resampling):
        from syncopy_tpu.preproc.resampledata import _get_updn

        for orig, new in [(1000.0, 400.0), (1017.25, 250.0), (44100.0, 16000.0)]:
            assert _get_updn(orig, new) == ref_resampling._get_updn(orig, new)


class TestStftParity:
    def test_mtmconvol_vs_reference_stft(self, ref_mtmfft):
        """Our gather-framed STFT equals the reference stft pipeline
        (boundary='zeros' + _norm_taper window + internal _norm_spec) at the
        equidistant window centers."""
        ref_stft = _load("refspy.specest.stft", "specest/stft.py", pkg="refspy.specest")
        norm = sys.modules["refspy.specest._norm_spec"]
        from scipy.signal import windows as sp_windows

        rng = np.random.default_rng(21)
        fs, nperseg, nstep = 250.0, 64, 16
        dat = rng.normal(size=(400, 3))
        win = norm._norm_taper("hann", np.atleast_2d(sp_windows.hann(nperseg)), nperseg)[0]
        ref, freqs, _ = ref_stft.stft(
            dat.copy(), fs=fs, window=win, nperseg=nperseg,
            noverlap=nperseg - nstep, boundary="zeros", padded=True,
        )
        # ref: (nFreq, nChannel, nSeg) -> (nSeg, nFreq, nChannel)
        ref = np.transpose(ref, (2, 0, 1))

        from syncopy_tpu.ops.stft import mtmconvol
        from syncopy_tpu.ops.windows import make_tapers

        # boundary='zeros' centers segment k on original sample k*nstep
        centers = np.arange(ref.shape[0]) * nstep
        tapers = make_tapers("hann", None, nperseg, nperseg, fs)
        got = np.asarray(
            mtmconvol(dat.astype("f4"), tapers, centers, nperseg, output="fourier")
        )
        # got: (nTime, nTaper, nFreq, nChannel)
        got = got[:, 0]
        assert got.shape == ref.shape
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 5e-6


@pytest.fixture(scope="module")
def ref_csd(ref_mtmfft):
    """Load reference connectivity/csd.py with stubbed absolute imports."""
    fake_spy = sys.modules.setdefault("syncopy", types.ModuleType("syncopy"))
    specest = types.ModuleType("syncopy.specest")
    specest.mtmfft = ref_mtmfft
    sys.modules["syncopy.specest"] = specest
    sys.modules["syncopy.specest.mtmfft"] = ref_mtmfft
    shared = types.ModuleType("syncopy.shared")
    errors = types.ModuleType("syncopy.shared.errors")
    errors.SPYValueError = ValueError
    const_def = types.ModuleType("syncopy.shared.const_def")
    const_def.spectralConversions = {
        "pow": lambda x: (x * np.conj(x)).real.astype("f4"),
        "abs": lambda x: np.abs(x).astype("f4"),
        "fourier": lambda x: x.astype("c8"),
        "complex": lambda x: x.astype("c8"),
        "angle": lambda x: np.angle(x).astype("f4"),
        "imag": lambda x: np.imag(x).astype("f4"),
        "real": lambda x: np.real(x).astype("f4"),
    }
    shared.errors, shared.const_def = errors, const_def
    sys.modules["syncopy.shared"] = shared
    sys.modules["syncopy.shared.errors"] = errors
    sys.modules["syncopy.shared.const_def"] = const_def
    fake_spy.specest, fake_spy.shared = specest, shared
    try:
        yield _load("refspy.connectivity.csd", "connectivity/csd.py", pkg="refspy.connectivity")
    finally:
        for m in ("syncopy", "syncopy.specest", "syncopy.specest.mtmfft",
                  "syncopy.shared", "syncopy.shared.errors", "syncopy.shared.const_def"):
            sys.modules.pop(m, None)


class TestCsdParity:
    @pytest.mark.parametrize("taper,topt", [("hann", None), ("dpss", {"Kmax": 3, "NW": 2})])
    def test_single_trial_csd_match(self, ref_csd, taper, topt):
        rng = np.random.default_rng(31)
        fs, T, C = 500.0, 400, 4
        dat = rng.normal(size=(T, C))
        ref, freqs = ref_csd.csd(dat.copy(), samplerate=fs, nSamples=T, taper=taper, taper_opt=topt)

        import jax.numpy as jnp

        from syncopy_tpu.ops.connectivity import cross_spectra_trial

        got = np.asarray(cross_spectra_trial(
            jnp.asarray(dat, dtype=jnp.float32), fs, T, taper=taper, taper_opt=topt,
            polyremoval=None,
        ))[0]
        scale = np.abs(ref).max()
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() / scale < 5e-6

    def test_normalize_csd_match(self, ref_csd):
        rng = np.random.default_rng(32)
        X = rng.normal(size=(40, 1, 51, 3)) + 1j * rng.normal(size=(40, 1, 51, 3))
        csd_av = np.einsum("ntfi,ntfj->tfij", X, np.conj(X)).astype("c8") / 40
        ref = ref_csd.normalize_csd(csd_av.copy(), output="abs")

        import jax.numpy as jnp

        from syncopy_tpu.ops.connectivity import normalize_csd

        got = np.asarray(normalize_csd(jnp.asarray(csd_av), output="abs"))
        assert np.abs(got - ref).max() < 1e-5


class TestPsthParity:
    @pytest.mark.parametrize("output", ["rate", "spikecount", "proportion"])
    def test_single_trial_psth_match(self, output):
        ref_psth = _load("refspy.statistics.psth", "statistics/psth.py", pkg="refspy.statistics")
        rng = np.random.default_rng(41)
        nEvents = 300
        trl = np.column_stack([
            np.sort(rng.integers(1000, 3000, nEvents)),
            rng.integers(0, 3, nEvents),
            rng.integers(0, 2, nEvents),
        ])
        combs = ref_psth.get_chan_unit_combs([trl])
        # trigger at sample 1500 of [1000, 3000) -> trigger-relative window
        # [-0.5 s, 1.5 s]; bins inside it so the reference masks nothing
        tbins = np.linspace(-0.5, 1.5, 21)
        ref, _bins = ref_psth.psth(trl.copy(), trl_start=1000, onset=-500, trl_end=3000,
                                   chan_unit_combs=combs, tbins=tbins, output=output,
                                   samplerate=1000)
        ref = np.asarray(ref, dtype=float)
        assert not np.isnan(ref).any()

        from syncopy_tpu.statistics.psth import get_chan_unit_combs, psth

        combs2 = get_chan_unit_combs([trl])
        assert np.array_equal(np.asarray(combs), np.asarray(combs2))
        got = psth(trl, trl_start=1000, onset=-500, trl_end=3000,
                   chan_unit_combs=combs2, tbins=tbins, output=output,
                   samplerate=1000)
        assert np.allclose(np.asarray(got, dtype=float), ref, atol=1e-10), output

    def test_bin_rules_match(self):
        ref_psth = _load("refspy.statistics.psth", "statistics/psth.py", pkg="refspy.statistics")
        from syncopy_tpu.statistics.psth import Rice_rule, sqrt_rule

        for n in (10, 100, 1234):
            assert Rice_rule(n) == ref_psth.Rice_rule(n)
            assert sqrt_rule(n) == ref_psth.sqrt_rule(n)


class TestWaveletAnalysisParity:
    def test_class_methods_match(self, ref_wavelets):
        """s0, optimal scales, delta transform, C_d, and wavelet variance of
        the object-oriented wrapper match the reference class."""
        wavmod, tramod = ref_wavelets
        rng = np.random.default_rng(51)
        sig = (np.sin(2 * np.pi * 12 * np.arange(400) / 200.0)
               + 0.2 * rng.normal(size=400))
        dt, dj = 1 / 200.0, 0.125
        ref = tramod.WaveletTransform(data=sig.copy(), dt=dt, dj=dj,
                                      wavelet=wavmod.Morlet(6), axis=-1)

        from syncopy_tpu.ops.wavelet import Morlet, WaveletAnalysis

        ours = WaveletAnalysis(sig, dt=dt, dj=dj, wavelet=Morlet(6))
        assert ours.s0 == pytest.approx(ref.s0, rel=1e-9)
        assert np.allclose(ours.compute_optimal_scales(), ref.compute_optimal_scales(), rtol=1e-9)
        ours.scales = np.asarray(ref.scales)
        assert np.allclose(ours.wavelet_transform_delta, ref.wavelet_transform_delta, atol=1e-9)
        assert ours.C_d == pytest.approx(ref.C_d, rel=1e-9)
        assert ours.compute_Cdelta() == pytest.approx(ref.compute_Cdelta(), rel=1e-6)
        # transform + variance use the same cwt normalization
        W_ref = ref.wavelet_transform
        W_ours = ours.wavelet_transform[:, :, 0]
        scale = np.abs(W_ref).max()
        assert np.abs(W_ours - W_ref).max() / scale < 5e-5
        assert float(ours.wavelet_variance) == pytest.approx(float(ref.wavelet_variance), rel=1e-3)
