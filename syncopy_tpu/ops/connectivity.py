# -*- coding: utf-8 -*-
#
# Connectivity kernels: cross-spectra, coherence normalization,
# cross-covariance, Wilson spectral factorization, Granger causality, PPC.
#
# Parity targets: reference syncopy/connectivity/csd.py:16-175,
# wilson_sf.py:16-262, granger.py:10-80, ST_compRoutines.py:29-640,
# AV_compRoutines.py:35-484. TPU redesign notes:
#   - the per-channel-pair host loops (cross-covariance, csd) become
#     batched outer products / FFT convolutions on device;
#   - Wilson's iteration runs as a `lax.while_loop` over batched
#     (nFreq, N, N) cholesky/inverse/fft steps;
#   - the PPC O(nTrials^2) pair loop (reference
#     connectivity_analysis.py:624-667) collapses to the algebraic identity
#     sum_{j<k} cos(th_j - th_k) = (|sum_j u_j|^2 - n) / 2 with
#     u_j = z_j/|z_j| — an O(nTrials) reduction over the trial stack.

import numpy as np

import jax
import jax.numpy as jnp

from .spectral import detrend, mtmfft, spectral_convert
from .windows import make_tapers

__all__ = [
    "cross_spectra_trial",
    "spectral_dyadic_product",
    "normalize_csd",
    "normalize_ccov",
    "cross_covariance_trial",
    "wilson_sf",
    "regularize_csd",
    "granger",
    "ppc_from_spectra",
]


def cross_spectra_trial(trial, samplerate, nfft, taper="hann", taper_opt=None,
                        demean_taper=False, polyremoval=0, freq_idx=None):
    """
    Single-trial (multi-)tapered cross spectra: mtmfft + dyadic product,
    tapers averaged (reference csd.py:16-115, ST_compRoutines.py:270-430).

    Returns ``(1, nFreq, N, N)`` complex64.
    """
    x = detrend(trial.astype(jnp.float32), polyremoval, axis=0)
    tapers = jnp.asarray(
        make_tapers(taper, taper_opt, trial.shape[0], nfft, samplerate)
    )
    specs = mtmfft(x, tapers, nfft, demean_taper=demean_taper)  # (K, F, C)
    if freq_idx is not None:
        specs = jnp.take(specs, jnp.asarray(freq_idx), axis=1)
    # outer product over channels, mean over tapers: (F, C, C)
    CS = jnp.einsum(
        "kfi,kfj->fij", specs, jnp.conj(specs), precision=jax.lax.Precision.HIGHEST
    ) / specs.shape[0]
    return CS[None].astype(jnp.complex64)


def spectral_dyadic_product(spec, send_idx=None, rec_idx=None):
    """
    Cross spectra from complex (time-)frequency spectra: outer product over
    the channel axis, tapers averaged (reference ST_compRoutines.py:29-120).

    Parameters
    ----------
    spec : (nTime, nTaper, nFreq, nChannel) complex array
    send_idx, rec_idx : optional channel index arrays restricting the
        product to (senders x receivers) combinations

    Returns
    -------
    CS : (nTime, nFreq, nSend, nRec) complex64
    """
    if send_idx is not None:
        a = jnp.take(spec, jnp.asarray(send_idx), axis=3)
        b = jnp.take(spec, jnp.asarray(rec_idx), axis=3)
    else:
        a = b = spec
    CS = jnp.einsum(
        "tkfi,tkfj->tfij", a, jnp.conj(b), precision=jax.lax.Precision.HIGHEST
    ) / spec.shape[1]
    return CS.astype(jnp.complex64)


def normalize_csd(csd_av, output="abs"):
    """Coherency from a trial-averaged CSD: ``C_ij = S_ij/sqrt(S_ii S_jj)``
    (reference csd.py:118-175)."""
    diag = jnp.diagonal(csd_av, axis1=-2, axis2=-1)
    Ciijj = jnp.sqrt((diag[..., :, None] * diag[..., None, :]).real)
    return spectral_convert(csd_av / Ciijj, output)


def normalize_ccov(ccov_av):
    """Cross-correlation from trial-averaged cross-covariance: normalize
    by the 0-lag auto-covariances (reference AV_compRoutines.py:165-218)."""
    diag = jnp.diagonal(ccov_av[0, 0], axis1=-2, axis2=-1)
    Ciijj = jnp.sqrt(diag[:, None] * diag[None, :]).T
    return (ccov_av[:, 0] / Ciijj)[:, None].astype(jnp.float32)


def cross_covariance_trial(trial, polyremoval=0, norm=False):
    """
    Single-trial cross-covariance at non-negative lags via batched FFT
    correlation (reference ST_compRoutines.py:465-610 runs a per-pair
    fftconvolve host loop).

    Returns ``(nLags, 1, N, N)`` float32 with
    ``CC[l, 0, i, j] = sum_m x_i[m] x_j[m-l] / (T - l)``.
    """
    x = detrend(trial.astype(jnp.float32), polyremoval, axis=0)
    T = x.shape[0]
    n_lags = T // 2 if T % 2 == 0 else T // 2 + 1
    L = 1 << int(2 * T - 1).bit_length()
    X = jnp.fft.rfft(x, n=L, axis=0)  # (Lf, C)
    R = jnp.fft.irfft(X[:, :, None] * jnp.conj(X[:, None, :]), n=L, axis=0)
    lower = R[:n_lags]  # R_ij(l), used for i >= j
    # the reference fills the upper triangle by reversing the 'same'-mode
    # slice (ST_compRoutines.py:603-607), which lands on R_ij(-(l+1)) for
    # even trial lengths and R_ij(-l) for odd ones — reproduce exactly
    delta = 1 if T % 2 == 0 else 0
    neg_idx = (-(jnp.arange(n_lags) + delta)) % L
    upper = jnp.swapaxes(jnp.take(R, neg_idx, axis=0), 1, 2)
    n_chan = x.shape[1]
    low_mask = jnp.tril(jnp.ones((n_chan, n_chan), dtype=bool))
    CC = jnp.where(low_mask[None], lower, upper)
    overlap = jnp.arange(T, T - n_lags, -1).astype(jnp.float32)
    CC = CC / overlap[:, None, None]
    if norm:
        stds = jnp.std(x, axis=0)
        CC = CC / (stds[:, None] * stds[None, :])
    return CC[:, None, :, :].astype(jnp.float32)


# ------------------------------------------------------------------------ #
# Wilson spectral matrix factorization (reference wilson_sf.py:16-195)
# ------------------------------------------------------------------------ #


def _plus_operator(g):
    """The []+ operator via explicit Fourier transforms
    (reference wilson_sf.py:150-180)."""
    n_lag = g.shape[0] // 2
    beta = jnp.real(jnp.fft.ifft(g, axis=0)).astype(g.dtype)
    beta = beta.at[0].multiply(0.5)
    g0 = beta[0]
    beta = beta.at[n_lag].multiply(0.5)
    beta = beta.at[n_lag + 1 :].set(0.0)
    gp = jnp.fft.fft(beta, axis=0)
    return gp, g0


def wilson_sf(CSD, nIter=100, rtol=1e-6):
    """
    Wilson's analytic spectral matrix factorization
    ``CSD = psi @ psi^H`` returning the transfer function and noise
    covariance (reference wilson_sf.py:16-128). The per-frequency matrix
    operations run batched over the (two-sided) frequency axis; the
    iteration is a `lax.while_loop` with relative-error convergence check.

    Parameters
    ----------
    CSD : (nFreq, N, N) complex array (one-sided spectra)

    Returns
    -------
    Hfunc : (nFreq, N, N) transfer functions
    Sigma : (N, N) noise covariance
    converged : bool array (scalar)
    err : final max relative factorization error
    """
    with jax.default_matmul_precision("highest"):
        return _wilson_sf_impl(CSD, nIter, rtol)


def _wilson_sf_impl(CSD, nIter, rtol):
    # TPU matmuls default to bf16 accumulation, which makes the iteration
    # diverge — wilson_sf wraps this in default_matmul_precision("highest")
    cdtype = CSD.dtype
    rdtype = jnp.float64 if cdtype == jnp.complex128 else jnp.float32
    nFreq = CSD.shape[0]
    N = CSD.shape[1]
    Ident = jnp.eye(N, dtype=cdtype)

    # scale to unit mean auto-power: improves float32 conditioning; H is
    # scale-invariant and Sigma is rescaled at the end. Hermitize to remove
    # float rounding asymmetry from the upstream accumulation.
    CSD = (CSD + jnp.conj(jnp.swapaxes(CSD, 1, 2))) / 2
    scale = jnp.mean(jnp.abs(jnp.diagonal(CSD, axis1=1, axis2=2))).astype(rdtype)
    CSD = CSD / scale

    # attach negative frequencies
    CSDfull = jnp.concatenate([CSD, jnp.conj(CSD[nFreq - 2 : 0 : -1])], axis=0)

    # bins with negligible power (e.g. the demeaned DC bin is pure float
    # noise) cannot be factorized to relative tolerance and are excluded
    # from the convergence metric
    diag_power = jnp.mean(jnp.abs(jnp.diagonal(CSDfull, axis1=1, axis2=2)), axis=1)
    valid_bin = (diag_power > 1e-9 * jnp.max(diag_power))[:, None, None]

    # initialization: cholesky of the zero-lag covariance (wilson_sf.py:131-148)
    gamma0 = jnp.fft.fft(CSDfull, axis=0)[0]
    gamma0 = jnp.real((gamma0 + jnp.conj(gamma0.T)) / 2).astype(rdtype)
    psi0_init = jnp.linalg.cholesky(gamma0).T.astype(cdtype)
    psi_init = jnp.tile(psi0_init, (CSDfull.shape[0], 1, 1))

    U = jnp.linalg.cholesky(CSDfull)

    def step(state):
        psi, psi0, err, prev_err, it = state
        # explicit inverse + GEMM beats batched LU-solve here: the GEMM
        # runs on the MXU / threaded BLAS while batched triangular solves
        # serialize (measured 39s vs 53s per 30 iterations at 501x64)
        psi_inv = jnp.linalg.inv(psi)
        g = psi_inv @ U
        g = g @ jnp.conj(jnp.swapaxes(g, 1, 2))
        gplus, gplus_0 = _plus_operator(g + Ident)
        S = jnp.triu(gplus_0)
        S = S - jnp.conj(S.T)
        psi_new = psi @ (gplus + S)
        psi0_new = psi0 @ (gplus_0 + S)
        CSDfac = psi_new @ jnp.conj(jnp.swapaxes(psi_new, 1, 2))
        rel = jnp.abs(CSDfull - CSDfac) / jnp.abs(CSDfull)
        new_err = jnp.max(jnp.where(valid_bin, rel, 0.0))
        return psi_new, psi0_new, new_err.astype(rdtype), err, it + 1

    def cond(state):
        _, _, err, prev_err, it = state
        # fixed-point exit: only once the fit is already tight (err < 1e-2)
        # and progress has stopped — Wilson's error is non-monotonic early on
        plateau = jnp.logical_and(err < 1e-2, prev_err - err < 1e-4 * err)
        keep = jnp.logical_and(err >= rtol, it < nIter)
        return jnp.logical_and(keep, jnp.logical_not(plateau))

    init = (
        psi_init, psi0_init, jnp.asarray(jnp.inf, dtype=rdtype),
        jnp.asarray(jnp.inf, dtype=rdtype), jnp.asarray(0),
    )
    psi, psi0, err, _, _ = jax.lax.while_loop(cond, step, init)

    Sigma = (psi0 @ psi0.T) * scale
    Hfunc = psi @ jnp.linalg.inv(psi0)
    return Hfunc[:nFreq], Sigma, err < rtol, err


def regularize_csd(CSD, cond_max=1e3, eps_max=1e-3, nSteps=15):
    """
    Condition-number loading: add the smallest ``eps*I`` (log-spaced up to
    `eps_max`) that brings the worst per-frequency condition number below
    `cond_max` (reference wilson_sf.py:197-262). All candidates are
    evaluated batched; the selection is an argmax over a boolean mask.

    Returns (CSDreg, eps, initial_cond_num); ``eps = -1`` marks failure.
    """
    rdtype = jnp.float64 if CSD.dtype == jnp.complex128 else jnp.float32
    epsilons = jnp.concatenate(
        [jnp.zeros(1, rdtype), jnp.asarray(np.logspace(-10, np.log10(eps_max), nSteps), dtype=rdtype)]
    )
    I = jnp.eye(CSD.shape[1], dtype=CSD.dtype)
    cands = CSD[None] + epsilons[:, None, None, None] * I  # (E+1, F, N, N)
    conds = jnp.linalg.cond(cands).max(axis=1)  # (E+1,)
    ok = conds < cond_max
    ini_cond = conds[0]
    any_ok = jnp.any(ok)
    first_ok = jnp.argmax(ok)  # smallest epsilon that works (ordered ascending)
    chosen = jnp.where(any_ok, first_ok, len(epsilons) - 1)
    CSDreg = cands[chosen]
    eps = jnp.where(any_ok, epsilons[chosen], -1.0)
    return CSDreg, eps, ini_cond


def wilson_sf_host(CSD, nIter=100, rtol=1e-6):
    """
    Host-side float64 Wilson factorization — same algorithm as
    :func:`wilson_sf`, in numpy. Used when the device cannot run float64
    (JAX x64 disabled, e.g. TPU production configs): the factorization is
    numerically infeasible in float32 for wide channel counts, while its
    cost is negligible next to the trial-parallel CSD stage.
    """
    CSD = np.asarray(CSD, dtype=np.complex128)
    CSD = (CSD + np.conj(np.swapaxes(CSD, 1, 2))) / 2
    nFreq, N = CSD.shape[0], CSD.shape[1]
    Ident = np.eye(N)

    scale = np.mean(np.abs(np.einsum("fii->fi", CSD)))
    CSD = CSD / scale
    CSDfull = np.concatenate([CSD, np.conj(CSD[nFreq - 2 : 0 : -1])], axis=0)

    diag_power = np.mean(np.abs(np.einsum("fii->fi", CSDfull)), axis=1)
    valid_bin = (diag_power > 1e-9 * diag_power.max())[:, None, None]

    gamma0 = np.fft.fft(CSDfull, axis=0)[0]
    gamma0 = np.real((gamma0 + np.conj(gamma0.T)) / 2)
    psi0 = np.linalg.cholesky(gamma0).T
    psi = np.tile(psi0, (CSDfull.shape[0], 1, 1)).astype(np.complex128)
    psi0 = psi0.astype(np.complex128)

    U = np.linalg.cholesky(CSDfull)
    err = np.inf
    converged = False
    n_lag = CSDfull.shape[0] // 2
    prev_err = np.inf
    for _ in range(nIter):
        g = np.linalg.inv(psi) @ U  # inv+GEMM beats batched LU-solve (measured)
        g = g @ np.conj(np.swapaxes(g, 1, 2)) + Ident
        beta = np.real(np.fft.ifft(g, axis=0)).astype(np.complex128)
        beta[0] *= 0.5
        g0 = beta[0].copy()
        beta[n_lag] *= 0.5
        beta[n_lag + 1 :] = 0
        gplus = np.fft.fft(beta, axis=0)
        S = np.triu(g0)
        S = S - np.conj(S.T)
        psi = psi @ (gplus + S)
        psi0 = psi0 @ (g0 + S)
        CSDfac = psi @ np.conj(np.swapaxes(psi, 1, 2))
        rel = np.abs(CSDfull - CSDfac) / np.abs(CSDfull)
        err = float(np.max(np.where(valid_bin, rel, 0.0)))
        if err < rtol:
            converged = True
            break
        if err < 1e-2 and prev_err - err < 1e-4 * err:
            # fixed point above tolerance (typically a low-power bin whose
            # RELATIVE error floors while the absolute fit is tight) — no
            # further progress possible
            break
        prev_err = err

    Sigma = (psi0 @ psi0.T) * scale
    Hfunc = psi @ np.linalg.inv(psi0)
    return Hfunc[:nFreq], Sigma, converged, err


def regularize_csd_host(CSD, cond_max=1e3, eps_max=1e-3, nSteps=15):
    """Host-side counterpart of :func:`regularize_csd`."""
    CSD = np.asarray(CSD, dtype=np.complex128)
    I = np.eye(CSD.shape[1])
    ini = float(np.linalg.cond(CSD).max())
    if ini < cond_max:
        return CSD, 0.0, ini
    for eps in np.logspace(-10, np.log10(eps_max), nSteps):
        CSDreg = CSD + eps * I
        if float(np.linalg.cond(CSDreg).max()) < cond_max:
            return CSDreg, float(eps), ini
    return CSDreg, -1.0, ini


def granger(CSD, Hfunc, Sigma):
    """
    Pairwise Granger-Geweke causality, Eq. 8 of Dhamala et al. 2008
    (reference granger.py:10-80). ``Granger[:, i, j]`` is causality i -> j.
    """
    nChannels = CSD.shape[1]
    auto_spectra = jnp.abs(jnp.diagonal(CSD, axis1=1, axis2=2))  # (F, N)
    Smat = auto_spectra[:, None, :] * jnp.ones((nChannels, 1), dtype=auto_spectra.dtype)
    Hmat = jnp.abs(jnp.swapaxes(Hfunc, 1, 2)) ** 2
    SigmaJI = jnp.abs(Sigma.T)
    auto_cov = jnp.abs(jnp.diagonal(Sigma))
    SigmaII = auto_cov[None, :] * jnp.ones((nChannels, 1), dtype=auto_cov.dtype)
    denom = SigmaII.T - SigmaJI**2 / SigmaII
    denom = Smat - denom * Hmat
    return jnp.log(Smat / denom)


def granger_host(CSD, Hfunc, Sigma):
    """Host-side float64 counterpart of :func:`granger` (same Eq. 8)."""
    CSD, Hfunc, Sigma = (np.asarray(a) for a in (CSD, Hfunc, Sigma))
    nChannels = CSD.shape[1]
    auto_spectra = np.abs(np.einsum("fii->fi", CSD))
    Smat = auto_spectra[:, None, :] * np.ones((nChannels, 1))
    Hmat = np.abs(np.swapaxes(Hfunc, 1, 2)) ** 2
    SigmaJI = np.abs(Sigma.T)
    auto_cov = np.abs(np.diag(Sigma))
    SigmaII = auto_cov[None, :] * np.ones((nChannels, 1))
    denom = SigmaII.T - SigmaJI**2 / SigmaII
    denom = Smat - denom * Hmat
    return np.log(Smat / denom)


def ppc_from_spectra(cs_stack):
    """
    Pairwise phase consistency from the single-trial cross-spectral stack
    (Vinck 2010, Eq. 14). Uses the O(nTrials) resultant-vector identity
    instead of the reference's O(nTrials^2) pair loop
    (reference connectivity_analysis.py:624-667, ST_compRoutines.py:158-266):

        PPC = (|sum_j u_j|^2 - n) / (n (n - 1)),   u_j = z_j / |z_j|.
    """
    n = cs_stack.shape[0]
    u = cs_stack / jnp.abs(cs_stack)
    resultant = jnp.sum(u, axis=0)
    return ((jnp.abs(resultant) ** 2 - n) / (n * (n - 1))).astype(jnp.float32)
