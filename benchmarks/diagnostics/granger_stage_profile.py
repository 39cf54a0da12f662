# -*- coding: utf-8 -*-
#
# Stage-level profile of the device Granger program on the axon TPU:
# where do the ~385 ms go? (VERDICT r4 action #1 — the one north-star
# metric flat since round 3.)
#
#   python benchmarks/diagnostics/granger_stage_profile.py [n_chan]
#
# Stages timed independently (each its own jitted program, device-resident
# inputs, _time_best drain methodology):
#   build         — production exact_fft CSD build (csd_sum_df32)
#   build_dft     — compensated double-f32 DFT alone
#   build_gram    — compensated Gram (+cross terms) alone
#   regularize    — regularize_csd (batched eigvalsh dominates?)
#   eigvalsh      — the (F, N, N) Hermitian eigendecomposition alone
#   cholesky      — batched cholesky of the CSD (one-time phase-1 cost)
#   lu_inv        — batched jnp.linalg.inv (the LU fallback cost)
#   ns3           — 3-round Newton-Schulz refresh (6 GEMMs)
#   plus_fft      — one-sided plus operator, irfft/rfft form
#   plus_gemm     — one-sided plus operator, 4-GEMM matmul form
#   phase1_scan10 — 10 mirrored phase-1 iterations (per-iter cost /10)
#   refine_resid  — one compensated df32 residual evaluation
#   wilson        — production wilson_sf (while_loop, phase1 + refine)
#   factorize     — production regularize+wilson+granger program
# plus iteration-count traces: phase-1 err per iteration (where does it
# cross the 1e-3 handover?) and refine err per iteration.

import json
import sys

import numpy as np


def main(n_chan=64, n_trials=1000, n_samples=1000):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from benchmarks.device_bench import _time_best
    from syncopy_tpu.connectivity.ST_compRoutines import CrossSpectra
    from syncopy_tpu.ops.connectivity import (
        _plus_operator_onesided_gemm,
        _wilson_refine,
        csd_sum_compensated,
        granger,
        regularize_csd,
        rfft_df32,
        wilson_sf,
    )
    from syncopy_tpu.synthdata import ar2_network_device

    fs = 1000.0
    adj = np.zeros((n_chan, n_chan), dtype=np.float32)
    adj[1, 0] = 0.25
    x = ar2_network_device(n_trials, AdjMat=adj, nSamples=n_samples, seed=7)
    jax.block_until_ready(x)

    cr = CrossSpectra(samplerate=fs, nSamples=n_samples, taper="hann",
                      taper_opt=None, demean_taper=True, polyremoval=0,
                      exact_fft=True)

    def build(x):
        n = jnp.asarray(x.shape[0], dtype=jnp.int32)
        csd_avg = cr.process_batch_sum(x, n, **cr.cfg)[0] / x.shape[0]
        csd_avg = csd_avg.astype(jnp.complex64)
        return jnp.real(csd_avg), jnp.imag(csd_avg)

    def build_dft(x):
        tapered, K, nfft = cr._tapered_batch(x, cr.cfg)
        B, Kt, T, C = tapered.shape
        x2d = jnp.transpose(tapered, (2, 0, 1, 3)).reshape(T, B * Kt * C)
        return rfft_df32(x2d, nfft)

    def _spec_hi(x):
        hr, lr, hi, li = build_dft(x)
        F = hr.shape[0]
        B, C = x.shape[0], x.shape[2]
        s = jax.lax.complex(
            jnp.transpose(hr.reshape(F, B, 1, C), (1, 2, 0, 3)),
            jnp.transpose(hi.reshape(F, B, 1, C), (1, 2, 0, 3)),
        )
        return s

    def build_gram(spec):
        return csd_sum_compensated(spec)

    def factorize(re, im):
        CSD = (re + 1j * im).astype(jnp.complex64)
        CSDreg, _, _ = regularize_csd(CSD, cond_max=1e4, eps_max=1e-1)
        H, Sigma, conv, err = wilson_sf(CSDreg, nIter=100, rtol=5e-6)
        return granger(CSDreg, H, Sigma), conv, err

    def reg_only(re, im):
        CSD = (re + 1j * im).astype(jnp.complex64)
        CSDreg, eps, ini = regularize_csd(CSD, cond_max=1e4, eps_max=1e-1)
        return jnp.real(CSDreg), jnp.imag(CSDreg), eps, ini

    def eig_only(re, im):
        CSD = (re + 1j * im).astype(jnp.complex64)
        CSDh = (CSD + jnp.conj(jnp.swapaxes(CSD, -1, -2))) / 2
        return jnp.linalg.eigvalsh(CSDh)

    def wilson_only(re, im):
        CSD = (re + 1j * im).astype(jnp.complex64)
        H, Sigma, conv, err = wilson_sf(CSD, nIter=100, rtol=5e-6)
        return jnp.abs(H), err

    # -- micro ops on the regularized CSD scale ---------------------------- #
    def chol(re, im):
        CSD = (re + 1j * im).astype(jnp.complex64)
        return jnp.linalg.cholesky(CSD)

    def lu_inv(re, im):
        psi = (re + 1j * im).astype(jnp.complex64)
        return jnp.linalg.inv(psi)

    def ns3(re, im, xr, xi):
        with jax.default_matmul_precision("highest"):
            psi = (re + 1j * im).astype(jnp.complex64)
            X = (xr + 1j * xi).astype(jnp.complex64)
            I = jnp.eye(psi.shape[1], dtype=psi.dtype)
            for _ in range(3):
                X = X @ (2 * I - psi @ X)
            return jnp.real(X), jnp.imag(X)

    def plus_fft(re, im):
        g = (re + 1j * im).astype(jnp.complex64)
        M = 2 * g.shape[0] - 2
        rdtype = jnp.float32
        beta = jnp.fft.irfft(g, n=M, axis=0).astype(rdtype)
        beta = beta.at[0].multiply(0.5)
        g0 = beta[0].astype(g.dtype)
        beta = beta.at[M // 2].multiply(0.5)
        beta = beta.at[M // 2 + 1 :].set(0.0)
        gp = jnp.fft.rfft(beta, axis=0).astype(g.dtype)
        return jnp.real(gp), jnp.imag(gp)

    def plus_gemm(re, im):
        with jax.default_matmul_precision("highest"):
            g = (re + 1j * im).astype(jnp.complex64)
            gp, g0 = _plus_operator_onesided_gemm(g, 2 * g.shape[0] - 2)
            return jnp.real(gp), jnp.imag(gp)

    def refine_resid(re, im, pr, pi):
        from syncopy_tpu.ops.connectivity import _csd_residual_df32

        with jax.default_matmul_precision("highest"):
            Rr, Ri = _csd_residual_df32(re, im, pr, pi)
            return Rr, Ri

    # mirrored phase-1 iteration as a fixed-length scan (records err)
    def phase1_scan(re, im, k=10):
        with jax.default_matmul_precision("highest"):
            CSD = (re + 1j * im).astype(jnp.complex64)
            rdtype = jnp.float32
            nFreq, N = CSD.shape[0], CSD.shape[1]
            I = jnp.eye(N, dtype=CSD.dtype)
            CSD = (CSD + jnp.conj(jnp.swapaxes(CSD, 1, 2))) / 2
            scale = jnp.mean(jnp.abs(jnp.diagonal(CSD, axis1=1, axis2=2)))
            CSD = CSD / scale
            CSDfull = jnp.concatenate([CSD, jnp.conj(CSD[nFreq - 2:0:-1])], axis=0)
            M = CSDfull.shape[0]
            diag_power = jnp.mean(jnp.abs(jnp.diagonal(CSD, axis1=1, axis2=2)), axis=1)
            valid_bin = (diag_power > 1e-9 * jnp.max(diag_power))[:, None, None]
            gamma0 = jnp.fft.fft(CSDfull, axis=0)[0]
            gamma0 = jnp.real((gamma0 + jnp.conj(gamma0.T)) / 2).astype(rdtype)
            psi0_init = jnp.linalg.cholesky(gamma0).T.astype(CSD.dtype)
            psi = jnp.tile(psi0_init, (nFreq, 1, 1))
            U = jnp.linalg.cholesky(CSD)
            X = jnp.tile(jnp.linalg.inv(psi0_init), (nFreq, 1, 1))
            from syncopy_tpu.ops.connectivity import _plus_operator_onesided

            def step(state, _):
                psi, psi0, X = state
                for _ in range(3):
                    X = X @ (2 * I - psi @ X)
                g = X @ U
                g = g @ jnp.conj(jnp.swapaxes(g, 1, 2))
                gI = g + I
                gI = jnp.where(valid_bin, gI, 2 * I)
                gplus, gplus_0 = _plus_operator_onesided(gI, M)
                S = jnp.triu(gplus_0)
                S = S - jnp.conj(S.T)
                psi_new = psi @ (gplus + S)
                psi0_new = psi0 @ (gplus_0 + S)
                CSDfac = psi_new @ jnp.conj(jnp.swapaxes(psi_new, 1, 2))
                rel = jnp.abs(CSD - CSDfac) / jnp.abs(CSD)
                err = jnp.max(jnp.where(valid_bin, rel, 0.0))
                return (psi_new, psi0_new, X), err

            (psi, psi0, X), errs = jax.lax.scan(
                step, (psi, psi0_init.astype(CSD.dtype), X), None, length=k)
            return errs

    res = {}
    build_j = jax.jit(build)
    re, im = build_j(x)
    jax.block_until_ready(re)
    reg_j = jax.jit(reg_only)
    rre, rim, eps, ini = reg_j(re, im)
    jax.block_until_ready(rre)
    spec = jax.jit(_spec_hi)(x)
    jax.block_until_ready(spec)
    # psi-scale operand for micro ops: cholesky of the regularized CSD
    chol_j = jax.jit(chol)
    U = chol_j(rre, rim)
    Ur, Ui = jnp.real(U), jnp.imag(U)
    jax.block_until_ready(Ur)
    Xinv = jax.jit(lu_inv)(Ur, Ui)
    Xr, Xi = jnp.real(Xinv), jnp.imag(Xinv)
    jax.block_until_ready(Xr)

    entries = [
        ("build", build_j, (x,)),
        ("build_dft", jax.jit(build_dft), (x,)),
        ("build_gram", jax.jit(build_gram), (spec,)),
        ("regularize", reg_j, (re, im)),
        ("eigvalsh", jax.jit(eig_only), (re, im)),
        ("cholesky", chol_j, (rre, rim)),
        ("lu_inv", jax.jit(lu_inv), (Ur, Ui)),
        ("ns3", jax.jit(ns3), (Ur, Ui, Xr, Xi)),
        ("plus_fft", jax.jit(plus_fft), (Ur, Ui)),
        ("plus_gemm", jax.jit(plus_gemm), (Ur, Ui)),
        ("refine_resid", jax.jit(refine_resid), (rre, rim, Ur, Ui)),
        ("phase1_scan10", jax.jit(lambda a, b: phase1_scan(a, b, 10)), (rre, rim)),
        ("wilson", jax.jit(wilson_only), (rre, rim)),
        ("factorize", jax.jit(factorize), (re, im)),
    ]
    for name, fn, args in entries:
        try:
            jax.block_until_ready(fn(*args))  # compile
            dt = _time_best(fn, args, repeats=3)
            res[name] = round(dt, 5)
            print(json.dumps({name: res[name]}), flush=True)
        except Exception as exc:
            res[name] = "ERR: " + str(exc).splitlines()[0][:160]
            print(json.dumps({name: res[name]}), flush=True)

    # iteration-count traces
    try:
        errs = jax.jit(lambda a, b: phase1_scan(a, b, 30))(rre, rim)
        errs = np.asarray(jax.device_get(errs))
        res["phase1_errs"] = [float(f"{e:.3e}") for e in errs]
        below = np.nonzero(errs < 1e-3)[0]
        res["phase1_iters_to_1e-3"] = int(below[0]) + 1 if below.size else None
    except Exception as exc:
        res["phase1_errs"] = "ERR: " + str(exc).splitlines()[0][:160]
    print(json.dumps(res, indent=1))
    return res


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["n_chan"] = int(sys.argv[1])
    main(**kw)
