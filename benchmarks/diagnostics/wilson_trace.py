# Per-iteration trace of the Wilson phase-1 iteration (mirrors
# _wilson_sf_impl's step exactly, but as a fixed-length lax.scan recording
# err / ns_res / lu_floor / took_lu each iteration).
# Usage: python wilson_trace.py <csd.npz> [n_iter] [--lu] [--gforce]
import os, sys, json
import numpy as np
import jax
if os.environ.get("SPY_TRACE_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
from syncopy_tpu.ops.connectivity import _plus_operator_onesided

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/csd128_cpu.npz"
n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 30
force_lu = "--lu" in sys.argv
g_force = "--gforce" in sys.argv

z = np.load(path)
re, im = z["re"].astype(np.float32), z["im"].astype(np.float32)


def trace(re, im, nIter):
    with jax.default_matmul_precision("highest"):
        CSD = (re + 1j * im).astype(jnp.complex64)
        rdtype = jnp.float32
        nFreq, N = CSD.shape[0], CSD.shape[1]
        Ident = jnp.eye(N, dtype=CSD.dtype)
        CSD = (CSD + jnp.conj(jnp.swapaxes(CSD, 1, 2))) / 2
        scale = jnp.mean(jnp.abs(jnp.diagonal(CSD, axis1=1, axis2=2))).astype(rdtype)
        CSD = CSD / scale
        CSDfull = jnp.concatenate([CSD, jnp.conj(CSD[nFreq - 2:0:-1])], axis=0)
        M = CSDfull.shape[0]
        diag_power = jnp.mean(jnp.abs(jnp.diagonal(CSD, axis1=1, axis2=2)), axis=1)
        valid_bin = (diag_power > 1e-9 * jnp.max(diag_power))[:, None, None]
        gamma0 = jnp.fft.fft(CSDfull, axis=0)[0]
        gamma0 = jnp.real((gamma0 + jnp.conj(gamma0.T)) / 2).astype(rdtype)
        psi0_init = jnp.linalg.cholesky(gamma0).T.astype(CSD.dtype)
        psi_init = jnp.tile(psi0_init, (nFreq, 1, 1))
        U = jnp.linalg.cholesky(CSD)
        ns_thresh = 1e-6

        def _ns_refresh(psi, X, n=3):
            for _ in range(n):
                X = X @ (2 * Ident - psi @ X)
            return X

        def _lu_with_floor(psi):
            Xl = jnp.linalg.inv(psi)
            return Xl, jnp.max(jnp.abs(Ident - psi @ Xl)).astype(rdtype)

        def step(state, _):
            psi, psi0, X, lu_floor = state
            if force_lu:
                X, lu_floor = _lu_with_floor(psi)
                ns_res = jnp.asarray(jnp.nan, rdtype)
                took_lu = jnp.asarray(True)
            else:
                X = _ns_refresh(psi, X)
                res = jnp.abs(Ident - psi @ X)
                if g_force:
                    res = jnp.where(valid_bin, res, 0.0)
                ns_res = jnp.max(res)
                bar = jnp.maximum(jnp.asarray(ns_thresh, rdtype), 4 * lu_floor)
                took_lu = jnp.logical_not(ns_res <= bar)
                X, lu_floor = jax.lax.cond(
                    ns_res <= bar, lambda: (X, lu_floor), lambda: _lu_with_floor(psi))
            inv_res = jnp.max(jnp.abs(Ident - psi @ X))
            g = X @ U
            g = g @ jnp.conj(jnp.swapaxes(g, 1, 2))
            gI = g + Ident
            if g_force:
                gI = jnp.where(valid_bin, gI, 2 * Ident)
            gplus, gplus_0 = _plus_operator_onesided(gI, M)
            S = jnp.triu(gplus_0)
            S = S - jnp.conj(S.T)
            psi_new = psi @ (gplus + S)
            psi0_new = psi0 @ (gplus_0 + S)
            CSDfac = psi_new @ jnp.conj(jnp.swapaxes(psi_new, 1, 2))
            rel = jnp.abs(CSD - CSDfac) / jnp.abs(CSD)
            err = jnp.max(jnp.where(valid_bin, rel, 0.0))
            psi_max = jnp.max(jnp.abs(psi_new))
            return (psi_new, psi0_new, X, lu_floor), (
                err, ns_res, inv_res, lu_floor, took_lu, psi_max)

        X_init = jnp.tile(jnp.linalg.inv(psi0_init), (nFreq, 1, 1))
        floor_init = jnp.max(jnp.abs(Ident - psi_init @ X_init)).astype(rdtype)
        init = (psi_init, psi0_init, X_init, floor_init)
        _, tr = jax.lax.scan(step, init, None, length=nIter)
        return tr


tr = jax.jit(trace, static_argnums=2)(re, im, n_iter)
err, ns_res, inv_res, lu_floor, took_lu, psi_max = [np.asarray(t) for t in tr]
for i in range(n_iter):
    print(json.dumps({"it": i, "err": float(err[i]), "ns_res": float(ns_res[i]),
                      "inv_res": float(inv_res[i]), "lu_floor": float(lu_floor[i]),
                      "took_lu": bool(took_lu[i]), "psi_max": float(psi_max[i])}),
          flush=True)
