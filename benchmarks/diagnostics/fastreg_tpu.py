# -*- coding: utf-8 -*-
#
# A/B the wide-channel regularization paths on the axon TPU:
# eigvalsh (SPY_TPU_FAST_REG=0) vs Cholesky-bisection extents (=1), plus
# the full factorize program under each — the batched eigvalsh was 73 %
# of the 128-ch factorization wall (granger_stage_profile.py round 5).
#
#   python benchmarks/diagnostics/fastreg_tpu.py [n_chan]

import json
import os
import sys

import numpy as np


def main(n_chan=128, n_trials=1000, n_samples=1000):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from benchmarks.device_bench import _time_best
    from syncopy_tpu.connectivity.ST_compRoutines import CrossSpectra
    from syncopy_tpu.ops.connectivity import granger, regularize_csd, wilson_sf
    from syncopy_tpu.synthdata import ar2_network_device

    fs = 1000.0
    adj = np.zeros((n_chan, n_chan), dtype=np.float32)
    adj[1, 0] = 0.25
    x = ar2_network_device(n_trials, AdjMat=adj, nSamples=n_samples, seed=7)
    jax.block_until_ready(x)

    cr = CrossSpectra(samplerate=fs, nSamples=n_samples, taper="hann",
                      taper_opt=None, demean_taper=True, polyremoval=0,
                      exact_fft=True)

    @jax.jit
    def build(x):
        n = jnp.asarray(x.shape[0], dtype=jnp.int32)
        csd_avg = cr.process_batch_sum(x, n, **cr.cfg)[0] / x.shape[0]
        csd_avg = csd_avg.astype(jnp.complex64)
        return jnp.real(csd_avg), jnp.imag(csd_avg)

    re, im = build(x)
    jax.block_until_ready(re)

    res = {"n_chan": n_chan}
    G_by_mode = {}
    for mode in ("0", "1"):
        os.environ["SPY_TPU_FAST_REG"] = mode
        tag = "eig" if mode == "0" else "fast"

        def reg_only(re, im):
            CSD = (re + 1j * im).astype(jnp.complex64)
            CSDreg, eps, ini = regularize_csd(CSD, cond_max=1e4, eps_max=1e-1)
            return jnp.real(CSDreg), jnp.imag(CSDreg), eps, ini

        def factorize(re, im):
            CSD = (re + 1j * im).astype(jnp.complex64)
            CSDreg, _, _ = regularize_csd(CSD, cond_max=1e4, eps_max=1e-1)
            H, Sigma, conv, err = wilson_sf(CSDreg, nIter=100, rtol=5e-6)
            return granger(CSDreg, H, Sigma), conv, err

        reg_j = jax.jit(reg_only)
        out = reg_j(re, im)
        jax.block_until_ready(out[0])
        res["reg_" + tag] = round(_time_best(reg_j, (re, im), repeats=3), 5)
        res["eps_" + tag] = float(np.asarray(out[2]))
        res["ini_" + tag] = float(np.asarray(out[3]))

        fac_j = jax.jit(factorize)
        G, conv, err = fac_j(re, im)
        jax.block_until_ready(G)
        res["factorize_" + tag] = round(_time_best(fac_j, (re, im), repeats=3), 5)
        res["converged_" + tag] = bool(np.asarray(conv))
        res["err_" + tag] = float(np.asarray(err))
        G_by_mode[tag] = np.asarray(jax.device_get(G))
        print(json.dumps({k: v for k, v in res.items() if tag in k}), flush=True)

    res["granger_max_abs_diff"] = float(
        np.abs(G_by_mode["fast"] - G_by_mode["eig"]).max())
    print(json.dumps(res, indent=1))
    return res


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["n_chan"] = int(sys.argv[1])
    main(**kw)
