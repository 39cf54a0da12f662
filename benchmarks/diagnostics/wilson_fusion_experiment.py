# Fusion discriminator for the 128-ch device Granger divergence.
#
# Established (wilson_tpu_experiments.py, 2026-08-18): the SAME TPU-built
# 128-ch CSD converges when Wilson runs as its own program (err 4.2e-8),
# and the batched-linalg kernel health at N=128 matches N=64 — yet the
# production one-program pipeline (CSD -> regularize -> wilson fused in a
# single jit, benchmarks/device_bench.py::_granger_program) diverged at
# the identical shape/seed. This script isolates the remaining variable:
# program structure. It runs, on the same input,
#   (a) the fused program (expected: reproduce the divergence),
#   (b) the fused program with jax.lax.optimization_barrier between the
#       regularized CSD and Wilson (blocks cross-boundary algebraic
#       simplification/fusion of the compensated arithmetic),
# and reports conv/err for each.
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from syncopy_tpu.connectivity.ST_compRoutines import CrossSpectra
from syncopy_tpu.ops.connectivity import granger, regularize_csd, wilson_sf
from syncopy_tpu.synthdata import ar2_network_device

n_chan, n_samples, n_trials = 128, 1000, 1000
adj = np.zeros((n_chan, n_chan), dtype=np.float32)
adj[1, 0] = 0.25
x = ar2_network_device(n_trials, AdjMat=adj, nSamples=n_samples, seed=7)
jax.block_until_ready(x)

cr = CrossSpectra(samplerate=1000.0, nSamples=n_samples, taper="hann",
                  taper_opt=None, demean_taper=True, polyremoval=0,
                  exact_fft=True)


def _pipeline(x, barrier):
    n = jnp.asarray(x.shape[0], dtype=jnp.int32)
    csd_avg = cr.process_batch_sum(x, n, **cr.cfg)[0] / x.shape[0]
    CSDreg, _, _ = regularize_csd(csd_avg.astype(jnp.complex64),
                                  cond_max=1e4, eps_max=1e-1)
    if barrier:
        re, im = jax.lax.optimization_barrier(
            (jnp.real(CSDreg), jnp.imag(CSDreg)))
        CSDreg = (re + 1j * im).astype(jnp.complex64)
    H, Sigma, conv, err = wilson_sf(CSDreg, nIter=100, rtol=5e-6)
    return granger(CSDreg, H, Sigma), conv, err


for tag, barrier in [("fused (production)", False),
                     ("fused + optimization_barrier", True)]:
    fn = jax.jit(lambda x, b=barrier: _pipeline(x, b))
    t0 = time.perf_counter()
    G, conv, err = fn(x)
    G = np.asarray(G)
    print(tag, json.dumps({
        "conv": bool(np.asarray(conv)), "err": float(np.asarray(err)),
        "g_max": float(np.nanmax(G)), "finite": bool(np.isfinite(G).all()),
        "wall": round(time.perf_counter() - t0, 1)}), flush=True)
