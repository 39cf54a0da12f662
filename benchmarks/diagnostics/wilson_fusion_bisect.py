# Second-stage bisection of the 128-ch fused-Granger divergence.
#
# wilson_fusion_experiment.py ruled OUT cross-junction algebraic
# simplification (optimization_barrier changes nothing: err 1536.52
# either way), while wilson_tpu_experiments.py showed the identical CSD
# converges when Wilson's input is a PROGRAM PARAMETER. Remaining
# variables, tested here on the same input (seed 7, 128 ch):
#
#   (c) two-program handoff, NO host roundtrip: jit(builder) -> device
#       (re, im) arrays -> jit(wilson). If this converges, splitting the
#       production program is a free fix (outputs stay in HBM).
#   (d) fused builder+wilson WITHOUT the granger() consumer — does the
#       extra consumer of (CSDreg, H, Sigma) change the loop compilation?
#   (e) the full fused program, but ALSO returning CSDreg as a program
#       output (forces faithful materialization of the internal value).
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


def _build(x):
    n = jnp.asarray(x.shape[0], dtype=jnp.int32)
    csd_avg = cr.process_batch_sum(x, n, **cr.cfg)[0] / x.shape[0]
    CSDreg, _, _ = regularize_csd(csd_avg.astype(jnp.complex64),
                                  cond_max=1e4, eps_max=1e-1)
    return jnp.real(CSDreg), jnp.imag(CSDreg)


def _factorize(re, im):
    CSD = (re + 1j * im).astype(jnp.complex64)
    H, Sigma, conv, err = wilson_sf(CSD, nIter=100, rtol=5e-6)
    return granger(CSD, H, Sigma), conv, err


def report(tag, out, t0):
    G, conv, err = out[:3]
    G = np.asarray(G)
    print(tag, json.dumps({
        "conv": bool(np.asarray(conv)), "err": float(np.asarray(err)),
        "g_max": float(np.nanmax(G)),
        "wall": round(time.perf_counter() - t0, 1)}), flush=True)


# (c) two programs, device-array handoff (no host roundtrip)
t0 = time.perf_counter()
re_d, im_d = jax.jit(_build)(x)
jax.block_until_ready(im_d)
report("(c) two-program device handoff",
       jax.jit(_factorize)(re_d, im_d), t0)

# (d) fused, no granger consumer
def _fused_nogranger(x):
    re, im = _build(x)
    CSD = (re + 1j * im).astype(jnp.complex64)
    H, Sigma, conv, err = wilson_sf(CSD, nIter=100, rtol=5e-6)
    return jnp.abs(H).max(), conv, err

t0 = time.perf_counter()
report("(d) fused, no granger consumer", jax.jit(_fused_nogranger)(x), t0)

# (e) fused, CSDreg also a program output
def _fused_csdout(x):
    re, im = _build(x)
    G, conv, err = _factorize(re, im)
    return G, conv, err, re

t0 = time.perf_counter()
out = jax.jit(_fused_csdout)(x)
report("(e) fused + CSDreg materialized as output", out, t0)

# cross-check the fused program's CSD against the two-program one
re_fused = np.asarray(out[3])
print("CSD delta fused-vs-split:",
      float(np.abs(re_fused - np.asarray(re_d)).max()), flush=True)
