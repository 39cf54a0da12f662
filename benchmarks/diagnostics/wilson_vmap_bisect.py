# Fourth-stage bisection: the PRODUCTION frontend still diverges at
# 128 ch (err 1972.8, g_max 0.7010 — the fused-divergence signature)
# although wilson_prod_structure.py's hand-rolled "production structure"
# (f) converges. The engine's real AV program differs from (f) in three
# ways: jax.vmap over the trial batch (vmap REWRITES the Wilson
# lax.while_loop into its batched form), the (re, im) decode/encode
# wrappers, and the aux-info pytree. Peel them on the same CSD:
#
#   (g1) jit(vmap(one_trial)) over a batch of 1   — vmap alone
#   (g2) one_trial under jit, no vmap              — control (== (f))
#   (g3) the REAL GrangerCausality compiled program, driven exactly as
#        the engine drives it (decode_in_jit pairs + vmap + aux encode)
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from syncopy_tpu.connectivity.AV_compRoutines import GrangerCausality
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


@jax.jit
def _build_raw(x):
    n = jnp.asarray(x.shape[0], dtype=jnp.int32)
    csd_avg = cr.process_batch_sum(x, n, **cr.cfg)[0] / x.shape[0]
    csd_avg = csd_avg.astype(jnp.complex64)
    return jnp.real(csd_avg), jnp.imag(csd_avg)


re_d, im_d = _build_raw(x)
jax.block_until_ready(im_d)

gc = GrangerCausality(rtol=5e-6, nIter=100, cond_max=1e4)


def one_trial(trial):
    # trial: (1, F, N, N) complex — mirrors process_single_trial
    out, info = gc.process_single_trial(trial, **gc.cfg)
    return out, info["converged"], info["max rel. err"]


def report(tag, G, conv, err, t0):
    print(tag, json.dumps({
        "conv": bool(np.asarray(conv).all()),
        "err": float(np.asarray(err).max()),
        "g_max": float(np.nanmax(np.asarray(G))),
        "wall": round(time.perf_counter() - t0, 1)}), flush=True)


# complex must be assembled INSIDE jit on this platform
def _g2(re, im):
    trial = (re + 1j * im).astype(jnp.complex64)[None]
    return one_trial(trial)


def _g1(re, im):
    batch = (re + 1j * im).astype(jnp.complex64)[None, None]
    return jax.vmap(one_trial)(batch)


# (g2) control first (cheapest compile reuse check): no vmap
t0 = time.perf_counter()
G, conv, err = jax.jit(_g2)(re_d, im_d)
report("(g2) one_trial jit, no vmap", G, conv, err, t0)

# (g1) vmap over a batch of 1
t0 = time.perf_counter()
G, conv, err = jax.jit(_g1)(re_d, im_d)
report("(g1) jit(vmap(one_trial)), batch=1", G, conv, err, t0)

# (g3) the engine's real compiled program, driven as the engine drives it
from syncopy_tpu.parallel.device_io import encode_host

batch = np.asarray(re_d)[None, None] + 1j * np.asarray(im_d)[None, None]
enc, was_c = encode_host(batch.astype(np.complex64), axis=1)  # (1, 2, 1, F, N, N)
fn = gc._get_compiled(tuple(enc.shape), None, in_complex=True, aux_complex=())
t0 = time.perf_counter()
res = fn(jnp.asarray(enc), jnp.asarray(1, dtype=jnp.int32))
res, aux = (res if isinstance(res, tuple) else (res, None))
jax.block_until_ready(res)
conv = np.asarray(aux["converged"]) if aux else np.array(False)
err = np.asarray(aux["max rel. err"]) if aux else np.array(np.nan)
print("(g3) engine compiled program", json.dumps({
    "conv": bool(conv.all()), "err": float(err.max()),
    "wall": round(time.perf_counter() - t0, 1)}), flush=True)
