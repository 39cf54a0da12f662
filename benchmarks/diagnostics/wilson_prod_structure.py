# Third-stage bisection: does the PRODUCTION AV-program structure diverge?
#
# wilson_fusion_bisect.py established at 128 ch (seed 7):
#   (c) builder+regularize | wilson+granger split    -> CONVERGES (4.2e-8)
#   (d) fused, no granger consumer                   -> diverges (1536.52)
#   (e) fused, CSDreg also a program output          -> diverges (1536.52)
#       ... and (e)'s materialized CSD matches (c)'s to 3.6e-12.
# The CSD data is identical; the Wilson while_loop itself compiles wrong
# when the CSD builder is co-resident in the program. The production
# frontend runs a DIFFERENT structure: the engine's ST program builds the
# averaged CSD, and the AV program (regularize + wilson + granger)
# receives it as a program parameter. Test exactly that here:
#
#   (f) builder (NO regularize) -> device handoff ->
#       jit(regularize + wilson + granger)          == production AV program
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


@jax.jit
def _build_raw(x):
    n = jnp.asarray(x.shape[0], dtype=jnp.int32)
    csd_avg = cr.process_batch_sum(x, n, **cr.cfg)[0] / x.shape[0]
    csd_avg = csd_avg.astype(jnp.complex64)
    return jnp.real(csd_avg), jnp.imag(csd_avg)


@jax.jit
def _av_program(re, im):
    # mirrors GrangerCausality.process_single_trial (AV_compRoutines.py)
    CSD = (re + 1j * im).astype(jnp.complex64)
    CSDreg, factor, ini = regularize_csd(CSD, cond_max=1e4, eps_max=1e-1)
    H, Sigma, conv, err = wilson_sf(CSDreg, nIter=100, rtol=5e-6)
    return granger(CSDreg, H, Sigma), conv, err, ini


t0 = time.perf_counter()
re_d, im_d = _build_raw(x)
jax.block_until_ready(im_d)
G, conv, err, ini = _av_program(re_d, im_d)
G = np.asarray(G)
print("(f) production AV structure (raw CSD param -> reg+wilson+granger)",
      json.dumps({
          "conv": bool(np.asarray(conv)), "err": float(np.asarray(err)),
          "ini_cond": float(np.asarray(ini)),
          "g_max": float(np.nanmax(G)),
          "wall": round(time.perf_counter() - t0, 1)}), flush=True)
