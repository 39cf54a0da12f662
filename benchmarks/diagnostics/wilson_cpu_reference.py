# CPU f32 reference at the exact failing shape: 128ch x 1000samp x 1000tr.
# Dumps the CPU-built CSD for a later TPU cross-check.
import os, sys, json, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
from syncopy_tpu.ops.connectivity import wilson_sf, regularize_csd
from syncopy_tpu.synthdata import ar2_network_device
from syncopy_tpu.connectivity.ST_compRoutines import CrossSpectra

n_chan, n_samples, n_trials = 128, 1000, 1000
adj = np.zeros((n_chan, n_chan), dtype=np.float32)
adj[1, 0] = 0.25
x = ar2_network_device(n_trials, AdjMat=adj, nSamples=n_samples, seed=7)
cr = CrossSpectra(samplerate=1000., nSamples=n_samples, taper="hann",
                  taper_opt=None, demean_taper=True, polyremoval=0, exact_fft=True)
n = jnp.asarray(x.shape[0], dtype=jnp.int32)
t0 = time.perf_counter()
csd = np.asarray(cr.process_batch_sum(x, n, **cr.cfg)[0]) / x.shape[0]
print(json.dumps({"csd_wall": round(time.perf_counter() - t0, 1)}), flush=True)
CSDreg, eps, ini = regularize_csd(jnp.asarray(csd, jnp.complex64), cond_max=1e4, eps_max=1e-1)
print(json.dumps({"eps": float(eps), "ini_cond": float(ini)}), flush=True)
reg = np.asarray(CSDreg)
np.savez("/tmp/csd128_cpu.npz", re=np.real(reg), im=np.imag(reg))
t0 = time.perf_counter()
H, Sigma, conv, err = wilson_sf(CSDreg, nIter=100, rtol=5e-6)
print(json.dumps({"cpu_conv": bool(np.asarray(conv)), "cpu_err": float(np.asarray(err)),
                  "wall": round(time.perf_counter() - t0, 1)}), flush=True)
