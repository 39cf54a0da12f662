# CPU-side cross-check: run wilson_sf (f32, CPU) on the TPU-built CSD dumped
# by wilson_tpu_experiments.py. Convergence here isolates the TPU CSD quality:
#   converges  -> the TPU CSD is fine; the device Wilson iteration is at fault
#   diverges   -> the TPU CSD construction itself is bad at this width
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

from syncopy_tpu.ops.connectivity import wilson_sf

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/csd128_tpu.npz"
z = np.load(path)
CSD = jnp.asarray((z["re"] + 1j * z["im"]).astype(np.complex64))
t0 = time.perf_counter()
H, Sigma, conv, err = wilson_sf(CSD, nIter=100, rtol=5e-6)
print(json.dumps({"src": path, "cpu_conv": bool(np.asarray(conv)),
                  "cpu_err": float(np.asarray(err)),
                  "wall": round(time.perf_counter() - t0, 1)}), flush=True)
