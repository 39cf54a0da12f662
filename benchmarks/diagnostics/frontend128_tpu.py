# End-to-end production-frontend verification at the 128-ch north-star
# width on the axon TPU, with the host-f64 fallback DISABLED so the raw
# device outcome is visible. Post vmap-bypass fix: converged, err 6.6e-8
# (2026-08-18). Before: err 1972.8 (the vmap-at-batch-1 miscompile).
import os, sys, time
os.environ["SPY_GRANGER_HOST_FALLBACK"] = "0"
os.environ["SPY_TPU_TRANSFER_DTYPE"] = "float16"
sys.path.insert(0, "/root/repo")
import numpy as np
import syncopy_tpu as spy
from syncopy_tpu.synthdata import ar2_network_batched

n_chan, n_samples, n_trials = 128, 1000, 1000
adj = np.zeros((n_chan, n_chan), dtype=np.float32)
adj[1, 0] = 0.25
t0 = time.perf_counter()
arr = np.asarray(ar2_network_batched(n_trials, AdjMat=adj, nSamples=n_samples, seed=7))
data = spy.AnalogData([a for a in arr], samplerate=1000.0)
print("gen+wrap", round(time.perf_counter() - t0, 1), "s", flush=True)

t0 = time.perf_counter()
res = spy.connectivityanalysis(data, method="granger", taper="hann", exact_fft=True)
print("cold", round(time.perf_counter() - t0, 1), "s", dict(res.info), flush=True)

t0 = time.perf_counter()
res2 = spy.connectivityanalysis(data, method="granger", taper="hann", exact_fft=True)
print("warm", round(time.perf_counter() - t0, 1), "s", dict(res2.info), flush=True)
print("g_max", float(np.nanmax(res2.data[:])), flush=True)
