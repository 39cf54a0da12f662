# TPU side: run wilson_sf on the CPU-built (known-good, f32-convergent)
# CSD at the failing shape. Complex cannot cross the tunnel: upload re/im
# separately, combine on device inside jit.
import sys, json, time
import numpy as np
import jax
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
from syncopy_tpu.ops.connectivity import wilson_sf

z = np.load("/tmp/csd128_cpu.npz")
re, im = z["re"].astype(np.float32), z["im"].astype(np.float32)

@jax.jit
def kernel_health(re, im):
    # batched linalg primitive health at N=128 on this platform, measured
    # on the actual Wilson operands (scaled Hermitian CSD + its Cholesky)
    CSD = (re + 1j * im).astype(jnp.complex64)
    C = (CSD + jnp.conj(jnp.swapaxes(CSD, 1, 2))) / 2
    scale = jnp.mean(jnp.abs(jnp.diagonal(C, axis1=1, axis2=2)))
    Cs = C / scale
    N = Cs.shape[1]
    Ident = jnp.eye(N, dtype=Cs.dtype)
    with jax.default_matmul_precision("highest"):
        U = jnp.linalg.cholesky(Cs)
        u_bad = jnp.logical_not(jnp.isfinite(jnp.abs(U)).all(axis=(1, 2))).sum()
        chol_res = jnp.max(jnp.abs(U @ jnp.conj(jnp.swapaxes(U, 1, 2)) - Cs))
        X = jnp.linalg.inv(Cs)
        inv_res = jnp.abs(Ident - Cs @ X).max(axis=(1, 2))
        # NS polish of the LU inverse: where does pure-GEMM refinement floor?
        Xp = X @ (2 * Ident - Cs @ X)
        Xp = Xp @ (2 * Ident - Cs @ Xp)
        ns_res = jnp.abs(Ident - Cs @ Xp).max(axis=(1, 2))
        # triangular-solve quality (cholesky-based inverse path)
        Ut = jnp.linalg.inv(U)
        tri_res = jnp.max(jnp.abs(Ident - U @ Ut))
    return (u_bad, chol_res, jnp.max(inv_res), jnp.median(inv_res),
            jnp.max(ns_res), jnp.median(ns_res), tri_res)

@jax.jit
def prog(re, im):
    CSD = (re + 1j * im).astype(jnp.complex64)
    H, Sigma, conv, err = wilson_sf(CSD, nIter=100, rtol=5e-6)
    return conv, err, jnp.max(jnp.abs(H))

for tag, r_, i_ in [("N=128", re, im),
                    ("N=64 control", re[:, :64, :64], im[:, :64, :64])]:
    t0 = time.perf_counter()
    vals = [np.asarray(v) for v in kernel_health(r_, i_)]
    print(tag, json.dumps({
        "chol_bad_bins": int(vals[0]), "chol_resid": float(vals[1]),
        "inv_res_max": float(vals[2]), "inv_res_med": float(vals[3]),
        "ns_res_max": float(vals[4]), "ns_res_med": float(vals[5]),
        "tri_res": float(vals[6]),
        "wall": round(time.perf_counter() - t0, 1)}), flush=True)

t0 = time.perf_counter()
conv, err, hmax = [np.asarray(v) for v in prog(re, im)]
print("wilson on CPU-built CSD:",
      json.dumps({"tpu_conv": bool(conv), "tpu_err": float(err),
                  "h_max": float(hmax),
                  "wall": round(time.perf_counter() - t0, 1)}), flush=True)

# ---- part 3: TPU-built CSD at the same shape, dumped for a CPU check ---- #
from syncopy_tpu.synthdata import ar2_network_device
from syncopy_tpu.connectivity.ST_compRoutines import CrossSpectra
from syncopy_tpu.ops.connectivity import regularize_csd

n_chan, n_samples, n_trials = 128, 1000, 1000
adj = np.zeros((n_chan, n_chan), dtype=np.float32)
adj[1, 0] = 0.25
x = ar2_network_device(n_trials, AdjMat=adj, nSamples=n_samples, seed=7)
cr = CrossSpectra(samplerate=1000., nSamples=n_samples, taper="hann",
                  taper_opt=None, demean_taper=True, polyremoval=0, exact_fft=True)
n = jnp.asarray(x.shape[0], dtype=jnp.int32)

@jax.jit
def make_csd(x):
    csd = cr.process_batch_sum(x, n, **cr.cfg)[0] / x.shape[0]
    csd = csd.astype(jnp.complex64)
    CSDreg, eps, ini = regularize_csd(csd, cond_max=1e4, eps_max=1e-1)
    return jnp.stack([jnp.real(CSDreg), jnp.imag(CSDreg)]), eps, ini

t0 = time.perf_counter()
pair, eps, ini = make_csd(x)
pair_np = np.asarray(pair)
print("TPU CSD:", json.dumps({"eps": float(np.asarray(eps)),
                              "ini_cond": float(np.asarray(ini)),
                              "finite": bool(np.isfinite(pair_np).all()),
                              "wall": round(time.perf_counter() - t0, 1)}), flush=True)
np.savez("/tmp/csd128_tpu.npz", re=pair_np[0], im=pair_np[1])

# how far is the TPU CSD from the CPU one? (different AR realizations are
# NOT expected to match — this is a scale sanity print only)
dz = np.load("/tmp/csd128_cpu.npz")
print("CSD scale: tpu", float(np.abs(pair_np).max()), "cpu",
      float(np.abs(dz["re"] + 1j * dz["im"]).max()), flush=True)

# wilson on the TPU-built CSD, on the TPU (same compiled program as part 2)
t0 = time.perf_counter()
conv, err, hmax = [np.asarray(v) for v in prog(jnp.asarray(pair_np[0]),
                                               jnp.asarray(pair_np[1]))]
print("wilson on TPU-built CSD:",
      json.dumps({"tpu_conv": bool(conv), "tpu_err": float(err),
                  "h_max": float(hmax),
                  "wall": round(time.perf_counter() - t0, 1)}), flush=True)
