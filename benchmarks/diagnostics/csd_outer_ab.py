"""A/B the per-trial CSD channel outer product on the axon TPU.

The csd_device row (keeptrials=True stack of single-trial CSDs) sits at
~26 % of the HBM roofline. Measured facts from the first sweep (this
file's earlier revision): the einsum and the explicit VPU broadcast
form time identically (~15 ms for a 2.1 GB complex64 stack, ~137 GB/s),
flattening the trailing (C, C) dims into one lane axis is SLOWER
(reshape relayout), a pure f32 copy streams at 780+ GB/s while any
complex64-producing write caps at ~135 GB/s.

Hypothesis now under test: the complex64 OUTPUT dtype is the wall —
XLA stores complex64 interleaved (re, im) pairs, so the innermost
stride is 2 floats and the 128-lane vector stores are half-utilized
(the same pathology CLAUDE.md documents for tunnel readback of
trailing-dim-2 arrays, here for HBM stores). The production engine
already converts to a LEADING (re, im) pair axis at the jit boundary
(`parallel/device_io.py::encode`), so if an all-real pair-plane outer
product writes at f32 speed, the fix is to keep the whole kernel real
and never materialize complex64 at all.

Usage (TPU, not concurrently with another TPU process):
    python benchmarks/diagnostics/csd_outer_ab.py [n_trials] [n_chan]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from benchmarks.device_bench import _drain, _time_best  # noqa: E402
from syncopy_tpu.ops.connectivity import cross_spectra_trial  # noqa: E402
from syncopy_tpu.ops.spectral import mtmfft  # noqa: E402
from syncopy_tpu.ops.windows import make_tapers  # noqa: E402


def main(n_trials=128, n_samples=1000, n_chan=64, fs=1000.0):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n_trials, n_samples, n_chan), jnp.float32)
    x = jax.device_put(x)

    taps = jnp.asarray(make_tapers("hann", None, n_samples, n_samples, fs))

    def _specs(t):
        return mtmfft(t.astype(jnp.float32), taps, n_samples)  # (K, F, C)

    @jax.jit
    def stack_prod(xb):
        # current production path: complex64 (B, 1, F, C, C) stack
        return jax.vmap(
            lambda t: cross_spectra_trial(t, fs, n_samples, taper="hann")
        )(xb)

    @jax.jit
    def stack_prod_encoded(xb):
        # production path + the engine's boundary encode (leading pair
        # axis) fused into the same program
        cs = jax.vmap(
            lambda t: cross_spectra_trial(t, fs, n_samples, taper="hann")
        )(xb)
        return jnp.stack([cs.real, cs.imag])

    @jax.jit
    def stack_pairs(xb):
        # all-real pair-plane form: the complex dtype never exists.
        # s_i conj(s_j) = (ar+i ai)(br-i bi):
        #   re = ar br + ai bi ,  im = ai br - ar bi
        def one(t):
            s = _specs(t)[0]  # K=1: (F, C) complex
            ar, ai = jnp.real(s), jnp.imag(s)
            re = ar[:, :, None] * ar[:, None, :] + ai[:, :, None] * ai[:, None, :]
            im = ai[:, :, None] * ar[:, None, :] - ar[:, :, None] * ai[:, None, :]
            return re.astype(jnp.float32), im.astype(jnp.float32)
        re, im = jax.vmap(one)(xb)
        return jnp.stack([re, im])  # (2, B, F, C, C) f32

    a = stack_prod(x)
    b = stack_pairs(x)
    c = stack_prod_encoded(x)
    _drain(a); _drain(b); _drain(c)
    db = float(jnp.max(jnp.abs((jnp.real(a[:, 0]) - b[0])))) + float(
        jnp.max(jnp.abs((jnp.imag(a[:, 0]) - b[1]))))
    dc = float(jnp.max(jnp.abs(c[0] - jnp.real(a)))) + float(
        jnp.max(jnp.abs(c[1] - jnp.imag(a))))
    print(f"max|prod-pairs| = {db:.3e}   max|prod-encoded| = {dc:.3e}")
    del a, b, c

    out_bytes = n_trials * (n_samples // 2 + 1) * n_chan * n_chan * 8
    for name, fn in (("prod_c64", stack_prod),
                     ("prod_enc", stack_prod_encoded),
                     ("pairs", stack_pairs)):
        dt = _time_best(fn, (x,))
        gbs = out_bytes / dt / 1e9
        print(f"{name:9s} {dt*1e3:8.2f} ms   write {gbs:7.1f} GB/s   "
              f"{n_trials/dt:9.0f} trials/s")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*([args[0]] if len(args) > 0 else []),
         n_chan=args[1] if len(args) > 1 else 64)
