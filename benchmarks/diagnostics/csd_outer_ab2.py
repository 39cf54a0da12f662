"""Follow-up to csd_outer_ab.py: proper timing of the engine-encode form.

csd_outer_ab.py showed an all-real pair-plane CSD stack writes at
~550 GB/s while the complex64 stack caps at ~130 GB/s — but the
production-relevant variant (complex compute + boundary encode
``jnp.stack([cs.real, cs.imag])``, what the engine actually compiles)
could not be timed: its 2.1 GB output forces _time_best's inner=1, and
the tunnel's RTT jitter swamps a one-shot 4-16 ms kernel. Here each
variant runs at 64 trials (1.05 GB out) with an explicit 6-deep enqueue
and a single drain, min over 5 — buffer buildup stays ~6.3 GB.

Usage: python benchmarks/diagnostics/csd_outer_ab2.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from benchmarks.device_bench import _drain  # noqa: E402
from syncopy_tpu.ops.connectivity import cross_spectra_trial  # noqa: E402
from syncopy_tpu.ops.spectral import mtmfft  # noqa: E402
from syncopy_tpu.ops.windows import make_tapers  # noqa: E402


def time_enqueued(fn, args, depth=6, repeats=5):
    res = fn(*args)
    _drain(res)
    drain_cost = []
    for _ in range(3):
        t0 = time.perf_counter()
        _drain(res)
        drain_cost.append(time.perf_counter() - t0)
    drain_cost = min(drain_cost)
    best = float("inf")
    for _ in range(repeats):
        outs = []
        t0 = time.perf_counter()
        for _ in range(depth):
            outs.append(fn(*args))
        _drain(outs[-1])
        dt = (time.perf_counter() - t0 - drain_cost) / depth
        best = min(best, dt)
        del outs
    del res
    return max(best, 1e-6)


def main(n_trials=64, n_samples=1000, n_chan=64, fs=1000.0):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n_trials, n_samples, n_chan), jnp.float32)
    x = jax.device_put(x)

    taps = jnp.asarray(make_tapers("hann", None, n_samples, n_samples, fs))

    @jax.jit
    def stack_prod(xb):
        return jax.vmap(
            lambda t: cross_spectra_trial(t, fs, n_samples, taper="hann")
        )(xb)

    @jax.jit
    def stack_prod_encoded(xb):
        cs = jax.vmap(
            lambda t: cross_spectra_trial(t, fs, n_samples, taper="hann")
        )(xb)
        return jnp.stack([cs.real, cs.imag])

    @jax.jit
    def stack_pairs(xb):
        def one(t):
            s = mtmfft(t.astype(jnp.float32), taps, n_samples)[0]  # (F, C)
            ar, ai = jnp.real(s), jnp.imag(s)
            re = ar[:, :, None] * ar[:, None, :] + ai[:, :, None] * ai[:, None, :]
            im = ai[:, :, None] * ar[:, None, :] - ar[:, :, None] * ai[:, None, :]
            return re.astype(jnp.float32), im.astype(jnp.float32)
        re, im = jax.vmap(one)(xb)
        return jnp.stack([re, im])

    from syncopy_tpu.engine.routine import _flatten_for_readback

    @jax.jit
    def stack_prod_full(xb):
        # the EXACT production program tail for keeptrials=True: encode on
        # axis=1 then relayout to (N, 128) readback planes
        cs = jax.vmap(
            lambda t: cross_spectra_trial(t, fs, n_samples, taper="hann")
        )(xb)
        return _flatten_for_readback(jnp.stack([cs.real, cs.imag], axis=1))

    out_bytes = n_trials * (n_samples // 2 + 1) * n_chan * n_chan * 8
    for name, fn in (("prod_c64", stack_prod),
                     ("prod_enc", stack_prod_encoded),
                     ("prod_full", stack_prod_full),
                     ("pairs", stack_pairs)):
        dt = time_enqueued(fn, (x,))
        gbs = out_bytes / dt / 1e9
        print(f"{name:9s} {dt*1e3:8.2f} ms   write {gbs:7.1f} GB/s   "
              f"{n_trials/dt:9.0f} trials/s")


if __name__ == "__main__":
    main()
