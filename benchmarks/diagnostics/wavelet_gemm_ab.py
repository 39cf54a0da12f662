# -*- coding: utf-8 -*-
#
# A/B the direct-GEMM wavelet/superlet convolution against the padded-FFT
# bank on the real TPU, at the device-bench shapes (T=1000, 64 ch).
#
#   PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/diagnostics/wavelet_gemm_ab.py
#
# The GEMM banks are passed as RUNTIME jit arguments (the engine's
# device-constant path) — embedding them as literals ships them inside the
# remote compile payload (65 s compile at 240 MB, HTTP 413 at 600 MB).

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from benchmarks.device_bench import _time_best
from syncopy_tpu.ops.wavelet import (
    Morlet, cwt, superlet, cwt_gemm_consts, superlet_gemm_consts,
)
from syncopy_tpu.synthdata import ar2_network_device


def main():
    fs = 1000.0
    n_chan, batch, T = 64, 64, 1000
    adj = np.zeros((n_chan, n_chan), dtype=np.float32)
    adj[1, 0] = 0.25
    x = ar2_network_device(batch, AdjMat=adj, nSamples=T, seed=7)
    jax.block_until_ready(x)

    foi = np.linspace(10.0, 150.0, 30)
    w_scales = np.asarray(Morlet(6).scale_from_period(1.0 / foi))
    sl_scales = (1.0 / np.linspace(10.0, 100.0, 15)) / (2 * np.pi)
    dt = 1.0 / fs

    os.environ["SPY_TPU_WAVELET_GEMM"] = "0"  # FFT reference paths

    @jax.jit
    def wav_fft(x):
        return jax.vmap(lambda t: jnp.abs(cwt(t, Morlet(6), w_scales, dt)) ** 2)(x)

    @jax.jit
    def sl_fft(x):
        return jax.vmap(
            lambda t: superlet(t, sl_scales, order_max=5, dt=dt,
                               magnitude_only=True) ** 2)(x)

    # GEMM paths: bank as runtime args
    os.environ["SPY_TPU_WAVELET_GEMM"] = "1"
    wbank = cwt_gemm_consts(Morlet(6), w_scales, dt, T)
    sbank = superlet_gemm_consts(sl_scales, 5, 1, 3, False, dt, T)
    print("bank bytes: wavelet %.0f MB, superlet %.0f MB"
          % (sum(a.nbytes for a in wbank) / 1e6,
             sum(a.nbytes for a in sbank) / 1e6), flush=True)
    wbank_d = tuple(jax.device_put(a) for a in wbank)
    sbank_d = tuple(jax.device_put(a) for a in sbank)
    jax.block_until_ready(wbank_d + sbank_d)

    @jax.jit
    def wav_gemm(x, br, bi):
        return jax.vmap(
            lambda t: jnp.abs(cwt(t, Morlet(6), w_scales, dt, bank=(br, bi))) ** 2)(x)

    @jax.jit
    def sl_gemm(x, br, bi):
        return jax.vmap(
            lambda t: superlet(t, sl_scales, order_max=5, dt=dt,
                               magnitude_only=True, bank=(br, bi)) ** 2)(x)

    os.environ["SPY_TPU_WAVELET_GEMM"] = "0"

    rows = [
        ("wavelet:fft", wav_fft, (x,)),
        ("wavelet:gemm", wav_gemm, (x,) + wbank_d),
        ("superlet:fft", sl_fft, (x,)),
        ("superlet:gemm", sl_gemm, (x,) + sbank_d),
    ]
    out = {}
    ref = {}
    for prec in (None, "high"):
        if prec is not None:
            os.environ["SPY_TPU_WAVELET_GEMM_PRECISION"] = prec
            rows = [(n + "_high", jax.jit(f.__wrapped__), a)
                    for n, f, a in rows if "gemm" in n]
        for name, prog, args in rows:
            t0 = time.time()
            res = prog(*args)
            jax.block_until_ready(res)
            compile_s = time.time() - t0
            dt_best = _time_best(prog, args, repeats=3)
            out[name] = batch / dt_best
            print(f"{name}: {batch / dt_best:.1f} trials/s "
                  f"(wall {dt_best * 1e3:.1f} ms, compile {compile_s:.1f} s)",
                  flush=True)
            small = np.asarray(jax.device_get(res[:2]))
            base = name.split(":")[0]
            if name.endswith("fft"):
                ref[base] = small
            else:
                rel = np.max(np.abs(small - ref[base])) / np.max(np.abs(ref[base]))
                print(f"  max rel err vs fft: {rel:.2e}", flush=True)

    print({k: round(v, 1) for k, v in out.items()})


if __name__ == "__main__":
    main()
