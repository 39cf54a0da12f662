# -*- coding: utf-8 -*-
#
# Stage-level profile of the headline coherence program on the axon TPU:
# where do the 104 ms go, and what does the tiled pallas CSD change?
#
#   python benchmarks/diagnostics/coh_stage_profile.py
#
# Stages timed independently (each its own jitted program, device-resident
# inputs, _time_best drain methodology):
#   taper_fft      — detrend + taper multiply + rfft (the VPU/FFT stage)
#   mask_comp      — where-mask + csd_sum_compensated (old accumulator)
#   tiled          — csd_accumulate_tiled (new pallas accumulator)
#   full_old       — complete old coherence program (mask + compensated)
#   full_new       — complete new program (tiled, in-kernel mask)
# plus a numerical A/B of the two full programs.

import json
import sys

import numpy as np


def main(n_trials=1000, n_samples=1000, n_chan=64):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from benchmarks.device_bench import _time_best
    from syncopy_tpu.connectivity.ST_compRoutines import CrossSpectra
    from syncopy_tpu.ops.connectivity import csd_sum_compensated, normalize_csd
    from syncopy_tpu.ops.pallas_kernels import csd_accumulate_tiled, tiled_blocks_for
    from syncopy_tpu.ops.spectral import detrend
    from syncopy_tpu.ops.windows import make_tapers
    from syncopy_tpu.shared.input_processors import process_taper
    from syncopy_tpu.synthdata import ar2_network_device

    fs = 1000.0
    adj = np.zeros((n_chan, n_chan), dtype=np.float32)
    adj[1, 0] = 0.25
    x = ar2_network_device(n_trials, AdjMat=adj, nSamples=n_samples, seed=7)
    jax.block_until_ready(x)

    taper, taper_opt = process_taper(
        "hann", None, 2, None, keeptapers=False, foimax=fs / 2,
        samplerate=fs, nSamples=n_samples, output="pow",
    )
    taps = np.asarray(make_tapers(taper, taper_opt, n_samples, n_samples, fs))
    K = taps.shape[0]

    def taper_fft(x):
        xd = detrend(x.astype(jnp.float32), 0, axis=1)
        tapered = jnp.asarray(taps)[None, :, :, None] * xd[:, None, :, :]
        return jnp.fft.rfft(tapered, n=n_samples, axis=2)

    def taper_mmfft(x):
        from syncopy_tpu.ops.fft import rfft_via_matmul

        xd = detrend(x.astype(jnp.float32), 0, axis=1)
        tapered = jnp.asarray(taps)[None, :, :, None] * xd[:, None, :, :]
        return rfft_via_matmul(tapered, n_samples, axis=2)

    def mask_comp(spec):
        mask = (jnp.arange(spec.shape[0]) < n_trials)[:, None, None, None]
        spec = jnp.where(mask, spec, jnp.zeros((), spec.dtype))
        return csd_sum_compensated(spec) / K

    rb, fb = tiled_blocks_for(n_chan)

    def tiled(spec):
        B, Kt, F, C = spec.shape
        slab = spec.reshape(B * Kt, F, C)
        return csd_accumulate_tiled(
            jnp.real(slab), jnp.imag(slab), n_trials * Kt,
            row_block=rb, freq_block=fb,
        ) / K

    def full_old(x):
        cs = mask_comp(taper_fft(x)) / n_trials
        return normalize_csd(cs, "abs")

    def full_new(x):
        cs = tiled(taper_mmfft(x)) / n_trials
        return normalize_csd(cs, "abs")

    # the production CR path (should now match full_new)
    cr = CrossSpectra(samplerate=fs, nSamples=n_samples, taper=taper,
                      taper_opt=taper_opt, demean_taper=False, polyremoval=0)

    def production(x):
        n = jnp.asarray(x.shape[0], dtype=jnp.int32)
        cs_sum = cr.process_batch_sum(x, n, **cr.cfg)[0]
        return normalize_csd(cs_sum / x.shape[0], "abs")

    res = {}
    fns = {"taper_fft": taper_fft, "taper_mmfft": taper_mmfft,
           "full_old": full_old, "full_new": full_new,
           "production": production}
    jitted = {k: jax.jit(v) for k, v in fns.items()}
    spec = jax.jit(taper_fft)(x)
    jax.block_until_ready(spec)
    jitted["mask_comp"] = jax.jit(mask_comp)
    jitted["tiled"] = jax.jit(tiled)

    for name, fn in jitted.items():
        arg = spec if name in ("mask_comp", "tiled") else x
        jax.block_until_ready(fn(arg))  # compile
        dt = _time_best(fn, (arg,), repeats=3)
        res[name] = {"wall_s": round(dt, 4),
                     "trials_per_s": round(n_trials / dt, 1)}
        print(json.dumps({name: res[name]}), flush=True)

    # numerical A/B on the max |old - new| REDUCED ON DEVICE (scalar
    # readbacks only: full-array device_get of these results hit an
    # UNIMPLEMENTED runtime error through the tunnel)
    try:
        dev = jax.jit(lambda x: (
            jnp.max(jnp.abs(jitted["full_old"](x) - jitted["full_new"](x))),
            jnp.max(jnp.abs(jitted["full_new"](x) - jitted["production"](x))),
        ))(x)
        res["coh_dev_old_vs_new"] = float(np.asarray(jax.device_get(dev[0])))
        res["coh_dev_new_vs_production"] = float(np.asarray(jax.device_get(dev[1])))
    except Exception as exc:  # keep the timing table even if A/B flakes
        res["ab_error"] = str(exc).splitlines()[0][:200]
    print(json.dumps(res, indent=1))
    return res


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["n_chan"] = int(sys.argv[1])
    main(**kw)
