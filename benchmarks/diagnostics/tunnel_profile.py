# -*- coding: utf-8 -*-
#
# Where does the WARM tunnel-bound headline call spend its wall-clock?
# (VERDICT r4 action #4: device rate 26.4k trials/s vs warm frontend
# 5.7k — measure the gap's composition before attacking it.)
#
#   python benchmarks/diagnostics/tunnel_profile.py [n_trials]
#
# Instruments one warm `connectivityanalysis(method="coh")` call by
# wrapping the engine's sync points:
#   upload    — jax.device_put / shard_batch time (host->device wire)
#   dispatch  — _dispatch_with_recovery thunks that enqueue chunk programs
#               (enqueue is async: cost here is dispatch RTT, not compute)
#   readback  — the final reduction fetch (device_get; the serialized
#               stream drains here, so this also absorbs device compute)
#   host      — everything else: planning, gather/pad/encode, numpy
#
# plus per-category call counts. The headline call is keeptrials=False:
# n_chunks dispatches + ONE reduction readback.

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(n_trials=1000, n_chan=64, n_samples=1000):
    import jax

    import syncopy_tpu as spy
    from syncopy_tpu.engine import routine as eng

    fs = 1000.0
    rng = np.random.default_rng(0)
    data = rng.normal(size=(n_trials * n_samples, n_chan)).astype("f4")
    trl = np.zeros((n_trials, 3))
    trl[:, 0] = np.arange(n_trials) * n_samples
    trl[:, 1] = trl[:, 0] + n_samples
    ad = spy.AnalogData(data=data, samplerate=fs)
    ad.trialdefinition = trl

    # warm up: compile every chunk executable + fill the HBM trial store?
    # NO trial store here: we want the full upload cost, so flush between
    # calls by bumping the cache token? Keep BOTH variants: store-hit
    # (repeat analysis) and store-miss (fresh data each call).
    spy.connectivityanalysis(ad, method="coh", tapsmofrq=2)

    stats = {}

    def wrap(name, fn):
        def inner(*a, **k):
            t0 = time.perf_counter()
            try:
                return fn(*a, **k)
            finally:
                dt = time.perf_counter() - t0
                c, t = stats.get(name, (0, 0.0))
                stats[name] = (c + 1, t + dt)
        return inner

    orig_dispatch = eng._dispatch_with_recovery
    orig_shard = eng.shard_batch

    def timed_dispatch(thunk, rebuild=None, what="device dispatch"):
        key = ("readback" if "readback" in what else "dispatch")
        t0 = time.perf_counter()
        try:
            return orig_dispatch(thunk, rebuild=rebuild, what=what)
        finally:
            dt = time.perf_counter() - t0
            c, t = stats.get(key, (0, 0.0))
            stats[key] = (c + 1, t + dt)

    eng._dispatch_with_recovery = timed_dispatch
    eng.shard_batch = wrap("upload", orig_shard)

    results = {}
    try:
        # store-hit warm call (the recorded tunnel_bound number's regime)
        stats.clear()
        t0 = time.perf_counter()
        spy.connectivityanalysis(ad, method="coh", tapsmofrq=2)
        total = time.perf_counter() - t0
        cat = {k: {"calls": c, "s": round(t, 4)} for k, (c, t) in stats.items()}
        accounted = sum(v["s"] for v in cat.values())
        cat["host_other"] = {"calls": 1, "s": round(total - accounted, 4)}
        results["store_hit"] = {"total_s": round(total, 4),
                                "trials_per_s": round(n_trials / total, 1),
                                **cat}

        # store-miss warm call: fresh payload (same shapes -> same
        # executables), so the upload wire cost is IN the measurement
        ad2 = spy.AnalogData(
            data=rng.normal(size=(n_trials * n_samples, n_chan)).astype("f4"),
            samplerate=fs)
        ad2.trialdefinition = trl
        stats.clear()
        t0 = time.perf_counter()
        spy.connectivityanalysis(ad2, method="coh", tapsmofrq=2)
        total = time.perf_counter() - t0
        cat = {k: {"calls": c, "s": round(t, 4)} for k, (c, t) in stats.items()}
        accounted = sum(v["s"] for v in cat.values())
        cat["host_other"] = {"calls": 1, "s": round(total - accounted, 4)}
        results["store_miss"] = {"total_s": round(total, 4),
                                 "trials_per_s": round(n_trials / total, 1),
                                 **cat}
    finally:
        eng._dispatch_with_recovery = orig_dispatch
        eng.shard_batch = orig_shard

    print(json.dumps(results, indent=1))
    return results


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
