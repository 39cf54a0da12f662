# -*- coding: utf-8 -*-
#
# ASV-style benchmark suite (mirrors the scenarios of reference
# benchmarks/benchmarks.py:8-81, rebuilt for syncopy_tpu).
#
# Run standalone:  python benchmarks/benchmarks.py

import numpy as np

import syncopy_tpu as spy


def _mk_adata(nSamples=25000, nChannels=32, nTrials=250, samplerate=1000.0, seed=42):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(nTrials * nSamples, nChannels)).astype("f4")
    trl = np.zeros((nTrials, 3))
    trl[:, 0] = np.arange(nTrials) * nSamples
    trl[:, 1] = trl[:, 0] + nSamples
    ad = spy.AnalogData(data=data, samplerate=samplerate)
    ad.trialdefinition = trl
    return ad


class SelectionSuite:
    """Channel selections on AnalogData (reference benchmarks.py:8-23)."""

    def setup(self):
        self.adata = _mk_adata()

    def time_external_channel_selection(self):
        spy.selectdata(self.adata, channel=[0, 1, 2, 3])

    def time_inplace_channel_selection(self):
        self.adata.selectdata(channel=[0, 1, 2, 3], inplace=True)
        self.adata.selection = None


class MTMFFT:
    """Multitapered FFT (reference benchmarks.py:26-39)."""

    def setup(self):
        self.adata = _mk_adata(nSamples=5000)

    def time_mtmfft_untapered(self):
        spy.freqanalysis(self.adata, taper=None)

    def time_mtmfft_multitaper(self):
        spy.freqanalysis(self.adata, tapsmofrq=2)


class Arithmetic:
    """Operator-overload passes (reference benchmarks.py:42-61)."""

    def setup(self):
        self.adata = _mk_adata()

    def time_scalar_mult(self):
        _ = 2 * self.adata

    def time_scalar_add(self):
        _ = 2 + self.adata

    def time_dset_add(self):
        _ = self.adata + self.adata


class Connectivity:
    """Coherence + Granger (driver north-star additions)."""

    def setup(self):
        self.adata = _mk_adata(nSamples=1000, nChannels=64, nTrials=250)

    def time_coherence(self):
        spy.connectivityanalysis(self.adata, method="coh", tapsmofrq=2)

    def time_granger(self):
        spy.connectivityanalysis(self.adata, method="granger")


class MemSuite:
    """Memory footprints (reference benchmarks.py:64-81)."""

    def setup(self):
        self.adata = _mk_adata(nSamples=10000)

    def mem_analogdata(self):
        return self.adata

    def peakmem_mtmfft(self):
        spy.freqanalysis(self.adata, tapsmofrq=2)


def run_all():
    """Run every suite; returns {suite.bench: value} (seconds for time_*,
    MB for mem_* payload/trial sizes and peakmem_* RSS high-water marks)."""
    import resource
    import time

    results = {}
    for suite_cls in (SelectionSuite, MTMFFT, Arithmetic, Connectivity, MemSuite):
        suite = suite_cls()
        suite.setup()
        for name in sorted(dir(suite)):
            key = "{}.{}".format(suite_cls.__name__, name)
            fn = getattr(suite, name)
            if name.startswith("time_"):
                fn()  # warm-up/compile
                t0 = time.perf_counter()
                fn()
                results[key] = round(time.perf_counter() - t0, 4)
                print("{}: {} s".format(key, results[key]))
            elif name.startswith("mem_"):
                # the object is HDF5-backed: report the full payload size
                # and what one materialized trial costs in RAM (h5py/numpy
                # buffers bypass tracemalloc, so sizes come from nbytes)
                obj = fn()
                arr = obj.trials[0][()]
                results[key + "_payload_MB"] = round(
                    float(np.prod(obj.data.shape)) * obj.data.dtype.itemsize / 2**20, 2
                )
                results[key + "_per_trial_MB"] = round(arr.nbytes / 2**20, 2)
                del arr
                print("{}: payload {} MB, {} MB/trial".format(
                    key, results[key + "_payload_MB"], results[key + "_per_trial_MB"]))
            elif name.startswith("peakmem_"):
                before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
                fn()
                after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
                # ru_maxrss is a high-water mark (KB on linux): report the
                # run's peak RSS and the growth it caused
                results[key + "_peak_MB"] = round(after / 1024, 1)
                results[key + "_growth_MB"] = round((after - before) / 1024, 1)
                print("{}: peak {} MB".format(key, results[key + "_peak_MB"]))
    return results


if __name__ == "__main__":
    import json

    print(json.dumps(run_all()))
