#!/usr/bin/env python
# -*- coding: utf-8 -*-
#
# End-to-end smoke test on the REAL TPU (run manually; the CI suite runs on
# a virtual CPU mesh). Exercises every analysis family once and prints one
# OK line per path. Never run two TPU processes concurrently (see CLAUDE.md).

import os
import sys
import time

os.environ.setdefault("SPY_TPU_TRANSFER_DTYPE", "float16")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import syncopy_tpu as spy

    t_all = time.perf_counter()
    d = spy.synthdata.ar2_network(nTrials=60, samplerate=200, nSamples=500, seed=1)

    coh = spy.connectivityanalysis(d, method="coh", tapsmofrq=3)
    arr = np.asarray(coh.data)
    assert abs(coh.freq[np.argmax(arr[0, :, 0, 1])] - 40) < 6
    print("OK coherence (peak @40 Hz)")

    csd = spy.connectivityanalysis(d, method="csd", tapsmofrq=2)
    a = np.asarray(csd.data)[0]
    assert np.allclose(a, np.conj(np.swapaxes(a, -1, -2)), atol=1e-6)
    print("OK csd (Hermitian)")

    gr = spy.connectivityanalysis(d, method="granger")
    g = np.asarray(gr.data)
    f40 = np.argmin(np.abs(gr.freq - 40))
    assert g[0, f40, 1, 0] > 0.3 and g[0, f40, 0, 1] < 0.1
    print("OK granger (1->0 directionality, converged=%s)" % gr.info["converged"])

    corr = spy.connectivityanalysis(d, method="corr")
    assert np.asarray(corr.data)[0, 0, 0, 0] == np.float32(1.0) or \
        abs(np.asarray(corr.data)[0, 0, 0, 0] - 1) < 1e-4
    print("OK cross-correlation")

    spec = spy.freqanalysis(d, tapsmofrq=3)
    print("OK mtmfft", spec.data.shape)

    tfr = spy.freqanalysis(d, method="wavelet", foi=np.arange(10, 90, 5),
                           toi=np.linspace(0.2, 2.2, 50))
    print("OK wavelet TFR", tfr.data.shape)

    sup = spy.freqanalysis(d, method="superlet", foi=np.arange(10, 60, 5),
                           toi=np.linspace(0.2, 2.2, 30), order_max=8)
    print("OK superlet", sup.data.shape)

    w = spy.freqanalysis(d, method="welch", t_ftimwin=0.5, toi=0.5)
    print("OK welch (fused)", w.data.shape)

    filt = spy.preprocessing(d, filter_class="firws", filter_type="lp", freq=50)
    print("OK firws", filt.data.shape)

    b = spy.preprocessing(d, filter_class="but", filter_type="bp", freq=[8, 30],
                          order=4, zscore=True)
    print("OK butterworth+zscore", b.data.shape)

    r = spy.resampledata(d, resamplefs=100.0, method="resample")
    print("OK resample ->", r.samplerate, "Hz")

    h = spy.preprocessing(d, filter_class="firws", filter_type="lp", freq=40,
                          hilbert="abs")
    print("OK hilbert envelope", h.data.shape)

    four = spy.freqanalysis(d, tapsmofrq=3, output="fourier", keeptapers=True)
    i = spy.itc(spy.freqanalysis(d, method="mtmfft", taper="hann", output="fourier"))
    print("OK itc (max %.3f)" % float(np.asarray(i.data).max()))
    ppc = spy.connectivityanalysis(four, method="ppc")
    print("OK ppc", np.asarray(ppc.data).shape)

    tl = spy.timelockanalysis(d, covariance=True)
    print("OK timelock", tl.avg.shape, tl.cov.shape)

    spd = spy.synthdata.poisson_noise(nTrials=5, nSpikes=2000, nChannels=2,
                                      nUnits=2, samplerate=1000, seed=6)
    p = spy.spike_psth(spd, binsize=0.1, latency="minperiod")
    print("OK psth", p.data.shape)

    # device-resident pipeline chain: intermediates stay in HBM, the host
    # link is touched once for the final averaged coherence
    from syncopy_tpu.engine.resident import DeferredArray

    pre = spy.preprocessing(d, filter_class="but", filter_type="bp",
                            freq=[5, 80], order=4)
    spec_c = spy.freqanalysis(pre, method="mtmfft", output="fourier",
                              keeptrials=True)
    coh_c = spy.connectivityanalysis(spec_c, method="coh")
    resident = isinstance(pre._data, DeferredArray) and isinstance(
        spec_c._data, DeferredArray)
    print("OK resident chain", coh_c.data.shape, "(intermediates in HBM:",
          resident, ")")

    jk = spy.connectivityanalysis(d, method="coh", tapsmofrq=3, jackknife=True)
    print("OK jackknife coherence",
          np.asarray(jk._get_extra_dataset("jack_var")).shape)

    print("ALL OK in %.1fs" % (time.perf_counter() - t_all))


if __name__ == "__main__":
    main()
