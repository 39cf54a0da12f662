# -*- coding: utf-8 -*-
# Full-pipeline integration (BASELINE.md config #5, scaled):
# Butterworth filter -> resample -> Hilbert envelope -> mtmfft + Granger.

import numpy as np
import pytest

import syncopy_tpu as spy


class TestFullPipeline:
    def test_filter_resample_hilbert_spectrum_granger(self):
        # AR(2) network with 40 Hz resonance @ 200 Hz, upsampled scenario
        data = spy.synthdata.ar2_network(nTrials=60, samplerate=200, nSamples=2000, seed=7)

        filt = spy.preprocessing(data, filter_class="but", filter_type="bp", freq=[25, 55])
        rs = spy.resampledata(filt, method="downsample", resamplefs=100)
        assert rs.samplerate == 100
        assert np.asarray(rs.trials[0]).shape[0] == 1000

        env = spy.preprocessing(rs, filter_class="but", filter_type="lp", freq=45, hilbert="abs")
        assert np.all(np.asarray(env.data) >= 0)

        spec = spy.freqanalysis(rs, method="mtmfft", tapsmofrq=2, keeptrials=False)
        arr = np.asarray(spec.data)[0, 0, :, 0]
        peak = spec.freq[np.argmax(arr[5:]) + 5]
        assert 30 <= peak <= 50  # band-limited around the resonance

        gr = spy.connectivityanalysis(rs, method="granger")
        garr = np.asarray(gr.data)
        f40 = np.argmin(np.abs(gr.freq - 40))
        assert garr[0, f40, 1, 0] > garr[0, f40, 0, 1]  # direction preserved

        # provenance chain recorded end to end
        assert "preprocessing" in rs.cfg
        assert "resampledata" in rs.cfg
        assert "connectivityanalysis" in gr.cfg

    def test_pipeline_on_mesh(self, testmesh):
        data = spy.synthdata.ar2_network(nTrials=16, samplerate=200, nSamples=500, seed=8)
        with spy.use_mesh(testmesh):
            filt = spy.preprocessing(data, filter_class="firws", filter_type="lp", freq=60, order=200)
            coh = spy.connectivityanalysis(filt, method="coh", tapsmofrq=3)
        filt_seq = spy.preprocessing(data, filter_class="firws", filter_type="lp", freq=60, order=200)
        coh_seq = spy.connectivityanalysis(filt_seq, method="coh", tapsmofrq=3)
        assert np.allclose(np.asarray(coh.data), np.asarray(coh_seq.data), atol=1e-5)


class TestProfiler:
    def test_profile_context(self, tmp_path, adata_equal):
        with spy.profile(str(tmp_path / "traces")):
            spy.freqanalysis(adata_equal, method="mtmfft", taper="hann")
        import os

        assert any(os.scandir(str(tmp_path / "traces")))

    def test_timer(self):
        with spy.Timer() as t:
            sum(range(1000))
        assert t.seconds >= 0
