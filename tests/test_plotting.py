# -*- coding: utf-8 -*-
# Plotting smoke tests (modeled on reference tests/test_plotting.py).

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import syncopy_tpu as spy


class TestPlotting:
    def test_analog_single(self, adata_equal):
        fig, ax = spy.singlepanelplot(adata_equal, trials=0)
        assert fig is not None

    def test_analog_multi(self, adata_equal):
        fig, axs = spy.multipanelplot(adata_equal, trials=0)
        assert axs.size >= 4

    def test_spectral(self, adata_equal):
        spec = spy.freqanalysis(adata_equal, method="mtmfft", taper="hann", keeptrials=False)
        fig, ax = spy.singlepanelplot(spec)
        assert fig is not None
        fig, axs = spy.multipanelplot(spec)
        assert axs is not None

    def test_tfr_image(self):
        data = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=2, nSamples=500, nChannels=1)
        tf = spy.freqanalysis(data, method="mtmconvol", t_ftimwin=0.2, toi=0.5, taper="hann")
        fig, ax = spy.singlepanelplot(tf, trials=0)
        assert fig is not None

    def test_crossspectral(self):
        data = spy.synthdata.ar2_network(nTrials=10, samplerate=200, nSamples=500, seed=0)
        coh = spy.connectivityanalysis(data, method="coh", tapsmofrq=3)
        fig, ax = spy.singlepanelplot(coh, channel_i=0, channel_j=1)
        assert fig is not None

    def test_spike_raster(self):
        spd = spy.synthdata.poisson_noise(nTrials=3, nSpikes=900, nChannels=2, nUnits=2, samplerate=1000, seed=0)
        fig, ax = spy.singlepanelplot(spd, trials=0)
        assert fig is not None

    def test_selection_preserved(self, adata_equal):
        spy.singlepanelplot(adata_equal, trials=0, channel=[0, 1])
        assert adata_equal.selection is None
