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


class TestPlottingDepth:
    """Artist-level assertions for the round-2 parity features: TF image
    multipanel, spike raster grouping/labels, ax reuse/overlay
    (reference mp_plotting.py:90-152, spike_plotting.py:21-180)."""

    @pytest.fixture()
    def tf_spec(self):
        data = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=2,
                                      nSamples=500, nChannels=4)
        return spy.freqanalysis(data, method="mtmconvol", t_ftimwin=0.2,
                                toi="all", taper="hann")

    @pytest.fixture()
    def spikes(self):
        return spy.synthdata.poisson_noise(nTrials=4, nSpikes=800, nChannels=3,
                                           nUnits=5, samplerate=1000, seed=1)

    def test_tf_multipanel_one_image_per_channel(self, tf_spec):
        fig, axs = spy.multipanelplot(tf_spec, trials=0)
        images = [im for ax in axs.flatten() for im in ax.get_images()]
        assert len(images) == 4
        # shared color scale across panels
        vmaxes = {im.norm.vmax for im in images}
        assert len(vmaxes) == 1
        titles = [ax.get_title() for ax in axs.flatten()[:4]]
        assert all(t for t in titles)

    def test_tf_single_panel_title(self, tf_spec):
        fig, ax = spy.singlepanelplot(tf_spec, trials=0, channel=2)
        assert len(ax.get_images()) == 1

    def test_raster_unit_vs_channel_grouping(self, spikes):
        fig, ax_u = spy.singlepanelplot(spikes, trials=0, on_yaxis="unit")
        fig, ax_c = spy.singlepanelplot(spikes, trials=0, on_yaxis="channel")
        # y tick labels follow the grouping axis
        u_labels = [t.get_text() for t in ax_u.get_yticklabels()]
        c_labels = [t.get_text() for t in ax_c.get_yticklabels()]
        assert len(u_labels) == 5
        assert len(c_labels) == 3
        # collections hold the scattered spikes
        assert ax_u.collections and ax_c.collections

    def test_raster_single_unit_across_trials(self, spikes):
        fig, ax = spy.singlepanelplot(spikes, on_yaxis="trials", unit=[1])
        # one scatter collection per trial
        assert len(ax.collections) == 4
        ys = np.concatenate([c.get_offsets()[:, 1] for c in ax.collections])
        assert set(np.unique(ys)) == {0.0, 1.0, 2.0, 3.0}

    def test_raster_trials_requires_single_unit(self, spikes):
        with pytest.raises(spy.shared.errors.SPYError, match="single unit"):
            spy.singlepanelplot(spikes, on_yaxis="trials")

    def test_spike_multipanel_per_trial(self, spikes):
        fig, axs = spy.multipanelplot(spikes, on_yaxis="unit")
        drawn = [ax for ax in axs.flatten() if ax.collections]
        assert len(drawn) == 4
        assert axs.flatten()[0].get_title() == "trial0"

    def test_ax_reuse_overlay(self, adata_equal):
        spec1 = spy.freqanalysis(adata_equal, method="mtmfft", taper="hann",
                                 keeptrials=False)
        fig, ax = spy.singlepanelplot(spec1, channel=0)
        n_before = len(ax.lines)
        # overlay a second spectrum into the SAME axes
        fig2, ax2 = spy.singlepanelplot(spec1, channel=1, ax=ax)
        assert ax2 is ax and fig2 is fig
        assert len(ax.lines) == n_before + 1
