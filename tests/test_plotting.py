# -*- coding: utf-8 -*-
# Plotting smoke tests (modeled on reference tests/test_plotting.py).

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

import syncopy_tpu as spy


@pytest.fixture(autouse=True)
def _close_figures():
    """Close every figure a test created: the >20-open-figure warning
    otherwise drowns out real matplotlib warnings."""
    yield
    plt.close("all")


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


class TestAnalogArtists:
    """Artist-level assertions for AnalogData/TimeLockData line plots
    (reference test_plotting.py scope: data values, labels, layout)."""

    def test_line_values_match_data(self, adata_equal):
        fig, ax = spy.singlepanelplot(adata_equal, trials=2, shifted=False)
        arr = np.asarray(adata_equal.trials[2])
        assert len(ax.lines) == arr.shape[1]
        for k, ln in enumerate(ax.lines):
            np.testing.assert_allclose(ln.get_ydata(), arr[:, k], rtol=1e-6)

    def test_time_axis_uses_samplerate(self, adata_equal):
        fig, ax = spy.singlepanelplot(adata_equal, trials=0, shifted=False)
        x = ax.lines[0].get_xdata()
        assert np.isclose(x[1] - x[0], 1.0 / adata_equal.samplerate)
        assert len(x) == np.asarray(adata_equal.trials[0]).shape[0]

    def test_shifted_offsets_stack_channels(self, adata_equal):
        fig, ax = spy.singlepanelplot(adata_equal, trials=0, shifted=True)
        means = [np.mean(ln.get_ydata()) for ln in ax.lines]
        assert all(b > a for a, b in zip(means, means[1:]))

    def test_legend_carries_channel_labels(self, adata_equal):
        fig, ax = spy.singlepanelplot(adata_equal, trials=0)
        leg = ax.get_legend()
        assert leg is not None
        texts = [t.get_text() for t in leg.get_texts()]
        assert texts == list(np.asarray(adata_equal.channel))

    def test_channel_selection_subsets_lines(self, adata_equal):
        fig, ax = spy.singlepanelplot(adata_equal, trials=0, channel=[1, 3])
        assert len(ax.lines) == 2
        arr = np.asarray(adata_equal.trials[0])
        np.testing.assert_allclose(ax.lines[0].get_ydata(), arr[:, 1], rtol=1e-6)

    def test_latency_window_shortens_lines(self, adata_equal):
        fig, ax = spy.singlepanelplot(adata_equal, trials=0,
                                      latency=[0.0, 0.25], shifted=False)
        n = len(ax.lines[0].get_ydata())
        assert 200 <= n <= 260

    def test_axis_labels(self, adata_equal):
        fig, ax = spy.singlepanelplot(adata_equal, trials=0)
        assert ax.get_xlabel() == "time (s)"
        assert "signal" in ax.get_ylabel()
        assert not ax.spines["top"].get_visible()

    def test_multipanel_layout_and_titles(self, adata_equal):
        fig, axs = spy.multipanelplot(adata_equal, trials=0)
        n_chan = len(adata_equal.channel)
        active = [a for a in axs.flatten() if a.get_visible() and a.lines]
        assert len(active) == n_chan
        titles = [a.get_title() for a in active]
        assert titles == list(np.asarray(adata_equal.channel))
        # unused panels are switched off
        for a in axs.flatten()[n_chan:]:
            assert not a.axison

    def test_multipanel_values_per_channel(self, adata_equal):
        fig, axs = spy.multipanelplot(adata_equal, trials=1)
        arr = np.asarray(adata_equal.trials[1])
        for k in range(arr.shape[1]):
            np.testing.assert_allclose(
                axs.flatten()[k].lines[0].get_ydata(), arr[:, k], rtol=1e-6
            )

    def test_timelock_avg_plot(self):
        ad = spy.synthdata.harmonic(freq=10, samplerate=200, nTrials=5,
                                    nSamples=200, nChannels=2)
        tl = spy.timelockanalysis(ad)
        fig, ax = spy.singlepanelplot(tl, shifted=False)
        assert len(ax.lines) == 2


class TestSpectralArtists:
    @pytest.fixture()
    def spec1d(self, adata_equal):
        return spy.freqanalysis(adata_equal, method="mtmfft", taper="hann",
                                keeptrials=False)

    def test_line_per_channel_and_freq_axis(self, spec1d):
        fig, ax = spy.singlepanelplot(spec1d)
        assert len(ax.lines) == len(spec1d.channel)
        np.testing.assert_allclose(ax.lines[0].get_xdata(),
                                   np.asarray(spec1d.freq))

    def test_power_values_match_show(self, spec1d):
        fig, ax = spy.singlepanelplot(spec1d)
        arr = np.asarray(spec1d.show(squeeze=False))
        want = np.abs(arr).mean(axis=1)[0]  # taper average
        for k, ln in enumerate(ax.lines):
            np.testing.assert_allclose(ln.get_ydata(), want[:, k], rtol=1e-6)

    def test_logscale_toggle(self, spec1d):
        fig, ax = spy.singlepanelplot(spec1d)
        assert ax.get_yscale() == "log"
        fig, ax = spy.singlepanelplot(spec1d, logscale=False)
        assert ax.get_yscale() == "linear"

    def test_multipanel_titles_and_scale(self, spec1d):
        fig, axs = spy.multipanelplot(spec1d)
        active = [a for a in axs.flatten() if a.lines]
        assert len(active) == len(spec1d.channel)
        assert [a.get_title() for a in active] == list(np.asarray(spec1d.channel))
        assert all(a.get_yscale() == "log" for a in active)


class TestTFRArtists:
    @pytest.fixture()
    def tfr(self):
        data = spy.synthdata.harmonic(freq=30, samplerate=500, nTrials=2,
                                      nSamples=500, nChannels=3)
        return spy.freqanalysis(data, method="wavelet",
                                foi=np.linspace(10, 60, 12))

    def test_image_shape_and_extent(self, tfr):
        fig, ax = spy.singlepanelplot(tfr, trials=0, channel=0)
        assert len(ax.images) == 1
        img = ax.images[0].get_array()
        assert img.shape == (len(tfr.freq), 500)
        x0, x1, y0, y1 = ax.images[0].get_extent()
        assert y0 == tfr.freq[0] and y1 == tfr.freq[-1]
        assert x1 <= 1.0 + 1e-6  # 500 samples @ 500 Hz

    def test_image_values_match_power(self, tfr):
        fig, ax = spy.singlepanelplot(tfr, trials=1, channel=2)
        img = np.asarray(ax.images[0].get_array())
        arr = np.asarray(tfr.show(squeeze=False, trials=1, channel=2))
        want = np.abs(arr)[:, 0, :, 0].T[::-1]  # (F, T), flipped for imshow
        np.testing.assert_allclose(img, want, rtol=1e-6)

    def test_harmonic_peak_at_drive_frequency(self, tfr):
        fig, ax = spy.singlepanelplot(tfr, trials=0, channel=0)
        img = np.asarray(ax.images[0].get_array())[::-1]  # (F, T) ascending
        peak_freq = np.asarray(tfr.freq)[img.mean(axis=1).argmax()]
        assert abs(peak_freq - 30) < 5

    def test_multipanel_shared_color_scale(self, tfr):
        fig, axs = spy.multipanelplot(tfr, trials=0)
        imgs = [a.images[0] for a in axs.flatten() if a.images]
        assert len(imgs) == len(tfr.channel)
        clims = {im.get_clim() for im in imgs}
        assert len(clims) == 1  # shared vmax across panels


class TestCrossSpectralArtists:
    @pytest.fixture(scope="class")
    def ar2(self):
        return spy.synthdata.ar2_network(nTrials=30, samplerate=200,
                                         nSamples=500, seed=1)

    def test_coherence_line_matches_data(self, ar2):
        coh = spy.connectivityanalysis(ar2, method="coh", tapsmofrq=3)
        fig, ax = spy.singlepanelplot(coh, channel_i=0, channel_j=1)
        arr = np.asarray(coh.data)
        np.testing.assert_allclose(ax.lines[0].get_ydata(), arr[0, :, 0, 1],
                                   rtol=1e-6)
        np.testing.assert_allclose(ax.lines[0].get_xdata(), np.asarray(coh.freq))
        assert "frequency" in ax.get_xlabel()

    def test_granger_line(self, ar2):
        gr = spy.connectivityanalysis(ar2, method="granger")
        fig, ax = spy.singlepanelplot(gr, channel_i=1, channel_j=0)
        arr = np.asarray(gr.data)
        np.testing.assert_allclose(ax.lines[0].get_ydata(), arr[0, :, 1, 0],
                                   rtol=1e-5)

    def test_corr_lag_axis(self, ar2):
        corr = spy.connectivityanalysis(ar2, method="corr")
        fig, ax = spy.singlepanelplot(corr, channel_i=0, channel_j=1)
        x = ax.lines[0].get_xdata()
        assert np.isclose(x[1] - x[0], 1.0 / ar2.samplerate)
        assert "lag" in ax.get_xlabel()

    def test_default_channel_pair(self, ar2):
        coh = spy.connectivityanalysis(ar2, method="coh", tapsmofrq=3)
        fig, ax = spy.singlepanelplot(coh)
        arr = np.asarray(coh.data)
        np.testing.assert_allclose(ax.lines[0].get_ydata(), arr[0, :, 0, 1],
                                   rtol=1e-6)


class TestSpikeArtists:
    @pytest.fixture(scope="class")
    def spikes(self):
        return spy.synthdata.poisson_noise(nTrials=6, nSpikes=1200,
                                           nChannels=3, nUnits=4,
                                           samplerate=1000, seed=3)

    def test_raster_offsets_match_spike_count(self, spikes):
        fig, ax = spy.singlepanelplot(spikes, trials=0)
        arr = np.asarray(spikes.trials[0])
        pts = ax.collections[0].get_offsets()
        assert pts.shape[0] == arr.shape[0]

    def test_raster_times_scaled_by_samplerate(self, spikes):
        fig, ax = spy.singlepanelplot(spikes, trials=1)
        arr = np.asarray(spikes.trials[1])
        scol = spikes.dimord.index("sample")
        pts = np.asarray(ax.collections[0].get_offsets())
        np.testing.assert_allclose(np.sort(pts[:, 0]),
                                   np.sort(arr[:, scol] / spikes.samplerate),
                                   rtol=1e-6)

    def test_raster_channel_grouping_y_values(self, spikes):
        fig, ax = spy.singlepanelplot(spikes, trials=0, on_yaxis="channel")
        arr = np.asarray(spikes.trials[0])
        ccol = spikes.dimord.index("channel")
        pts = np.asarray(ax.collections[0].get_offsets())
        assert set(np.unique(pts[:, 1])) <= set(np.unique(arr[:, ccol]))

    def test_raster_unit_ticklabels(self, spikes):
        fig, ax = spy.singlepanelplot(spikes, trials=0, on_yaxis="unit")
        labels = [t.get_text() for t in ax.get_yticklabels()]
        assert labels == [str(u) for u in np.asarray(spikes.unit)]

    def test_trials_mode_one_collection_per_trial(self, spikes):
        fig, ax = spy.singlepanelplot(spikes, on_yaxis="trials", unit=0)
        assert len(ax.collections) == len(spikes.trials)
        assert ax.get_title() == str(np.asarray(spikes.unit)[0])

    def test_multipanel_one_raster_per_trial(self, spikes):
        fig, axs = spy.multipanelplot(spikes)
        active = [a for a in axs.flatten() if a.collections]
        assert len(active) == len(spikes.trials)
        assert [a.get_title() for a in active] == [
            "trial" + str(k) for k in range(len(spikes.trials))
        ]

    def test_multipanel_too_many_trials_raises(self):
        spd = spy.synthdata.poisson_noise(nTrials=30, nSpikes=600,
                                          nChannels=1, nUnits=1,
                                          samplerate=1000, seed=4)
        with pytest.raises(spy.SPYError):
            spy.multipanelplot(spd)


class TestPlottingInfra:
    def test_unsupported_class_raises(self):
        ev = spy.EventData(data=np.array([[0, 1], [10, 2]]), samplerate=1000)
        with pytest.raises(spy.SPYError):
            spy.singlepanelplot(ev)

    def test_ax_reuse_draws_into_given_axes(self, adata_equal):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        fig2, ax2 = spy.singlepanelplot(adata_equal, trials=0, ax=ax)
        assert ax2 is ax and fig2 is fig
        assert len(ax.lines) == len(adata_equal.channel)

    def test_overlay_two_datasets(self, adata_equal):
        fig, ax = spy.singlepanelplot(adata_equal, trials=0, shifted=False)
        n0 = len(ax.lines)
        spy.singlepanelplot(adata_equal, trials=1, shifted=False, ax=ax)
        assert len(ax.lines) == 2 * n0

    def test_invalid_on_yaxis_raises(self):
        spd = spy.synthdata.poisson_noise(nTrials=2, nSpikes=100, nChannels=1,
                                          nUnits=1, samplerate=1000, seed=5)
        with pytest.raises(spy.SPYError):
            spy.singlepanelplot(spd, on_yaxis="bogus")
