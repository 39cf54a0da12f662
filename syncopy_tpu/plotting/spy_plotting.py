# -*- coding: utf-8 -*-
#
# Plotting dispatch: singlepanelplot / multipanelplot.
#
# Parity target: reference syncopy/plotting/spy_plotting.py:13-53 +
# sp_plotting.py / mp_plotting.py / spike_plotting.py per-class plotters.

import numpy as np

from ..shared.errors import SPYError, SPYWarning
from . import _plotting as _plt

__all__ = ["singlepanelplot", "multipanelplot"]


def singlepanelplot(data, **show_kwargs):
    """
    Plot (selected) data in a single panel: line plots for AnalogData /
    1d spectra / cross-spectra, images for time-frequency spectra, raster
    plots for SpikeData (reference spy_plotting.py:13).
    Returns (fig, ax).
    """
    plotter = _get_plotter(data, single=True)
    return plotter(data, **show_kwargs)


def multipanelplot(data, **show_kwargs):
    """One panel per channel (reference spy_plotting.py:53).
    Returns (fig, axs)."""
    plotter = _get_plotter(data, single=False)
    return plotter(data, **show_kwargs)


def _get_plotter(data, single):
    name = data.__class__.__name__
    table = {
        ("AnalogData", True): plot_analog_single,
        ("AnalogData", False): plot_analog_multi,
        ("TimeLockData", True): plot_analog_single,
        ("TimeLockData", False): plot_analog_multi,
        ("SpectralData", True): plot_spectral_single,
        ("SpectralData", False): plot_spectral_multi,
        ("CrossSpectralData", True): plot_crossspectral_single,
        ("CrossSpectralData", False): plot_crossspectral_single,
        ("SpikeData", True): plot_spike_single,
        ("SpikeData", False): plot_spike_single,
    }
    plotter = table.get((name, single))
    if plotter is None:
        raise SPYError("Plotting not supported for {}".format(name))
    return plotter


def _select_show(data, show_kwargs):
    """Apply selection kwargs transiently and return (array, sel)."""
    trials = show_kwargs.pop("trials", None)
    if trials is None and len(data.trials) > 1:
        SPYWarning("Plotting only the first trial; use `trials=` to select")
        trials = 0
    arr = data.show(squeeze=False, trials=trials, **show_kwargs)
    if isinstance(arr, list):
        arr = arr[0]
    return arr


def plot_analog_single(data, shifted=True, **show_kwargs):
    arr = _select_show(data, dict(show_kwargs))
    fig, ax = _plt.mk_line_figax()
    time = np.arange(arr.shape[0]) / data.samplerate
    chan_sel = show_kwargs.get("channel")
    labels = _channel_labels(data, chan_sel)
    _plt.plot_lines(ax, time, arr.reshape(arr.shape[0], -1), shifted=shifted, label=labels)
    fig.tight_layout()
    return fig, ax


def plot_analog_multi(data, **show_kwargs):
    arr = _select_show(data, dict(show_kwargs))
    arr = arr.reshape(arr.shape[0], -1)
    nrows, ncols = _calc_layout(arr.shape[1])
    fig, axs = _plt.mk_multi_line_figax(nrows, ncols)
    time = np.arange(arr.shape[0]) / data.samplerate
    labels = _channel_labels(data, show_kwargs.get("channel"))
    for k, ax in enumerate(axs.flatten()):
        if k < arr.shape[1]:
            ax.plot(time, arr[:, k])
            ax.set_title(labels[k] if k < len(labels) else "", fontsize=_plt.pltConfig["mTitleSize"])
        else:
            ax.axis("off")
    fig.tight_layout()
    return fig, axs


def plot_spectral_single(data, logscale=True, **show_kwargs):
    is_tf = data.data.shape[data.dimord.index("time")] > len(data.trials)
    if is_tf:
        arr = _select_show(data, dict(show_kwargs))
        arr = arr.mean(axis=1) if arr.ndim == 4 else arr  # average tapers
        fig, ax = _plt.mk_img_figax()
        time = np.arange(arr.shape[0]) / data.samplerate
        spec = arr.reshape(arr.shape[0], len(data.freq), -1)[:, :, 0]
        _plt.plot_tfreq(ax, spec.T, time, data.freq)
        fig.tight_layout()
        return fig, ax
    arr = _select_show(data, dict(show_kwargs))
    arr = np.abs(arr)
    arr = arr.mean(axis=1) if arr.ndim == 4 else arr
    arr = arr.reshape(-1, len(data.freq), arr.shape[-1])[0]
    fig, ax = _plt.mk_line_figax(xlabel="frequency (Hz)", ylabel="power")
    if logscale:
        ax.set_yscale("log")
    labels = _channel_labels(data, show_kwargs.get("channel"))
    _plt.plot_lines(ax, np.asarray(data.freq), arr, label=labels)
    fig.tight_layout()
    return fig, ax


def plot_spectral_multi(data, logscale=True, **show_kwargs):
    arr = _select_show(data, dict(show_kwargs))
    arr = np.abs(arr)
    arr = arr.mean(axis=1) if arr.ndim == 4 else arr
    arr = arr.reshape(-1, len(data.freq), arr.shape[-1])[0]
    nrows, ncols = _calc_layout(arr.shape[-1])
    fig, axs = _plt.mk_multi_line_figax(nrows, ncols, xlabel="frequency (Hz)", ylabel="power")
    labels = _channel_labels(data, show_kwargs.get("channel"))
    for k, ax in enumerate(axs.flatten()):
        if k < arr.shape[-1]:
            ax.plot(np.asarray(data.freq), arr[:, k])
            if logscale:
                ax.set_yscale("log")
            ax.set_title(labels[k] if k < len(labels) else "", fontsize=_plt.pltConfig["mTitleSize"])
        else:
            ax.axis("off")
    fig.tight_layout()
    return fig, axs


def plot_crossspectral_single(data, **show_kwargs):
    ch_i = show_kwargs.pop("channel_i", 0)
    ch_j = show_kwargs.pop("channel_j", 1 if len(data.channel_j) > 1 else 0)
    arr = data.show(squeeze=False, channel_i=ch_i, channel_j=ch_j, **show_kwargs)
    if isinstance(arr, list):
        arr = arr[0]
    arr = np.abs(arr).reshape(arr.shape[0], arr.shape[1])
    is_lag = data.freq is None or len(np.atleast_1d(data.freq)) == 1
    if arr.shape[0] > 1 and arr.shape[1] <= 1:
        # cross-correlation: time axis = lags
        fig, ax = _plt.mk_line_figax(xlabel="lag (s)", ylabel="corr")
        lags = np.arange(arr.shape[0]) / data.samplerate
        _plt.plot_lines(ax, lags, arr[:, 0])
    else:
        fig, ax = _plt.mk_line_figax(xlabel="frequency (Hz)", ylabel="connectivity")
        _plt.plot_lines(ax, np.asarray(data.freq), arr[0] if arr.shape[0] == 1 else arr.mean(axis=0))
    fig.tight_layout()
    return fig, ax


def plot_spike_single(data, **show_kwargs):
    trials = show_kwargs.pop("trials", None)
    arr = data.show(squeeze=False, trials=trials, **show_kwargs)
    if isinstance(arr, list):
        arr = np.concatenate([a for a in arr], axis=0)
    fig, ax = _plt.mk_line_figax(xlabel="time (s)", ylabel="unit")
    scol = data.dimord.index("sample")
    ucol = data.dimord.index("unit")
    times = arr[:, scol] / data.samplerate
    ax.scatter(times, arr[:, ucol], s=2, marker="|")
    fig.tight_layout()
    return fig, ax


def _channel_labels(data, chan_sel):
    try:
        labels = np.asarray(data.channel)
    except Exception:
        return []
    if chan_sel is None:
        return list(labels)
    idx = np.atleast_1d(chan_sel)
    out = []
    for c in idx:
        if isinstance(c, str):
            out.append(c)
        else:
            out.append(labels[int(c)])
    return out


def _calc_layout(nAx):
    ncols = int(np.ceil(np.sqrt(nAx)))
    nrows = int(np.ceil(nAx / ncols))
    return nrows, ncols
