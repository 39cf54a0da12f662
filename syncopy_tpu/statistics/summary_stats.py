# -*- coding: utf-8 -*-
#
# Summary statistics over dimensions or trials + inter-trial coherence.
#
# Parity target: reference syncopy/statistics/summary_stats.py:24-530.
# Trial statistics (the reference's sequential streaming accumulation,
# summary_stats.py:321-488) run as a batched on-device reduction here: the
# (equal-shape) trial stack is one sharded array and the statistic is a
# single collective reduce.

import numpy as np

import jax.numpy as jnp

from ..shared.errors import SPYError, SPYValueError
from ..shared.kwarg_decorators import detect_parallel_client, unwrap_cfg, unwrap_select
from ..shared.parsers import data_parser
from .compRoutines import NumpyStatDim, _propagate_dim_props

__all__ = ["mean", "std", "var", "median", "itc"]


@unwrap_cfg
@unwrap_select
@detect_parallel_client
def mean(spy_data, dim, keeptrials=True, parallel=None, **kwargs):
    """Average a Syncopy object along one dimension.

    Parameters
    ----------
    spy_data : Syncopy data object
        Any dataclass (AnalogData, SpectralData, CrossSpectralData, ...).
    dim : str
        A dimord label of `spy_data` (e.g. "channel", "freq", "time") or
        "trials" for the across-trial average (engine-streamed on device).
    keeptrials : bool
        For dimension statistics: keep per-trial results (ignored for
        dim="trials").
    parallel : bool or None
        Shard trials over the active device mesh (None = auto-detect).

    Returns
    -------
    Same class as `spy_data` with the reduced dimension singleton.

    Reference: summary_stats.py:24.
    """
    return _statistics(spy_data, "mean", dim, keeptrials, parallel=parallel, **kwargs)


@unwrap_cfg
@unwrap_select
@detect_parallel_client
def std(spy_data, dim, keeptrials=True, parallel=None, **kwargs):
    """Standard deviation along `dim`.

    Parameters as in :func:`~syncopy_tpu.mean`; dim="trials" streams a
    centered-moment reduction on device. Reference: summary_stats.py:58.
    """
    return _statistics(spy_data, "std", dim, keeptrials, parallel=parallel, **kwargs)


@unwrap_cfg
@unwrap_select
@detect_parallel_client
def var(spy_data, dim, keeptrials=True, parallel=None, **kwargs):
    """Variance along `dim`.

    Parameters as in :func:`~syncopy_tpu.mean`; dim="trials" streams a
    centered-moment reduction on device. Reference: summary_stats.py:91.
    """
    return _statistics(spy_data, "var", dim, keeptrials, parallel=parallel, **kwargs)


@unwrap_cfg
@unwrap_select
@detect_parallel_client
def median(spy_data, dim, keeptrials=True, parallel=None, **kwargs):
    """Median along `dim`.

    Parameters as in :func:`~syncopy_tpu.mean`. dim="trials" requires
    host stacking (order statistic); dimension medians run per trial.
    Reference: summary_stats.py:124.
    """
    return _statistics(spy_data, "median", dim, keeptrials, parallel=parallel, **kwargs)


@unwrap_cfg
@unwrap_select
@detect_parallel_client
def itc(spec_data, parallel=None, **kwargs):
    """Inter-trial coherence of complex spectra.

    Parameters
    ----------
    spec_data : :class:`~syncopy_tpu.SpectralData`
        Complex spectra (``output="fourier"``, trials kept).
    parallel : bool or None
        Shard trials over the active device mesh (None = auto-detect).

    Returns
    -------
    :class:`~syncopy_tpu.SpectralData`
        Real-valued ITC (Kuramoto order parameter of the unit phasors,
        in [0, 1]), streamed across trials on device.

    Reference: summary_stats.py:156-205.
    """
    data_parser(spec_data, varname="spec_data", dataclass="SpectralData", empty=False)
    # dtype via attribute — element access would force a device-resident
    # input through a host readback
    if not np.issubdtype(np.dtype(spec_data.data.dtype), np.complexfloating):
        raise SPYValueError(
            legal="complex valued spectra, set `output='fourier'` in spy.freqanalysis!",
            varname="spec_data",
            actual="real valued spectral data",
        )
    res = _trial_statistics(spec_data, operation="itc", parallel=parallel)
    res.cfg.update(spec_data.cfg)
    return res


def _statistics(spy_data, operation, dim, keeptrials=True, parallel=None, **kwargs):
    """Dispatch dim-statistics (engine CR) vs trial-statistics (batched
    device reduce); reference summary_stats.py:207-319."""
    data_parser(spy_data, varname="spy_data", empty=False)
    if dim != "trials" and dim not in spy_data.dimord:
        raise SPYValueError(
            legal="one of {} or 'trials'".format(spy_data.dimord), varname="dim", actual=str(dim)
        )

    log_dict = {"operation": operation, "dim": dim, "keeptrials": keeptrials}

    if dim == "trials":
        if operation == "median":
            raise SPYError("Trial median not supported at the moment")
        out = _trial_statistics(spy_data, operation, parallel=parallel)
        out.log = "computed trial statistics {}".format(log_dict)
        out.cfg.update(spy_data.cfg)
        return out

    axis = spy_data.dimord.index(dim)
    avCR = NumpyStatDim(operation=operation, axis=axis)
    out = spy_data.__class__(dimord=spy_data.dimord)
    avCR.initialize(spy_data, spy_data._stackingDim, keeptrials=keeptrials)
    avCR.compute(spy_data, out, parallel=parallel, log_dict=log_dict)
    out.cfg.update(spy_data.cfg)
    return out


def _check_equal_trials(in_data):
    """Trial statistics need identical trial shapes; count from selection."""
    from ..datatype.selector import Selector

    sel = in_data.selection if in_data.selection is not None else Selector(in_data, None)
    n_trials = len(sel.trial_ids)
    if n_trials < 1:
        raise SPYValueError(legal="at least 1 trial", varname="in_data", actual="0 trials")
    return sel, n_trials


def _run_trial_reduce(in_data, mode, parallel=None, center=None,
                      post_device_fn=None, post_key=None, log_dict=None):
    """One streamed engine pass of :class:`TrialReduce` over `in_data`:
    chunked on-device accumulation, host memory bounded by one chunk,
    device-resident inputs consumed straight from HBM
    (replaces the former whole-ensemble ``np.stack`` + single transfer)."""
    from .compRoutines import TrialReduce

    cr = TrialReduce(mode=mode, center=center)
    out = in_data.__class__(dimord=in_data.dimord)
    try:
        cr.initialize(in_data, in_data._stackingDim, keeptrials=False)
    except SPYValueError as exc:
        if "identical trial shapes" in str(exc):
            raise SPYValueError(
                legal="all trials to have the same shape",
                varname="in_data",
                actual="found trials of different shape",
            )
        raise
    cr.compute(
        in_data, out, parallel=parallel, log_dict=log_dict,
        post_device_fn=post_device_fn, post_key=post_key,
    )
    return cr, out


def _streamed_trial_mean(in_data, parallel=None):
    """Trial average as a plain host array (pass 1 of two-pass statistics)."""
    _, out = _run_trial_reduce(in_data, "sum", parallel=parallel,
                               log_dict={"operation": "mean", "dim": "trials"})
    return np.asarray(out.data)


def _trial_statistics(in_data, operation="mean", parallel=None):
    """Statistic over the trial axis: streamed on-device reduction
    (reference summary_stats.py:321-405); var/std run an exact two-pass
    (mean, then centered second moment)."""
    sel, n_trials = _check_equal_trials(in_data)
    log_dict = {"operation": operation, "dim": "trials"}

    if operation == "mean":
        _, out_data = _run_trial_reduce(in_data, "sum", parallel=parallel, log_dict=log_dict)
    elif operation in ("var", "std"):
        center = _streamed_trial_mean(in_data, parallel=parallel)
        post = (lambda x: jnp.sqrt(x)) if operation == "std" else None
        _, out_data = _run_trial_reduce(
            in_data, "centered_sq", parallel=parallel, center=center,
            post_device_fn=post, post_key=("trial_std",) if post else None,
            log_dict=log_dict,
        )
    elif operation == "itc":
        taper_ax = in_data.dimord.index("taper")

        def post(resultant):
            return jnp.abs(jnp.mean(resultant, axis=taper_ax, keepdims=True))

        _, out_data = _run_trial_reduce(
            in_data, "unit_sum", parallel=parallel,
            post_device_fn=post, post_key=("itc", taper_ax), log_dict=log_dict,
        )
    else:
        raise SPYValueError(legal="mean/var/std/itc", varname="operation", actual=operation)

    out_data._trialdefinition = sel.trialdefinition[0, :][None, :]
    reduced = "taper" if operation == "itc" else None
    _propagate_dim_props(in_data, out_data, sel, reduced_dim=reduced, label="itc")
    out_data._log = str(in_data._log)
    return out_data
