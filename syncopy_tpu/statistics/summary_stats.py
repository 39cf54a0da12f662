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
    """Average along `dim` (any dimord label or 'trials');
    reference summary_stats.py:24."""
    return _statistics(spy_data, "mean", dim, keeptrials, parallel=parallel, **kwargs)


@unwrap_cfg
@unwrap_select
@detect_parallel_client
def std(spy_data, dim, keeptrials=True, parallel=None, **kwargs):
    """Standard deviation along `dim`; reference summary_stats.py:58."""
    return _statistics(spy_data, "std", dim, keeptrials, parallel=parallel, **kwargs)


@unwrap_cfg
@unwrap_select
@detect_parallel_client
def var(spy_data, dim, keeptrials=True, parallel=None, **kwargs):
    """Variance along `dim`; reference summary_stats.py:91."""
    return _statistics(spy_data, "var", dim, keeptrials, parallel=parallel, **kwargs)


@unwrap_cfg
@unwrap_select
@detect_parallel_client
def median(spy_data, dim, keeptrials=True, parallel=None, **kwargs):
    """Median along `dim`; reference summary_stats.py:124."""
    return _statistics(spy_data, "median", dim, keeptrials, parallel=parallel, **kwargs)


@unwrap_cfg
@unwrap_select
@detect_parallel_client
def itc(spec_data, parallel=None, **kwargs):
    """
    Inter-trial coherence of complex spectra (Kuramoto order parameter);
    reference summary_stats.py:156-205.
    """
    data_parser(spec_data, varname="spec_data", dataclass="SpectralData", empty=False)
    if not np.issubdtype(np.asarray(spec_data.data).dtype, np.complexfloating):
        raise SPYValueError(
            legal="complex valued spectra, set `output='fourier'` in spy.freqanalysis!",
            varname="spec_data",
            actual="real valued spectral data",
        )
    res = _trial_statistics(spec_data, operation="itc")
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
        out = _trial_statistics(spy_data, operation)
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


def _trial_statistics(in_data, operation="mean"):
    """Statistic over the trial axis: batched on-device reduction
    (reference summary_stats.py:321-405)."""
    from ..datatype.selector import Selector

    sel = in_data.selection if in_data.selection is not None else Selector(in_data, None)
    n_trials = len(sel.trial_ids)
    if n_trials < 1:
        raise SPYValueError(legal="at least 1 trial", varname="in_data", actual="0 trials")

    arrs = [sel.select_trial_array(in_data, k) for k in range(n_trials)]
    shapes = {a.shape for a in arrs}
    if len(shapes) > 1:
        raise SPYValueError(
            legal="all trials to have the same shape",
            varname="in_data",
            actual="found trials of different shape: {}".format(sorted(shapes)),
        )
    from ..parallel.device_io import run_on_device

    if operation == "mean":
        op = lambda stack: jnp.mean(stack, axis=0)  # noqa: E731
    elif operation == "var":
        op = lambda stack: jnp.mean(jnp.abs(stack - jnp.mean(stack, axis=0)) ** 2, axis=0)  # noqa: E731
    elif operation == "std":
        op = lambda stack: jnp.sqrt(  # noqa: E731
            jnp.mean(jnp.abs(stack - jnp.mean(stack, axis=0)) ** 2, axis=0)
        )
    elif operation == "itc":
        taper_ax = in_data.dimord.index("taper")

        def op(stack):
            unit = stack / jnp.abs(stack)
            result = jnp.mean(unit, axis=0)
            return jnp.abs(jnp.mean(result, axis=taper_ax, keepdims=True))

    else:
        raise SPYValueError(legal="mean/var/std/itc", varname="operation", actual=operation)

    result = run_on_device(op, np.stack(arrs), key=("trial_stat", operation, in_data.dimord.index("taper") if operation == "itc" else None))
    if operation != "itc" and np.isrealobj(np.asarray(in_data.data)[:0]):
        result = result.astype(np.asarray(arrs[0]).dtype, copy=False)

    out_data = in_data.__class__(dimord=in_data.dimord)
    out_data.data = result
    if in_data.samplerate is not None:
        out_data.samplerate = in_data.samplerate
    out_data._trialdefinition = sel.trialdefinition[0, :][None, :]
    reduced = "taper" if operation == "itc" else None
    _propagate_dim_props(in_data, out_data, sel, reduced_dim=reduced, label="itc")
    out_data._log = str(in_data._log)
    return out_data
