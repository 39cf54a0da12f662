# -*- coding: utf-8 -*-
#
# Jackknife resampling: leave-one-out trial-average replicates and
# bias/variance estimates.
#
# Parity target: reference syncopy/statistics/jackknifing.py:14-190.
# The per-replicate host loop becomes one batched device expression:
# ``loo_i = (N * avg - trial_i) / (N - 1)``.

import numpy as np

import jax.numpy as jnp

from ..shared.errors import SPYError, SPYValueError

__all__ = ["trial_avg_replicates", "bias_var"]


def trial_avg_replicates(trl_ensemble):
    """
    Return an object whose k-th trial is the leave-one-out trial average
    excluding trial k (reference jackknifing.py:14-108).
    """
    from ..datatype.selector import Selector

    sel = trl_ensemble.selection if trl_ensemble.selection is not None else Selector(trl_ensemble, None)
    n_trials = len(sel.trial_ids)
    if n_trials < 2:
        raise SPYValueError(legal="at least 2 trials", varname="trl_ensemble", actual=str(n_trials))

    arrs = [sel.select_trial_array(trl_ensemble, k) for k in range(n_trials)]
    shapes = {a.shape for a in arrs}
    if len(shapes) > 1:
        raise SPYValueError(
            legal="equal trial shapes for jackknifing", varname="trl_ensemble",
            actual=str(sorted(shapes)),
        )
    from ..parallel.device_io import run_on_device

    def _loo(stack):
        avg = jnp.mean(stack, axis=0)
        return (n_trials * avg[None] - stack) / (n_trials - 1)

    loo = run_on_device(_loo, np.stack(arrs), key=("jack_loo", n_trials))

    replicates = trl_ensemble.__class__(dimord=trl_ensemble.dimord)
    sdim = trl_ensemble._stackingDim
    replicates.data = np.concatenate(list(loo), axis=sdim)
    if trl_ensemble.samplerate is not None:
        replicates.samplerate = trl_ensemble.samplerate
    step = arrs[0].shape[sdim]
    trl_def = np.column_stack(
        [np.arange(n_trials) * step, np.arange(n_trials) * step + step, np.zeros(n_trials)]
    )
    replicates.trialdefinition = trl_def
    _propagate_cross_props(trl_ensemble, replicates)
    return replicates


def bias_var(direct_estimate, replicates):
    """
    Jackknife bias and variance from the direct estimate and the
    replicate ensemble (reference jackknifing.py:111-186):
    ``bias = (N-1) (mean(rep) - direct)``,
    ``var = (N-1) sum_i |mean(rep) - rep_i|^2``.
    """
    if len(direct_estimate.trials) != 1:
        raise SPYValueError(
            legal="original trial statistic with one remaining trial",
            varname="direct_estimate",
            actual="{} trials".format(len(direct_estimate.trials)),
        )
    n_trials = len(replicates.trials)
    if n_trials <= 1:
        raise SPYValueError(
            legal="jackknife replicates with at least 2 trials",
            varname="replicates", actual="{} trials".format(n_trials),
        )

    from ..parallel.device_io import run_on_device

    rep_host = np.stack([np.asarray(t) for t in replicates.trials])
    direct_host = np.asarray(direct_estimate.trials[0])
    if rep_host.shape[1:] != direct_host.shape:
        raise SPYError(
            "Got mismatching shapes for jackknife bias computation: "
            "jack: {}, original estimate: {}".format(rep_host.shape[1:], direct_host.shape)
        )

    def _bias_var(rep_stack, direct):
        jack_avg = jnp.mean(rep_stack, axis=0)
        bias_arr = (n_trials - 1) * (jack_avg - direct)
        var_arr = (n_trials - 1) * jnp.sum(jnp.abs(rep_stack - jack_avg[None]) ** 2, axis=0)
        return bias_arr, var_arr

    bias_host, var_host = run_on_device(_bias_var, rep_host, direct_host, key=("jack_bias_var", n_trials))

    bias = direct_estimate.__class__(dimord=direct_estimate.dimord)
    bias.data = bias_host
    variance = direct_estimate.__class__(dimord=direct_estimate.dimord)
    variance.data = var_host.astype(np.float32)
    for obj in (bias, variance):
        if direct_estimate.samplerate is not None:
            obj.samplerate = direct_estimate.samplerate
        obj.trialdefinition = np.array(direct_estimate.trialdefinition)
        _propagate_cross_props(direct_estimate, obj)
    return bias, variance


def _propagate_cross_props(src, dst):
    for prop in ("channel", "channel_i", "channel_j", "freq", "taper"):
        if prop in src.dimord and hasattr(dst.__class__, prop):
            try:
                setattr(dst, prop, np.asarray(getattr(src, prop)))
            except Exception:
                pass
