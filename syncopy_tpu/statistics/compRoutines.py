# -*- coding: utf-8 -*-
#
# Statistics compute routines.
#
# Parity target: reference syncopy/statistics/compRoutines.py:22-391.

import numpy as np

import jax.numpy as jnp

from ..engine.routine import ComputationalRoutine

__all__ = ["NumpyStatDim", "Covariance"]


class NumpyStatDim(ComputationalRoutine):
    """
    Summary statistic along one dimord axis of each trial, reducing it to a
    singleton (reference statistics/compRoutines.py:22-137).
    """

    valid_kws = ["operation", "axis", "dim"]

    methods = {
        "mean": jnp.nanmean,
        "std": jnp.nanstd,
        "var": jnp.nanvar,
        "median": jnp.nanmedian,
    }

    def __init__(self, operation="mean", axis=0):
        super().__init__(operation=operation, axis=int(axis))

    def process_single_trial(self, trial, **cfg):
        return self.methods[cfg["operation"]](trial, axis=cfg["axis"], keepdims=True)

    def process_metadata(self, in_data, out_data):
        dim = in_data.dimord[self.cfg["axis"]]
        out_data.samplerate = in_data.samplerate
        sel = self.selector

        if dim == "time" and not self.keeptrials:
            trldef = np.array([[0, 1, 0]])
        elif dim != "time" and not self.keeptrials:
            trldef = sel.trialdefinition[0, :][None, :]
        elif dim == "time" and self.keeptrials:
            n_trials = len(sel.trial_ids)
            stacking = np.arange(n_trials)[:, None]
            trldef = np.hstack((stacking, stacking + 1, np.zeros((n_trials, 1))))
        else:
            trldef = sel.trialdefinition
        out_data.trialdefinition = trldef

        _propagate_dim_props(in_data, out_data, sel, reduced_dim=dim, label=self.cfg["operation"])


class Covariance(ComputationalRoutine):
    """
    Per-trial channel covariance of time-locked data
    (reference statistics/compRoutines.py:139-233). Output per trial:
    ``(1, nChannel, nChannel)`` stacked along the first axis.
    """

    valid_kws = ["ddof", "demean"]

    def __init__(self, ddof=1, demean=True):
        super().__init__(ddof=int(ddof), demean=bool(demean))

    def process_single_trial(self, trial, **cfg):
        x = trial.astype(jnp.float32)
        if cfg["demean"]:
            x = x - jnp.mean(x, axis=0, keepdims=True)
        n = x.shape[0] - cfg["ddof"]
        cov = jnp.matmul(x.T, x, preferred_element_type=jnp.float32) / n
        return cov[None]

    def process_metadata(self, data, out):
        pass  # caller attaches the result as an extra dataset


def _propagate_dim_props(in_data, out_data, sel, reduced_dim, label):
    """Propagate channel/freq/taper labels honoring selections; the reduced
    dimension collapses to a single `label` entry (freq becomes None)."""

    def _take(labels, indexer):
        labels = np.asarray(labels)
        if indexer is None:
            return labels
        if isinstance(indexer, slice):
            return labels[indexer]
        return labels[np.asarray(indexer, dtype=int)]

    for prop, sel_attr in (
        ("channel", "channel"),
        ("channel_i", "channel_i"),
        ("channel_j", "channel_j"),
        ("taper", "taper"),
    ):
        if prop in in_data.dimord and hasattr(out_data.__class__, prop):
            if prop == reduced_dim:
                setattr(out_data, prop, [label])
            else:
                try:
                    setattr(out_data, prop, _take(getattr(in_data, prop), getattr(sel, sel_attr, None)))
                except Exception:
                    pass
    if "freq" in in_data.dimord and hasattr(out_data.__class__, "freq"):
        if reduced_dim == "freq":
            out_data.freq = None
        else:
            out_data.freq = _take(in_data.freq, getattr(sel, "freq", None))
