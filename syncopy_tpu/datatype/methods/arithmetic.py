# -*- coding: utf-8 -*-
#
# Arithmetic on syncopy_tpu objects: +, -, *, /, ** with scalars, arrays and
# other objects, applied trial-by-trial while honoring in-place selections.
#
# Parity target: reference syncopy/datatype/methods/arithmetic.py:21-517.
# The reference routes every operation through the `SpyArithmetic` CR with
# Dask locks against chained-operation races; here operations are applied as
# vectorized host/device array ops on the (selected) trial stack — a single
# fused elementwise pass, no locks needed.

import numbers

import numpy as np

from ...shared.errors import SPYError, SPYTypeError, SPYValueError

__all__ = ["_process_operator"]

_OPS = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "**": lambda a, b: a**b,
}


def _process_operator(obj, operand, operator, reverse=False):
    """Dispatch an arithmetic operator on syncopy_tpu object `obj`."""
    from ..base_data import BaseData

    if operator not in _OPS:
        raise SPYValueError(legal=str(list(_OPS)), varname="operator", actual=operator)
    if obj.data is None:
        raise SPYError("Cannot perform arithmetic on empty object")

    op = _OPS[operator]
    if reverse:
        inner = op
        op = lambda a, b: inner(b, a)  # noqa: E731

    # gather (selected) per-trial arrays of obj
    sel = obj.selection
    if sel is not None:
        trials_a = [sel.select_trial_array(obj, k) for k in range(len(sel.trial_ids))]
        trialdef = np.array(sel.trialdefinition)
    else:
        trials_a = [np.asarray(t) for t in obj.trials]
        trialdef = np.array(obj.trialdefinition)

    if isinstance(operand, BaseData):
        operand_trials = _parse_object_operand(obj, operand, trials_a)
        res = [op(a, b) for a, b in zip(trials_a, operand_trials)]
    elif isinstance(operand, (numbers.Number, np.number)):
        if operator == "/" and not reverse and operand == 0:
            raise SPYValueError(legal="non-zero scalar", varname="operand", actual="0")
        res = [op(a, operand) for a in trials_a]
    elif isinstance(operand, (np.ndarray, list)):
        operand = np.asarray(operand)
        for a in trials_a:
            try:
                np.broadcast_shapes(a.shape, operand.shape)
            except ValueError:
                raise SPYValueError(
                    legal="array broadcastable to trial shape {}".format(a.shape),
                    varname="operand",
                    actual=str(operand.shape),
                )
        res = [op(a, operand) for a in trials_a]
    else:
        raise SPYTypeError(
            operand, varname="operand", expected="scalar, array or syncopy_tpu object"
        )

    out = _assemble_output(obj, res, trialdef)
    out.log = "arithmetic: {} {} {}".format(
        obj.__class__.__name__, operator, type(operand).__name__
    )
    return out


def _parse_object_operand(obj, operand, trials_a):
    """Validate an object operand and return its (selected) trial arrays
    (reference arithmetic.py:66-300)."""
    if operand.__class__ != obj.__class__:
        raise SPYTypeError(
            operand, varname="operand", expected=obj.__class__.__name__
        )
    if operand.data is None:
        raise SPYError("Cannot perform arithmetic with empty object")
    if operand.dimord != obj.dimord:
        raise SPYValueError(
            legal="matching dimord", varname="operand", actual=str(operand.dimord)
        )
    sel_b = operand.selection
    if sel_b is not None:
        trials_b = [sel_b.select_trial_array(operand, k) for k in range(len(sel_b.trial_ids))]
    else:
        trials_b = [np.asarray(t) for t in operand.trials]
    if len(trials_b) != len(trials_a):
        raise SPYValueError(
            legal="matching (selected) trial counts",
            varname="operand",
            actual="{} vs {} trials".format(len(trials_b), len(trials_a)),
        )
    for a, b in zip(trials_a, trials_b):
        if a.shape != b.shape:
            raise SPYValueError(
                legal="matching trial shapes",
                varname="operand",
                actual="{} vs {}".format(a.shape, b.shape),
            )
    return trials_b


def _assemble_output(obj, res, trialdef):
    """Stack per-trial results into a fresh object of obj's class."""
    cls = obj.__class__
    out = cls.__new__(cls)
    cls.__init__(out)
    out._dimord = obj.dimord
    sdim = obj._stackingDim if "sample" not in obj.dimord else 0
    out.data = np.concatenate([np.asarray(r) for r in res], axis=sdim)
    out._trialdefinition = trialdef

    sel = obj.selection

    def _take(labels, indexer):
        labels = np.asarray(labels)
        if indexer is None:
            return labels
        if isinstance(indexer, slice):
            return labels[indexer]
        return labels[np.asarray(indexer, dtype=int)]

    if getattr(obj, "samplerate", None) is not None:
        out.samplerate = obj.samplerate
    if "channel" in obj.dimord and hasattr(out, "channel"):
        ch = obj.channel
        if ch is not None:
            out.channel = _take(ch, getattr(sel, "channel", None) if sel else None)
    for key in ("channel_i", "channel_j"):
        if key in obj.dimord:
            setattr(out, key, _take(getattr(obj, key), getattr(sel, key, None) if sel else None))
    if "freq" in obj.dimord:
        out.freq = _take(obj.freq, getattr(sel, "freq", None) if sel else None)
    if "taper" in obj.dimord:
        out.taper = _take(obj.taper, getattr(sel, "taper", None) if sel else None)
    out._cfg = obj.cfg.copy()
    out._log = str(obj._log)
    return out
