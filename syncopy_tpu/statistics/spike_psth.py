# -*- coding: utf-8 -*-
#
# spike_psth frontend (reference syncopy/statistics/spike_psth.py:37-248).

from ..shared.errors import SPYError

__all__ = ["spike_psth"]


def spike_psth(data, **kwargs):
    raise SPYError("spike_psth is not implemented yet")
