# -*- coding: utf-8 -*-
#
# Summary statistics (reference syncopy/statistics/summary_stats.py:24-530).

from ..shared.errors import SPYError

__all__ = ["mean", "std", "var", "median", "itc"]


def mean(spy_data, dim=None, keeptrials=False, **kwargs):
    raise SPYError("mean is not implemented yet")


def std(spy_data, dim=None, keeptrials=False, **kwargs):
    raise SPYError("std is not implemented yet")


def var(spy_data, dim=None, keeptrials=False, **kwargs):
    raise SPYError("var is not implemented yet")


def median(spy_data, dim=None, keeptrials=False, **kwargs):
    raise SPYError("median is not implemented yet")


def itc(spy_data, **kwargs):
    raise SPYError("itc is not implemented yet")
