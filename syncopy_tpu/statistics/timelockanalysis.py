# -*- coding: utf-8 -*-
#
# timelockanalysis frontend (reference syncopy/statistics/timelockanalysis.py:37-264).

from ..shared.errors import SPYError

__all__ = ["timelockanalysis"]


def timelockanalysis(data, **kwargs):
    raise SPYError("timelockanalysis is not implemented yet")
