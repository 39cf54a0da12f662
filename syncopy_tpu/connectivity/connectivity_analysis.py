# -*- coding: utf-8 -*-
#
# connectivityanalysis frontend (reference
# syncopy/connectivity/connectivity_analysis.py:51-872).

from ..shared.errors import SPYError

__all__ = ["connectivityanalysis"]

availableMethods = ("coh", "corr", "granger", "csd", "ppc")


def connectivityanalysis(data, method="coh", **kwargs):
    raise SPYError("connectivityanalysis is not implemented yet")
