# -*- coding: utf-8 -*-
#
# Plotting dispatch (reference syncopy/plotting/spy_plotting.py:13-53).

from ..shared.errors import SPYError

__all__ = ["singlepanelplot", "multipanelplot"]


def singlepanelplot(data, **show_kwargs):
    raise SPYError("singlepanelplot is not implemented yet")


def multipanelplot(data, **show_kwargs):
    raise SPYError("multipanelplot is not implemented yet")
