# -*- coding: utf-8 -*-
#
# resampledata frontend (reference syncopy/preproc/resampledata.py:31-230).

from ..shared.errors import SPYError

__all__ = ["resampledata"]


def resampledata(data, **kwargs):
    raise SPYError("resampledata is not implemented yet")
