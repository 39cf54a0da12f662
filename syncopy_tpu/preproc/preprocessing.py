# -*- coding: utf-8 -*-
#
# preprocessing frontend (reference syncopy/preproc/preprocessing.py:45-411).

from ..shared.errors import SPYError

__all__ = ["preprocessing"]


def preprocessing(data, **kwargs):
    raise SPYError("preprocessing is not implemented yet")
