# -*- coding: utf-8 -*-
# .info metadata property tests (modeled on reference tests/test_info.py).

import numpy as np
import pytest

import syncopy_tpu as spy
from syncopy_tpu.shared.errors import SPYTypeError


class TestInfo:
    def test_set_and_roundtrip(self, tmp_path, adata_equal):
        adata_equal.info = {"subject": "monkey1", "sessions": [1, 2, 3]}
        adata_equal.info["score"] = 0.9
        fname = spy.save(adata_equal, container=str(tmp_path / "inf"))
        loaded = spy.load(fname)
        assert loaded.info["subject"] == "monkey1"
        assert loaded.info["sessions"] == [1, 2, 3]
        assert loaded.info["score"] == 0.9

    def test_numpy_values_sanitized(self, adata_equal):
        adata_equal.info["arr"] = np.arange(3)
        assert adata_equal.info["arr"] == [0, 1, 2]
        adata_equal.info["scalar"] = np.float32(1.5)
        assert adata_equal.info["scalar"] == 1.5

    def test_non_serializable_rejected(self, adata_equal):
        with pytest.raises(SPYTypeError):
            adata_equal.info["bad"] = object()

    def test_info_requires_dict(self, adata_equal):
        with pytest.raises(SPYTypeError):
            adata_equal.info = "not a dict"


class TestSaveOverwrite:
    def test_overwrite_guard(self, tmp_path, adata_equal):
        fname = spy.save(adata_equal, container=str(tmp_path / "ow"))
        other = adata_equal.copy()
        with pytest.raises(spy.SPYIOError):
            spy.save(other, filename=fname)
        spy.save(other, filename=fname, overwrite=True)

    def test_resave_same_object(self, tmp_path, adata_equal):
        fname = spy.save(adata_equal, container=str(tmp_path / "rs"))
        adata_equal.log = "more history"
        fname2 = spy.save(adata_equal, container=str(tmp_path / "rs"), overwrite=True)
        assert fname == fname2
        loaded = spy.load(fname2)
        assert "more history" in loaded.log
