# -*- coding: utf-8 -*-
# Package-level behavior (modeled on reference tests/test_packagesetup.py):
# namespace assembly, session storage, temp-file hygiene.

import os

import numpy as np
import pytest

import syncopy_tpu as spy


class TestNamespace:
    def test_all_exports_resolve(self):
        for name in spy.__all__:
            assert hasattr(spy, name), name

    def test_frontends_present(self):
        for fe in ("freqanalysis", "connectivityanalysis", "preprocessing",
                   "resampledata", "spike_psth", "timelockanalysis",
                   "mean", "std", "var", "median", "itc",
                   "save", "load", "selectdata", "redefinetrial", "concat",
                   "singlepanelplot", "multipanelplot", "cleanup"):
            assert callable(getattr(spy, fe)), fe

    def test_data_classes_present(self):
        for cls in ("AnalogData", "SpectralData", "CrossSpectralData",
                    "TimeLockData", "SpikeData", "EventData"):
            assert isinstance(getattr(spy, cls), type)

    def test_sessionid(self):
        assert isinstance(spy.__sessionid__, str) and len(spy.__sessionid__) == 8


class TestStorage:
    def test_storage_dir_exists(self):
        assert os.path.isdir(spy.__storage__)

    def test_temp_file_reaped_on_delete(self):
        import gc

        obj = spy.AnalogData(data=np.zeros((100, 2), dtype="f4"), samplerate=100)
        fname = obj.to_hdf()
        assert os.path.exists(fname)
        del obj
        gc.collect()
        assert not os.path.exists(fname)

    def test_clear_keeps_live_objects(self):
        obj = spy.AnalogData(data=np.zeros((50, 2), dtype="f4"), samplerate=50)
        fname = obj.to_hdf()
        spy.clear()
        assert os.path.exists(fname)
        del obj
