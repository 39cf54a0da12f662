# -*- coding: utf-8 -*-
#
# cfg provenance matrix across every frontend (reference tests/test_cfg.py:
# 20-145): run with a cfg, save/load the result, replay the recorded cfg on
# the raw data, and require identical results + identical cfg — with and
# without an in-flight `select`.

import numpy as np
import pytest

import syncopy_tpu as spy


FRONTEND_CFGS = {
    "freqanalysis": {"method": "mtmconvol", "t_ftimwin": 0.1,
                     "foi": np.arange(5, 60, 5.0)},
    "preprocessing": {"freq": 10, "filter_class": "firws", "filter_type": "hp"},
    "resampledata": {"resamplefs": 125, "lpfreq": 60},
    "connectivityanalysis": {"method": "coh", "tapsmofrq": 5},
    "selectdata": {"trials": np.array([1, 7, 3]), "channel": [np.int64(2), 0]},
}


@pytest.fixture(scope="module")
def adata():
    return spy.synthdata.white_noise(
        nTrials=10, nSamples=400, nChannels=3, samplerate=200, seed=42
    )


@pytest.mark.parametrize("frontend", sorted(FRONTEND_CFGS))
class TestCfgMatrix:
    def test_run_and_replay(self, adata, frontend):
        res = getattr(spy, frontend)(adata, **FRONTEND_CFGS[frontend])
        assert frontend in res.cfg
        res2 = getattr(spy, frontend)(adata, res.cfg)
        assert np.allclose(np.asarray(res.data), np.asarray(res2.data),
                           atol=1e-6, equal_nan=True)
        assert res.cfg == res2.cfg

    def test_save_load_replay(self, adata, frontend, tmp_path):
        res = getattr(spy, frontend)(adata, **FRONTEND_CFGS[frontend])
        cfg_before = spy.StructDict(res.cfg)
        res.save(container=str(tmp_path / "res"))
        loaded = spy.load(str(tmp_path / "res.spy"))
        assert loaded.cfg == cfg_before
        res2 = getattr(spy, frontend)(adata, loaded.cfg)
        assert np.allclose(np.asarray(loaded.data), np.asarray(res2.data),
                           atol=1e-6, equal_nan=True)

    def test_selection_recorded_and_replayed(self, adata, frontend):
        if frontend == "selectdata":
            pytest.skip("select kw is the frontend itself")
        select = {"latency": [0.1, 0.9], "trials": [1, 2, 3], "channel": [2, 0]}
        res = getattr(spy, frontend)(adata, cfg=FRONTEND_CFGS[frontend],
                                     select=select)
        assert "select" in res.cfg[frontend]
        res2 = getattr(spy, frontend)(adata, res.cfg)
        assert "select" in res2.cfg[frontend]
        assert np.allclose(np.asarray(res.data), np.asarray(res2.data),
                           atol=1e-6, equal_nan=True)
        assert res.cfg == res2.cfg


class TestCfgChaining:
    def test_three_stage_chain_replay(self, adata):
        """Chained provenance: each output's cfg holds ALL upstream stages
        and replaying stage-by-stage on raw data reproduces the result."""
        filt = spy.preprocessing(adata, **FRONTEND_CFGS["preprocessing"])
        ds = spy.resampledata(filt, **FRONTEND_CFGS["resampledata"])
        spec = spy.freqanalysis(ds, method="mtmfft", taper="hann")
        for stage in ("preprocessing", "resampledata", "freqanalysis"):
            assert stage in spec.cfg
        refilt = spy.preprocessing(adata, spec.cfg)
        reds = spy.resampledata(refilt, spec.cfg)
        respec = spy.freqanalysis(reds, spec.cfg)
        assert np.allclose(np.asarray(spec.data), np.asarray(respec.data),
                           atol=1e-6)
