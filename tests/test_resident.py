# -*- coding: utf-8 -*-
#
# Device-resident outputs (engine/resident.py): chained pipelines must stay
# in HBM until the final stage, with deferred readback that is bit-equal to
# the eager host path.

import numpy as np
import pytest

import syncopy_tpu as spy
from syncopy_tpu.engine import routine
from syncopy_tpu.engine.resident import DeferredArray, _REGISTRY


@pytest.fixture()
def adata():
    rng = np.random.default_rng(7)
    arr = rng.normal(size=(20 * 256, 4)).astype(np.float32)
    trl = np.stack([np.arange(0, 20 * 256, 256), np.arange(256, 20 * 256 + 1, 256),
                    np.full(20, -50)], axis=1)
    return spy.AnalogData(data=arr, samplerate=1000, trialdefinition=trl)


def _host_reference(adata, fn, *args, **kwargs):
    """Run `fn` with residency disabled."""
    import os

    os.environ["SPY_TPU_DEVICE_RESIDENT"] = "0"
    try:
        return fn(adata, *args, **kwargs)
    finally:
        del os.environ["SPY_TPU_DEVICE_RESIDENT"]


class TestResidentChain:
    def test_chain_stays_on_device(self, adata):
        pre = spy.preprocessing(adata, filter_class="but", filter_type="lp",
                                freq=100, order=4)
        assert isinstance(pre._data, DeferredArray)
        spec = spy.freqanalysis(pre, method="mtmfft", output="fourier",
                                keeptrials=True)
        # consuming `pre` must NOT have materialized it
        assert isinstance(pre._data, DeferredArray)
        assert isinstance(spec._data, DeferredArray)
        coh = spy.connectivityanalysis(spec, method="coh")
        # the complex spectrum was consumed straight from HBM
        assert isinstance(spec._data, DeferredArray)
        assert coh.data.shape[-1] == 4

    def test_chain_matches_host_path(self, adata):
        pre = spy.preprocessing(adata, filter_class="but", filter_type="lp",
                                freq=100, order=4)
        spec = spy.freqanalysis(pre, method="mtmfft", output="fourier",
                                keeptrials=True)
        coh = spy.connectivityanalysis(spec, method="coh")

        pre2 = _host_reference(adata, spy.preprocessing, filter_class="but",
                               filter_type="lp", freq=100, order=4)
        spec2 = _host_reference(pre2, spy.freqanalysis, method="mtmfft",
                                output="fourier", keeptrials=True)
        coh2 = _host_reference(spec2, spy.connectivityanalysis, method="coh")

        assert np.array_equal(np.asarray(coh.data), np.asarray(coh2.data))
        assert np.array_equal(np.asarray(spec.data), np.asarray(spec2.data))
        assert np.array_equal(np.asarray(pre.data), np.asarray(pre2.data))

    def test_metadata_without_materialization(self, adata):
        spec = spy.freqanalysis(adata, method="mtmfft", output="pow",
                                keeptrials=True)
        # all of these are shape/label reads — none may trigger readback
        assert spec.data.shape == (20, 1, 129, 4)
        assert len(spec.freq) == 129
        assert len(spec.channel) == 4
        assert len(spec.trials) == 20
        str(spec)
        assert isinstance(spec._data, DeferredArray)

    def test_selection_falls_back_to_host(self, adata):
        pre = spy.preprocessing(adata, filter_class="but", filter_type="lp",
                                freq=100, order=4)
        spy.selectdata(pre, trials=[0, 2, 4], inplace=True)
        spec = spy.freqanalysis(pre, method="mtmfft", output="pow")
        pre._selection = None
        # fallback materialized the producer
        assert not isinstance(pre._data, DeferredArray)
        pre2 = _host_reference(adata, spy.preprocessing, filter_class="but",
                               filter_type="lp", freq=100, order=4)
        spy.selectdata(pre2, trials=[0, 2, 4], inplace=True)
        spec2 = _host_reference(pre2, spy.freqanalysis, method="mtmfft", output="pow")
        assert np.allclose(np.asarray(spec.data), np.asarray(spec2.data), atol=1e-6)

    def test_mutation_after_seal_disables_consumption(self, adata):
        pre = spy.preprocessing(adata, filter_class="but", filter_type="lp",
                                freq=100, order=4)
        res = pre._device_resident
        assert res.consumable_by(pre)
        # re-defining trials invalidates the trial->record mapping ...
        pre.trialdefinition = pre.trialdefinition
        assert not res.consumable_by(pre)
        # ... but the payload itself is still recoverable, bit-exact
        pre2 = _host_reference(adata, spy.preprocessing, filter_class="but",
                               filter_type="lp", freq=100, order=4)
        assert np.array_equal(np.asarray(pre.data), np.asarray(pre2.data))

    def test_ragged_trials_roundtrip(self):
        rng = np.random.default_rng(3)
        trls = [rng.normal(size=(n, 3)).astype("f4") for n in (300, 400, 300, 400)]
        ad = spy.AnalogData(data=trls, samplerate=1000)
        pre = spy.preprocessing(ad, filter_class="firws", filter_type="lp", freq=80)
        assert isinstance(pre._data, DeferredArray)
        pre2 = _host_reference(ad, spy.preprocessing, filter_class="firws",
                               filter_type="lp", freq=80)
        assert np.array_equal(np.asarray(pre.data), np.asarray(pre2.data))

    def test_hbm_budget_evicts_by_materializing(self, adata, monkeypatch):
        monkeypatch.setenv("SPY_TPU_RESIDENT_BYTES", "200000")
        first = spy.preprocessing(adata, filter_class="but", filter_type="lp",
                                  freq=100, order=4)
        assert isinstance(first._data, DeferredArray)
        # the next resident result exceeds the budget together with `first`:
        # `first` must be flushed to host (data preserved), not dropped
        second = spy.preprocessing(adata, filter_class="but", filter_type="hp",
                                   freq=10, order=4)
        assert first._device_resident.materialized
        ref = _host_reference(adata, spy.preprocessing, filter_class="but",
                              filter_type="lp", freq=100, order=4)
        assert np.array_equal(np.asarray(first.data), np.asarray(ref.data))

    def test_save_materializes(self, adata, tmp_path):
        spec = spy.freqanalysis(adata, method="mtmfft", output="pow",
                                keeptrials=True)
        assert isinstance(spec._data, DeferredArray)
        spy.save(spec, container=str(tmp_path / "resident_spec"))
        loaded = spy.load(str(tmp_path / "resident_spec.spy"))
        assert np.array_equal(np.asarray(loaded.data), np.asarray(spec.data))

    def test_parallel_mesh_consumption(self, adata):
        from syncopy_tpu.parallel.mesh import make_mesh, use_mesh

        with use_mesh(make_mesh()):
            pre = spy.preprocessing(adata, filter_class="but", filter_type="lp",
                                    freq=100, order=4)
            assert isinstance(pre._data, DeferredArray)
            spec = spy.freqanalysis(pre, method="mtmfft", output="pow",
                                    keeptrials=True)
            assert isinstance(pre._data, DeferredArray)
        spec2 = _host_reference(adata, lambda d, **kw: spy.freqanalysis(
            spy.preprocessing(d, filter_class="but", filter_type="lp",
                              freq=100, order=4),
            method="mtmfft", output="pow", keeptrials=True))
        assert np.allclose(np.asarray(spec.data), np.asarray(spec2.data), atol=1e-5)

    def test_registry_prunes_dead_objects(self, adata):
        n0 = len([r for r in _REGISTRY if r() is not None])
        pre = spy.preprocessing(adata, filter_class="but", filter_type="lp",
                                freq=100, order=4)
        del pre
        import gc

        gc.collect()
        routine.clear_device_cache()  # also prunes the registry
        assert len([r for r in _REGISTRY if r() is not None]) <= n0 + 1
