# -*- coding: utf-8 -*-
# Shared-infrastructure tests (modeled on reference tests/test_parsers.py,
# test_decorators.py, test_cfg.py, test_tools.py, test_logging.py).

import numpy as np
import pytest

import syncopy_tpu as spy
from syncopy_tpu.shared.errors import SPYIOError, SPYTypeError, SPYValueError
from syncopy_tpu.shared.parsers import (
    array_parser,
    data_parser,
    filename_parser,
    io_parser,
    scalar_parser,
    sequence_parser,
)
from syncopy_tpu.shared.tools import StructDict, best_match, get_defaults


class TestScalarParser:
    def test_valid(self):
        scalar_parser(3.0, varname="x", lims=[0, 10])
        scalar_parser(4, varname="x", ntype="int_like")

    def test_invalid_type(self):
        with pytest.raises(SPYTypeError):
            scalar_parser("3", varname="x")
        with pytest.raises(SPYTypeError):
            scalar_parser(None, varname="x")
        with pytest.raises(SPYTypeError):
            scalar_parser(True, varname="x")

    def test_int_like(self):
        with pytest.raises(SPYValueError):
            scalar_parser(3.5, varname="x", ntype="int_like")

    def test_lims(self):
        with pytest.raises(SPYValueError):
            scalar_parser(11, varname="x", lims=[0, 10])


class TestArrayParser:
    def test_valid(self):
        array_parser([1, 2, 3], varname="a", dims=(3,))
        array_parser(np.ones((2, 2)), varname="a", dims=(2, 2))

    def test_nan_inf(self):
        with pytest.raises(SPYValueError):
            array_parser([1, np.nan], varname="a", hasnan=False)
        with pytest.raises(SPYValueError):
            array_parser([1, np.inf], varname="a", hasinf=False)

    def test_lims(self):
        with pytest.raises(SPYValueError):
            array_parser([1, 100], varname="a", lims=[0, 10])


class TestDataParser:
    def test_class_check(self, adata_equal):
        data_parser(adata_equal, varname="d", dataclass="AnalogData")
        with pytest.raises(SPYValueError):
            data_parser(adata_equal, varname="d", dataclass="SpectralData")

    def test_empty_check(self, adata_equal):
        data_parser(adata_equal, varname="d", empty=False)
        with pytest.raises(SPYValueError):
            data_parser(adata_equal, varname="d", empty=True)

    def test_non_spy_object(self):
        with pytest.raises(SPYTypeError):
            data_parser(np.zeros(3), varname="d")


class TestFilenameParser:
    def test_container(self, tmp_path):
        info = filename_parser(str(tmp_path / "sess.spy"))
        assert info["container"] == "sess.spy"
        assert info["basename"] == "sess"

    def test_data_file(self, tmp_path):
        info = filename_parser(str(tmp_path / "sess.spy" / "sess_raw.analog"))
        assert info["container"] == "sess.spy"
        assert info["tag"] == "raw"
        assert info["extension"] == ".analog"

    def test_invalid_extension(self):
        with pytest.raises(SPYValueError):
            filename_parser("/tmp/file.xyz")


class TestStructDict:
    def test_attr_access(self):
        cfg = StructDict()
        cfg.method = "mtmfft"
        assert cfg["method"] == "mtmfft"
        cfg["taper"] = "hann"
        assert cfg.taper == "hann"

    def test_get_defaults(self):
        defaults = get_defaults(spy.freqanalysis)
        assert defaults["method"] == "mtmfft"
        assert defaults["output"] == "pow"
        assert "data" not in defaults


class TestBestMatch:
    def test_exact(self):
        src = np.arange(0, 100, 2.0)
        vals, idx = best_match(src, [10, 30])
        assert np.allclose(vals, [10, 30])

    def test_nearest(self):
        src = np.arange(0, 100, 2.0)
        vals, idx = best_match(src, [11, 31])
        assert np.allclose(vals, [10, 30]) or np.allclose(vals, [12, 32])

    def test_span(self):
        src = np.arange(0, 100, 2.0)
        vals, idx = best_match(src, [10, 20], span=True)
        assert vals[0] == 10 and vals[-1] == 20

    def test_squash(self):
        src = np.arange(0, 10.0)
        vals, idx = best_match(src, [1.1, 1.2, 5], squash_duplicates=True)
        assert len(vals) == 2


class TestCfgConventions:
    def test_cfg_positional(self, adata_equal):
        cfg = spy.StructDict()
        cfg.method = "mtmfft"
        cfg.taper = "hann"
        spec = spy.freqanalysis(adata_equal, cfg)
        assert spec.data.shape[0] == len(adata_equal.trials)

    def test_cfg_with_data_inside(self, adata_equal):
        cfg = spy.StructDict()
        cfg.method = "mtmfft"
        cfg.taper = "hann"
        cfg.data = adata_equal
        spec = spy.freqanalysis(cfg)
        assert spec is not None

    def test_cfg_linguistic_booleans(self, adata_equal):
        cfg = spy.StructDict()
        cfg.method = "mtmfft"
        cfg.taper = "hann"
        cfg.keeptrials = "no"
        spec = spy.freqanalysis(adata_equal, cfg)
        assert spec.data.shape[0] == 1

    def test_cfg_replay_full_chain(self, adata_equal):
        filt = spy.preprocessing(adata_equal, filter_class="but", filter_type="lp", freq=100)
        spec = spy.freqanalysis(filt, method="mtmfft", taper="hann")
        # replaying the cfg on the raw data reproduces the chained result
        refilt = spy.preprocessing(adata_equal, spec.cfg)
        respec = spy.freqanalysis(refilt, spec.cfg)
        assert np.allclose(np.asarray(spec.data), np.asarray(respec.data), atol=1e-6)

    def test_conflicting_cfg_kwarg(self, adata_equal):
        cfg = spy.StructDict()
        cfg.method = "mtmfft"
        with pytest.raises(SPYValueError):
            spy.freqanalysis(adata_equal, cfg, method="wavelet")

    def test_select_restored_on_error(self, adata_equal):
        with pytest.raises(Exception):
            spy.freqanalysis(adata_equal, method="nope", select={"trials": [0]})
        assert adata_equal.selection is None


class TestSequenceParser:
    def test_valid(self):
        assert sequence_parser([1, 2, 3], varname="s") == [1, 2, 3]

    def test_content_type(self):
        with pytest.raises(SPYTypeError):
            sequence_parser([1, "a"], varname="s", content_type=int)

    def test_scalar_rejected(self):
        with pytest.raises(SPYTypeError):
            sequence_parser(3, varname="s")


class TestLogging:
    def test_loggers_exist(self):
        lg = spy.get_logger()
        assert lg is not None
        plg = spy.get_parallel_logger()
        assert plg is not None

    def test_set_loglevel(self):
        import logging

        prior = spy.get_logger().level
        try:
            spy.set_loglevel("DEBUG")
            assert spy.get_logger().level == logging.DEBUG
            spy.set_loglevel("WARNING")
            assert spy.get_logger().level == logging.WARNING
        finally:
            spy.get_logger().setLevel(prior)

    def test_object_log_history(self, adata_equal):
        spec = spy.freqanalysis(adata_equal, method="mtmfft", taper="hann")
        assert "MultiTaperFFT" in spec.log
        assert "created" in spec.log


class TestClusterSetup:
    def test_esi_cluster_setup_installs_mesh(self):
        import syncopy_tpu as spy

        mesh = spy.esi_cluster_setup(n_workers=2, partition="8GBXS", mem_per_worker="2GB")
        try:
            assert spy.active_mesh() is mesh
            assert mesh.shape["trial"] * mesh.shape.get("channel", 1) == 2
            # analyses pick up the installed mesh via parallel=None
            d = spy.synthdata.white_noise(nTrials=4, nSamples=256, nChannels=2, seed=30)
            spec = spy.freqanalysis(d, method="mtmfft", taper="hann")
            assert spec.data.shape[0] == 4
        finally:
            spy.cluster_cleanup()
        assert spy.active_mesh() is None

    def test_too_many_workers(self):
        import syncopy_tpu as spy

        with pytest.raises(spy.SPYParallelError):
            spy.esi_cluster_setup(n_workers=10**6)


class TestChainedCfgReplay:
    def test_two_stage_pipeline_replay(self):
        """A chained analysis is fully reproducible from the final object's
        cfg (reference tests/test_cfg.py pattern): each frontend stage can
        be replayed with the same cfg container."""
        import syncopy_tpu as spy

        d = spy.synthdata.ar2_network(nTrials=15, samplerate=200, nSamples=300, seed=34)
        spec = spy.freqanalysis(d, tapsmofrq=3, output="fourier", keeptapers=True)
        coh = spy.connectivityanalysis(spec, method="coh")

        spec2 = spy.freqanalysis(d, coh.cfg)
        coh2 = spy.connectivityanalysis(spec2, coh.cfg)
        assert np.allclose(np.asarray(coh.data), np.asarray(coh2.data))
        assert list(coh2.cfg.keys()) == list(coh.cfg.keys())


class TestFrontendDocAmendment:
    """unwrap_cfg amends the public docstring/signature so `help(frontend)`
    documents the cfg convention (reference kwarg_decorators.py:200-299)."""

    def test_signature_gains_cfg(self):
        import inspect

        for fe in (spy.freqanalysis, spy.connectivityanalysis, spy.preprocessing,
                   spy.resampledata, spy.mean):
            sig = inspect.signature(fe)
            assert "cfg" in sig.parameters, fe.__name__
            assert sig.parameters["cfg"].default is None

    def test_docstring_mentions_cfg(self):
        assert "cfg" in spy.freqanalysis.__doc__
        assert "FieldTrip-style" in spy.connectivityanalysis.__doc__

    def test_get_defaults_excludes_cfg(self):
        from syncopy_tpu.shared.tools import get_defaults

        assert "cfg" not in get_defaults(spy.freqanalysis)


class TestBestMatchMatrix:
    """best_match semantics (reference test_spytools.py:31-120)."""

    def _sources(self):
        rng = np.random.default_rng(0)
        int_src = np.arange(0, 20)
        rand_int = rng.permutation(int_src)
        float_src = np.linspace(0, 19, 39)
        return int_src, rand_int, float_src

    def test_nearest_value_and_index(self):
        from syncopy_tpu.shared.tools import best_match

        int_src, rand_int, float_src = self._sources()
        sel = np.array([1.4, 2.6, 2.6, 17.8])
        for source in (int_src, rand_int):
            val, idx = best_match(source, sel)
            expected = np.round(sel)
            assert np.array_equal(val, expected)
            assert np.array_equal(source[idx], expected)

    def test_squash_duplicates_keeps_order(self):
        from syncopy_tpu.shared.tools import best_match

        int_src, _, _ = self._sources()
        sel = np.array([2.6, 2.6, 1.4, 17.8])
        val, idx = best_match(int_src, sel, squash_duplicates=True)
        assert np.array_equal(np.sort(val), np.unique(np.round(sel)))
        assert len(val) == 3

    def test_tolerance_violation(self):
        from syncopy_tpu.shared.tools import best_match

        int_src, _, _ = self._sources()
        with pytest.raises(spy.SPYValueError):
            best_match(int_src, np.array([1.4, 2.6]), tol=1e-6)

    def test_span_selection(self):
        from syncopy_tpu.shared.tools import best_match

        _, _, float_src = self._sources()
        val, idx = best_match(float_src, [2.0, 5.0], span=True)
        assert np.all((val >= 2.0) & (val <= 5.0))
        assert np.array_equal(float_src[idx], val)


class TestStructDictCopy:
    """StructDict copy semantics (reference test_tools.py:18-180,
    issue #394: copying must not degrade to a plain dict)."""

    def _cfg(self):
        cfg = spy.StructDict()
        cfg.a = 0.5
        cfg.b = "test"
        cfg.c = [1, 2, 3]
        return cfg

    def test_shallow_copy_type_and_sharing(self):
        from syncopy_tpu.shared.tools import StructDict

        cfg = self._cfg()
        cfg2 = cfg.copy()
        assert type(cfg2) is StructDict
        cfg.c.append(4)
        assert cfg2.c == cfg.c  # shallow: list shared

    def test_deepcopy_isolates(self):
        import copy

        from syncopy_tpu.shared.tools import StructDict

        cfg = self._cfg()
        cfg3 = copy.deepcopy(cfg)
        assert type(cfg3) is StructDict
        cfg.c.append(4)
        assert cfg3.c == [1, 2, 3]

    def test_from_dict_and_attribute_access(self):
        from syncopy_tpu.shared.tools import StructDict

        cfg = StructDict({"a": 0.5, "nested": {"x": 1}})
        assert cfg.a == 0.5
        assert cfg["a"] == 0.5
        cfg.new = 7
        assert cfg["new"] == 7


class TestParserMatrix:
    """Parser validation matrix (reference test_parsers.py:30-357)."""

    def test_scalar_parser(self):
        from syncopy_tpu.shared.parsers import scalar_parser

        scalar_parser(4, varname="x", ntype="int_like", lims=[-4, 4])
        scalar_parser(4.0, varname="x", lims=[0, 10])
        with pytest.raises(spy.SPYValueError):
            scalar_parser(5, varname="x", lims=[0, 4])
        with pytest.raises(spy.SPYValueError):
            scalar_parser(4.5, varname="x", ntype="int_like")
        with pytest.raises(spy.SPYTypeError):
            scalar_parser("4", varname="x")
        # complex values are scalars too; limits apply to |z|-style checks
        with pytest.raises(spy.SPYValueError):
            scalar_parser(complex(2, -1), varname="x", lims=[-3, 1])

    def test_array_parser(self):
        from syncopy_tpu.shared.parsers import array_parser

        arr = np.arange(10, dtype=float)
        array_parser(arr, varname="a", dims=1)
        array_parser(arr, varname="a", lims=[0, 9])
        with pytest.raises(spy.SPYValueError):
            array_parser(arr, varname="a", lims=[1, 8])
        with pytest.raises(spy.SPYValueError):
            array_parser(np.ones((2, 2)), varname="a", dims=1)
        with pytest.raises(spy.SPYValueError):
            array_parser(arr + 0.5, varname="a", ntype="int_like")

    def test_io_parser(self, tmp_path):
        from syncopy_tpu.shared.parsers import io_parser

        f = tmp_path / "x.dat"
        f.write_text("hi")
        io_parser(str(f), varname="f", isfile=True, exists=True)
        io_parser(str(tmp_path), varname="d", isfile=False, exists=True)
        with pytest.raises(spy.SPYIOError):
            io_parser(str(tmp_path / "missing.dat"), varname="f", exists=True)

    def test_data_parser(self):
        from syncopy_tpu.shared.parsers import data_parser

        d = spy.synthdata.white_noise(nTrials=2, nSamples=64, nChannels=2, seed=0)
        data_parser(d, varname="d", dataclass="AnalogData", empty=False)
        with pytest.raises(spy.SPYValueError):
            data_parser(d, varname="d", dataclass="SpectralData")
        empty = spy.AnalogData()
        with pytest.raises(spy.SPYValueError):
            data_parser(empty, varname="d", empty=False)
        with pytest.raises(spy.SPYTypeError):
            data_parser(np.ones(3), varname="d")

    def test_filename_parser(self, tmp_path):
        from syncopy_tpu.shared.parsers import filename_parser

        info = filename_parser(str(tmp_path / "sess.spy" / "sess_test.analog"))
        assert info["container"] == "sess.spy"
        assert info["extension"] == ".analog"
        with pytest.raises(spy.SPYValueError):
            filename_parser(str(tmp_path / "file.bogus_ext"))


class TestCfgCallStyles:
    """unwrap_cfg call-convention matrix (reference test_decorators.py:54-170)."""

    @pytest.fixture()
    def ad(self):
        return spy.synthdata.white_noise(nTrials=3, nSamples=128, nChannels=2, seed=0)

    def _run(self, *args, **kwargs):
        res = spy.freqanalysis(*args, method="mtmfft", taper="hann", **kwargs)
        return np.asarray(res.data)

    def test_valid_call_styles(self, ad):
        ref = self._run(ad)
        cfg = spy.StructDict()
        cfg.method = "mtmfft"
        cfg.taper = "hann"
        # cfg carrying the data
        cfg_with_data = spy.StructDict(dict(cfg))
        cfg_with_data.data = ad
        assert np.allclose(np.asarray(spy.freqanalysis(cfg_with_data).data), ref)
        # data positional + cfg positional (both orders)
        assert np.allclose(np.asarray(spy.freqanalysis(ad, cfg).data), ref)
        assert np.allclose(np.asarray(spy.freqanalysis(cfg, ad).data), ref)
        # data positional + cfg keyword
        assert np.allclose(np.asarray(spy.freqanalysis(ad, cfg=cfg).data), ref)
        # cfg.dataset alias
        cfg_ds = spy.StructDict(dict(cfg))
        cfg_ds.dataset = ad
        assert np.allclose(np.asarray(spy.freqanalysis(cfg_ds).data), ref)

    def test_data_in_cfg_and_positional_rejected(self, ad):
        cfg = spy.StructDict()
        cfg.method = "mtmfft"
        cfg.taper = "hann"
        cfg.data = ad
        with pytest.raises(spy.SPYValueError, match="positionally or via cfg"):
            spy.freqanalysis(ad, cfg)

    def test_conflicting_cfg_and_kwarg_rejected(self, ad):
        cfg = spy.StructDict()
        cfg.method = "mtmfft"
        with pytest.raises(spy.SPYValueError, match="non-conflicting"):
            spy.freqanalysis(ad, cfg, method="wavelet")

    def test_two_cfgs_rejected(self, ad):
        cfg = spy.StructDict()
        cfg.method = "mtmfft"
        with pytest.raises(spy.SPYValueError, match="single"):
            spy.freqanalysis(cfg, dict(cfg), data=ad)

    def test_linguistic_booleans(self, ad):
        cfg = spy.StructDict()
        cfg.method = "mtmfft"
        cfg.taper = "hann"
        cfg.keeptrials = "no"
        res = spy.freqanalysis(ad, cfg)
        assert res.data.shape[0] == 1


class TestDirSizeUnits:
    def test_unit_scaling(self, tmp_path):
        (tmp_path / "a.bin").write_bytes(b"\0" * 2_000_000)
        b, n = spy.get_dir_size(str(tmp_path))
        assert (b, n) == (2_000_000, 1)
        mb, _ = spy.get_dir_size(str(tmp_path), unit="MB")
        assert mb == pytest.approx(2.0)
        gb, _ = spy.get_dir_size(str(tmp_path), unit="GB")
        assert gb == pytest.approx(0.002)


class TestDecoratorSemantics:
    """unwrap_cfg/unwrap_select edge semantics (reference
    tests/test_decorators.py)."""

    def _data(self):
        return spy.synthdata.white_noise(nTrials=4, nSamples=128,
                                         nChannels=3, seed=2)

    def test_select_restores_prior_selection(self):
        d = self._data()
        d.selectdata(inplace=True, channel=[0])
        spy.freqanalysis(d, method="mtmfft", taper="hann",
                         select={"trials": [1, 2]})
        # the transient select was reverted; the prior one survives
        assert d.selection is not None
        sel_ch = d.selection.channel
        if isinstance(sel_ch, slice):
            assert sel_ch == slice(0, 1, 1)
        else:
            assert list(sel_ch) == [0]
        d.selectdata(clear=True, inplace=True)

    def test_select_restored_after_error(self):
        d = self._data()
        with pytest.raises((spy.SPYValueError, spy.SPYTypeError, spy.SPYError)):
            spy.freqanalysis(d, method="mtmfft", taper="hann",
                             foi=[-1, 1000], select={"trials": [0]})
        assert d.selection is None  # transient selection rolled back

    def test_linguistic_booleans(self):
        d = self._data()
        cfg = spy.StructDict()
        cfg.method = "mtmfft"
        cfg.taper = "hann"
        cfg.keeptrials = "no"
        out = spy.freqanalysis(d, cfg)
        assert len(out.trials) == 1
        cfg.keeptrials = "yes"
        out2 = spy.freqanalysis(d, cfg)
        assert len(out2.trials) == 4

    def test_cfg_dataset_entry(self):
        d = self._data()
        cfg = spy.StructDict()
        cfg.dataset = d
        cfg.method = "mtmfft"
        cfg.taper = "hann"
        out = spy.freqanalysis(cfg)
        assert out.data is not None

    def test_cfg_and_kwarg_conflict_rejected(self):
        d = self._data()
        cfg = spy.StructDict()
        cfg.method = "mtmfft"
        with pytest.raises((spy.SPYValueError, spy.SPYError)):
            spy.freqanalysis(d, cfg, method="wavelet")

    def test_unknown_kwarg_warns(self):
        d = self._data()
        with pytest.warns(RuntimeWarning):
            spy.freqanalysis(d, method="mtmfft", taper="hann",
                             not_a_real_option=1)

    def test_select_dict_validated(self):
        d = self._data()
        with pytest.raises((spy.SPYValueError, spy.SPYTypeError, spy.SPYError)):
            spy.freqanalysis(d, method="mtmfft", taper="hann",
                             select={"bogus_axis": [0]})
