# -*- coding: utf-8 -*-
# Metadata side-channel helpers (reference shared/metadata.py:135-391 and
# tests/test_metadata.py): label encode/decode roundtrips, aux-info
# normalization, freq-hash agreement checks.

import numpy as np
import pytest

from syncopy_tpu.shared.metadata import (
    check_freq_hashes,
    decode_unique_md_label,
    encode_unique_md_label,
    metadata_from_aux_info,
)


class TestUniqueLabels:
    @pytest.mark.parametrize("label", ["freqs_hash", "fooof__peaks", "a_b_c"])
    @pytest.mark.parametrize("trial,chunk", [(0, 0), (7, 3), (123, 45)])
    def test_roundtrip(self, label, trial, chunk):
        enc = encode_unique_md_label(label, trial, chunk)
        got_label, got_trial, got_chunk = decode_unique_md_label(enc)
        assert (got_label, got_trial, got_chunk) == (label, trial, chunk)

    def test_format_matches_reference_convention(self):
        assert encode_unique_md_label("x", 2, 5) == "x__2_5"

    def test_default_chunk(self):
        assert decode_unique_md_label(encode_unique_md_label("h", 9)) == ("h", 9, 0)


class TestAuxInfoNormalization:
    def test_scalars_and_arrays(self):
        aux = {
            "converged": np.asarray(True),
            "err": np.float32(1.5e-6),
            "per_trial": np.arange(3, dtype=np.float32),
            "matrix": np.ones((2, 2)),
        }
        out = metadata_from_aux_info(aux)
        assert out["converged"] is True
        assert isinstance(out["err"], float)
        assert out["per_trial"] == [0.0, 1.0, 2.0]
        assert out["matrix"] == [[1.0, 1.0], [1.0, 1.0]]
        import json

        json.dumps(out)  # must be JSON-serializable

    def test_empty(self):
        assert metadata_from_aux_info({}) == {}


class TestFreqHashes:
    def test_agreeing_hashes_pass(self):
        assert check_freq_hashes(np.full(8, 0x1234, dtype=np.int64), None)

    def test_disagreeing_hashes_warn(self):
        with pytest.warns(RuntimeWarning, match="Frequency axes differ"):
            ok = check_freq_hashes(np.asarray([1, 1, 2]), None)
        assert not ok
