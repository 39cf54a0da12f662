# -*- coding: utf-8 -*-
# Complex-pair boundary encoding tests (parallel/device_io.py): the
# load-bearing machinery for TPU runtimes without complex transfer support.

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from syncopy_tpu.parallel.device_io import (
    _RUN_CACHE,
    decode_host,
    decode_in_jit,
    encode_host,
    encode_in_jit,
    run_on_device,
)


class TestEncoding:
    def test_roundtrip_complex(self):
        rng = np.random.default_rng(0)
        z = rng.normal(size=(5, 7)) + 1j * rng.normal(size=(5, 7))
        z = z.astype(np.complex64)
        enc, flag = encode_host(z, axis=0)
        assert flag and enc.shape == (2, 5, 7) and enc.dtype == np.float32
        assert np.allclose(decode_host(enc, flag, axis=0), z)

    def test_roundtrip_axis1(self):
        z = (np.arange(12).reshape(3, 4) * (1 + 2j)).astype(np.complex64)
        enc, flag = encode_host(z, axis=1)
        assert enc.shape == (3, 2, 4)
        assert np.allclose(decode_host(enc, flag, axis=1), z)

    def test_real_passthrough(self):
        x = np.ones((3, 3), dtype=np.float32)
        enc, flag = encode_host(x)
        assert not flag and enc is x

    def test_complex128(self):
        z = np.ones((2, 2), dtype=np.complex128) * (1 + 1j)
        enc, flag = encode_host(z)
        assert enc.dtype == np.float64
        assert decode_host(enc, flag).dtype == np.complex128

    def test_in_jit_roundtrip(self):
        z = (np.random.default_rng(1).normal(size=(4, 6))).astype(np.float32) * (1 + 0j)
        z = z.astype(np.complex64) + 1j * 0.5

        @jax.jit
        def f(enc):
            c = decode_in_jit(enc, True, axis=0)
            return encode_in_jit(c * 2, axis=0)[0]

        enc, _ = encode_host(z)
        out = decode_host(np.asarray(f(enc)), True)
        assert np.allclose(out, 2 * z, atol=1e-6)


class TestRunOnDevice:
    def test_complex_in_real_out(self):
        z = (np.random.default_rng(2).normal(size=(8, 4))
             + 1j * np.random.default_rng(3).normal(size=(8, 4))).astype(np.complex64)
        got = run_on_device(lambda c: jnp.abs(c) ** 2, z, key=("test_abs2",))
        assert np.allclose(got, np.abs(z) ** 2, atol=1e-5)

    def test_complex_out(self):
        x = np.random.default_rng(4).normal(size=(16, 2)).astype(np.float32)
        got = run_on_device(lambda v: jnp.fft.fft(v, axis=0), x, key=("test_fft",))
        assert np.allclose(got, np.fft.fft(x, axis=0), atol=1e-4)

    def test_pytree_output(self):
        x = np.ones((4, 4), dtype=np.float32)
        a, b = run_on_device(lambda v: (v + 1, v * 1j), x, key=("test_tree",))
        assert np.allclose(a, 2.0)
        assert np.iscomplexobj(b)

    def test_wrapper_cached(self):
        x = np.zeros((4, 4), dtype=np.float32)
        key = ("test_cache_hit",)
        run_on_device(lambda v: v + 1, x, key=key)
        n = len(_RUN_CACHE)
        run_on_device(lambda v: v + 1, x, key=key)
        assert len(_RUN_CACHE) == n  # same key+shape -> reused

    def test_different_shapes_not_conflated(self):
        key = ("test_shapes",)
        a = run_on_device(lambda v: v.sum(), np.ones((2, 2), "f4"), key=key)
        b = run_on_device(lambda v: v.sum(), np.ones((3, 3), "f4"), key=key)
        assert float(a) == 4.0 and float(b) == 9.0
