# -*- coding: utf-8 -*-
#
# Property-based invariants (hypothesis): selector composition, arithmetic
# group laws, boundary-encoding roundtrips, trial-definition roundtrips.
# Bounded example counts keep suite runtime sane.

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import syncopy_tpu as spy
from syncopy_tpu.parallel.device_io import decode_host, encode_host

N_TRIALS, N_SAMPLES, N_CHAN = 5, 8, 4


def _adata():
    data = np.arange(N_TRIALS * N_SAMPLES * N_CHAN, dtype="f4")
    data = data.reshape(N_TRIALS * N_SAMPLES, N_CHAN)
    starts = np.arange(0, N_TRIALS * N_SAMPLES, N_SAMPLES)
    trl = np.column_stack([starts, starts + N_SAMPLES, np.full(N_TRIALS, -2.0)])
    return spy.AnalogData(data=data, samplerate=2.0, trialdefinition=trl)


idx_lists = st.lists(st.integers(0, N_TRIALS - 1), min_size=1, max_size=6)
chan_lists = st.lists(st.integers(0, N_CHAN - 1), min_size=1, max_size=6)


class TestSelectorProperties:
    @settings(max_examples=25, deadline=None)
    @given(trials1=idx_lists, trials2=st.data())
    def test_trial_selection_composes(self, trials1, trials2):
        """select(select(x, A), B) == select(x, A[B]) for any index lists."""
        ad = _adata()
        inner = spy.selectdata(ad, {"trials": trials1})
        t2 = trials2.draw(st.lists(st.integers(0, len(trials1) - 1),
                                   min_size=1, max_size=4))
        outer = spy.selectdata(inner, {"trials": t2})
        composed = spy.selectdata(ad, {"trials": [trials1[i] for i in t2]})
        assert np.array_equal(np.asarray(outer.data), np.asarray(composed.data))

    @settings(max_examples=25, deadline=None)
    @given(chans=chan_lists)
    def test_channel_selection_is_column_gather(self, chans):
        ad = _adata()
        res = spy.selectdata(ad, {"channel": chans})
        assert np.array_equal(np.asarray(res.data),
                              np.asarray(ad.data)[:, chans])
        assert list(res.channel) == [ad.channel[i] for i in chans]


class TestArithmeticProperties:
    @settings(max_examples=20, deadline=None)
    @given(a=st.floats(-1e3, 1e3, allow_nan=False), b=st.floats(0.5, 8.0))
    def test_affine_roundtrip(self, a, b):
        ad = _adata()
        out = (ad + a) * b / b - a
        assert np.allclose(np.asarray(out.data), np.asarray(ad.data),
                           rtol=1e-4, atol=1e-2 * max(abs(a), 1.0))

    @settings(max_examples=20, deadline=None)
    @given(scale=st.floats(0.25, 4.0))
    def test_object_difference_is_zero(self, scale):
        ad = _adata()
        out = ad * scale - ad * scale
        assert np.allclose(np.asarray(out.data), 0.0, atol=1e-3)


class TestBoundaryEncoding:
    @settings(max_examples=25, deadline=None)
    @given(shape=st.tuples(st.integers(1, 4), st.integers(1, 5),
                           st.integers(1, 6)),
           seed=st.integers(0, 2**31 - 1),
           cplx=st.booleans(),
           axis=st.integers(0, 2))
    def test_encode_decode_roundtrip(self, shape, seed, cplx, axis):
        """(re, im) pair encoding is lossless for any shape/axis/dtype."""
        rng = np.random.default_rng(seed)
        arr = rng.normal(size=shape).astype(np.float32)
        if cplx:
            arr = (arr + 1j * rng.normal(size=shape).astype(np.float32)).astype(
                np.complex64)
        enc, was_c = encode_host(arr, axis=axis)
        assert was_c == cplx
        assert not np.iscomplexobj(enc)
        dec = decode_host(enc, was_c, axis=axis)
        assert dec.dtype == arr.dtype
        assert np.array_equal(dec, arr)


class TestTrialdefinitionProperties:
    @settings(max_examples=25, deadline=None)
    @given(n=st.integers(1, 6), length=st.integers(2, 10),
           offset=st.integers(-20, 20))
    def test_definetrial_time_axis_roundtrip(self, n, length, offset):
        """For any uniform segmentation, per-trial time axes follow
        (arange(len) + offset) / fs exactly."""
        fs = 2.0
        data = np.zeros((n * length, 2), "f4")
        starts = np.arange(n) * length
        trl = np.column_stack([starts, starts + length,
                               np.full(n, float(offset))])
        ad = spy.AnalogData(data=data, samplerate=fs)
        spy.definetrial(ad, trialdefinition=trl)
        for t in ad.time:
            assert np.allclose(t, (np.arange(length) + offset) / fs)
        assert len(ad.trials) == n

    @settings(max_examples=15, deadline=None)
    @given(keep=st.lists(st.integers(0, N_TRIALS - 1), min_size=1,
                         max_size=N_TRIALS, unique=True))
    def test_redefinetrial_trials_subset(self, keep):
        ad = _adata()
        out = spy.redefinetrial(ad, trials=sorted(keep))
        assert len(out.trials) == len(keep)
        for i, tid in enumerate(sorted(keep)):
            assert np.array_equal(np.asarray(out.trials[i]),
                                  np.asarray(ad.trials[tid]))
