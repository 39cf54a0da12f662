# -*- coding: utf-8 -*-
#
# Pallas TPU kernels for the hot compute paths.
#
# `csd_accumulate`: the cross-spectral density accumulation — for every
# frequency, the (nTrials*nTaper, nChannel) spectral slab collapses into a
# (nChannel, nChannel) Hermitian outer-product sum. This is the inner loop
# of coherence/Granger (reference syncopy/connectivity/csd.py:98-104 runs
# it as a numpy broadcast product). On the MXU the complex contraction is
# four real (C x N) @ (N x C) matmuls per frequency, with the frequency
# axis as the pallas grid so each step's operand tile lives in VMEM.

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["csd_accumulate", "csd_accumulate_tiled", "pallas_supported"]


def _csd_kernel(ar_ref, ai_ref, or_ref, oi_ref):
    ar = ar_ref[0]  # (N, C) real parts for this frequency
    ai = ai_ref[0]  # (N, C) imag parts
    # cs_ij = sum_n a_ni * conj(a_nj):
    #   Re = Ar^T Ar + Ai^T Ai ; Im = Ai^T Ar - Ar^T Ai
    # full float32 multiply precision: the CSD feeds Wilson's factorization
    # downstream, which needs a numerically Hermitian-PSD input
    prec = jax.lax.Precision.HIGHEST
    rr = jnp.dot(ar.T, ar, preferred_element_type=jnp.float32, precision=prec)
    ii = jnp.dot(ai.T, ai, preferred_element_type=jnp.float32, precision=prec)
    ri = jnp.dot(ai.T, ar, preferred_element_type=jnp.float32, precision=prec)
    ir = jnp.dot(ar.T, ai, preferred_element_type=jnp.float32, precision=prec)
    or_ref[0] = rr + ii
    oi_ref[0] = ri - ir


@functools.partial(jax.jit, static_argnames=("interpret",))
def csd_accumulate(spec_re, spec_im, interpret=False):
    """
    Accumulated cross-spectra from (F, N, C) real/imag spectral slabs:
    ``cs[f, i, j] = sum_n spec[f, n, i] * conj(spec[f, n, j])``.

    Returns (cs_re, cs_im), each (F, C, C) float32.
    """
    F, N, C = spec_re.shape
    grid = (F,)
    in_spec = pl.BlockSpec((1, N, C), lambda f: (f, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, C, C), lambda f: (f, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _csd_kernel,
        grid=grid,
        in_specs=[in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((F, C, C), jnp.float32),
            jax.ShapeDtypeStruct((F, C, C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * F * N * C * C,
            bytes_accessed=4 * (2 * F * N * C + 2 * F * C * C),
            transcendentals=0,
        ),
        interpret=interpret,
    )(spec_re, spec_im)


_PALLAS_OK = None


def pallas_supported():
    """Probe (once) whether pallas kernels compile on the default backend."""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        try:
            if jax.default_backend() == "cpu":
                _PALLAS_OK = False
            else:
                r = np.zeros((1, 8, 128), dtype=np.float32)
                csd_accumulate(jnp.asarray(r), jnp.asarray(r))[0].block_until_ready()
                _PALLAS_OK = True
        except Exception:
            _PALLAS_OK = False
    return _PALLAS_OK
