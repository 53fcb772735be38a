"""Unit tests for ops/kernel_utils: the shared tile policy and the
separable-roll neighbor helpers every fused kernel now builds on.

Runs the pallas helpers in interpreter mode so the pltpu.roll semantics
are exercised without a TPU.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from multiphase_lbm_tpu.core.lattice import D2Q9, D3Q19
from multiphase_lbm_tpu.ops import kernel_utils as ku


def test_pick_tile_policy():
    assert ku.pick_tile(2048) == 64
    assert ku.pick_tile(2048, target=32) == 32
    assert ku.pick_tile(40, minimum=16) == 40   # only 8-multiple divisor ≥ 16
    assert ku.pick_tile(24, minimum=12) == 24   # first loop, 8-aligned
    assert ku.pick_tile(1026 - 2) == 64            # 1024
    with pytest.raises(ValueError):
        ku.pick_tile(12)                           # no 8-multiple divisor
    with pytest.raises(ValueError):
        # the fallback never returns a misaligned tile: 12 divides 36 but
        # is not a multiple of 8, so this must fail rather than return 12
        ku.pick_tile(36, minimum=12)


def _run_interpret(fn, *arrays):
    """Run fn(*refs) under pallas interpret mode and return its output."""
    shape = jax.ShapeDtypeStruct(arrays[0].shape, arrays[0].dtype)

    def kernel(*refs):
        out = refs[-1]
        out[...] = fn(*(r[...] for r in refs[:-1]))

    return pl.pallas_call(kernel, out_shape=shape,
                          interpret=True)(*arrays)


def test_fwd_shifts_matches_jnp_roll():
    dirs = {k: (int(D2Q9.c[k][0]), int(D2Q9.c[k][1]))
            for k in range(9) if int(D2Q9.c[k][0]) or int(D2Q9.c[k][1])}
    a = jnp.asarray(np.random.default_rng(0).normal(size=(16, 24)),
                    jnp.float32)
    for k, (cx, cy) in dirs.items():
        got = _run_interpret(
            lambda q, k=k: ku.fwd_shifts(q, dirs)[k], a)
        want = jnp.roll(a, (-cy, -cx), axis=(0, 1))     # value at (y+cy, x+cx)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # the backward read is the opposite direction's forward read
        ko = int(D2Q9.opp[k])
        got_bwd = _run_interpret(
            lambda q, ko=ko: ku.fwd_shifts(q, dirs)[ko], a)
        np.testing.assert_array_equal(
            np.asarray(got_bwd),
            np.asarray(jnp.roll(a, (cy, cx), axis=(0, 1))))


def test_fwd_shifts_stacked_leading_axis():
    dirs = {1: (1, 0), 2: (1, 1)}
    a = jnp.asarray(np.random.default_rng(1).normal(size=(3, 8, 16)),
                    jnp.float32)
    got = _run_interpret(lambda q: ku.fwd_shifts(q, dirs)[2], a)
    want = jnp.roll(a, (-1, -1), axis=(1, 2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fwd_shifts3_matches_jnp_roll():
    dirs = {k: tuple(int(v) for v in D3Q19.c[k])
            for k in range(19) if any(int(v) for v in D3Q19.c[k])}
    a = jnp.asarray(np.random.default_rng(2).normal(size=(8, 8, 16)),
                    jnp.float32)
    for k, (cx, cy, cz) in dirs.items():
        got = _run_interpret(lambda q, k=k: ku.fwd_shifts3(q, dirs)[k], a)
        want = jnp.roll(a, (-cz, -cy, -cx), axis=(0, 1, 2))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=str((k, cx, cy, cz)))
