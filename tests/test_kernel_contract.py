"""Contract tests for the kernel lane primitives.

The reference tests each SIMD backend primitive directly against scalar
models (reference: src/smith_waterman/backend/tests/contract.rs:9-295);
these are the analogous unit contracts for the Pallas lane helpers that
every kernel builds on. The helpers run outside pallas_call here (they are
plain jnp functions of arrays), checked against NumPy models on randomized
and boundary inputs for both lane dtypes.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from frizbee_tpu.ops.kernels import (  # noqa: E402
    _cummax_lanes,
    _cumsum_lanes,
    _gather_lane,
    _rmax,
    _rmin,
    _shift_right,
    _unit_context,
    score_fits_int16,
)
from frizbee_tpu.ops.presence import _fold_bit  # noqa: E402

W = 128
RNG = np.random.default_rng(11)


def _col(tb, dtype):
    return jax.lax.broadcasted_iota(jnp.int32, (tb, W), 1).astype(dtype)


def run_in_kernel(fn, out_struct, *arrays):
    """Run ``fn`` over whole-array refs inside an interpret-mode
    pallas_call: lane primitives like pltpu.roll only exist in kernel
    context. ``out_struct`` may be a tuple for multi-output fns."""
    from jax.experimental import pallas as pl

    n_out = len(out_struct) if isinstance(out_struct, tuple) else 1

    def kernel(*refs):
        outs = fn(*[r[:] for r in refs[:-n_out]])
        if n_out == 1:
            outs = (outs,)
        for ref, o in zip(refs[-n_out:], outs):
            ref[:] = o

    return pl.pallas_call(
        kernel, out_shape=out_struct, interpret=True
    )(*arrays)


@pytest.mark.parametrize("dtype", [jnp.int32, jnp.int16])
def test_shift_right_contract(dtype):
    x = jnp.asarray(RNG.integers(-100, 100, (8, W)), dtype)
    col = _col(8, dtype)
    for d in (1, 2, 7, 64, 127):
        got = np.asarray(run_in_kernel(
            lambda a, c, d=d: _shift_right(a, d, -5, c),
            jax.ShapeDtypeStruct((8, W), dtype), x, col,
        ))
        exp = np.full((8, W), -5, np.int64)
        exp[:, d:] = np.asarray(x)[:, : W - d]
        np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("dtype", [jnp.int32, jnp.int16])
def test_cumsum_lanes_contract(dtype):
    x = jnp.asarray(RNG.integers(0, 5, (8, W)), dtype)
    col = _col(8, dtype)
    got = np.asarray(run_in_kernel(
        lambda a, c: _cumsum_lanes(a, c, W),
        jax.ShapeDtypeStruct((8, W), dtype), x, col,
    ))
    np.testing.assert_array_equal(got, np.cumsum(np.asarray(x), axis=1))


@pytest.mark.parametrize("dtype", [jnp.int32, jnp.int16])
def test_cummax_lanes_contract(dtype):
    x = jnp.asarray(RNG.integers(-50, 1000, (8, W)), dtype)
    col = _col(8, dtype)
    neg = -(20000 if dtype == jnp.int16 else (1 << 30))
    got = np.asarray(run_in_kernel(
        lambda a, c: _cummax_lanes(a, c, W, neg),
        jax.ShapeDtypeStruct((8, W), dtype), x, col,
    ))
    np.testing.assert_array_equal(
        got, np.maximum.accumulate(np.asarray(x), axis=1)
    )


@pytest.mark.parametrize("dtype", [jnp.int32, jnp.int16])
def test_gather_lane_contract(dtype):
    x = jnp.asarray(RNG.integers(0, 900, (8, W)), dtype)
    col = _col(8, dtype)
    idx = jnp.asarray(RNG.integers(0, W, (8, 1)), dtype)
    got = np.asarray(run_in_kernel(
        lambda a, i, c: _gather_lane(a, i, c),
        jax.ShapeDtypeStruct((8, 1), dtype), x, idx, col,
    ))
    exp = np.take_along_axis(np.asarray(x), np.asarray(idx, np.int64),
                             axis=1)
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("dtype", [jnp.int32, jnp.int16])
def test_lane_reductions_contract(dtype):
    x = jnp.asarray(RNG.integers(-100, 30000, (8, W)), dtype)
    np.testing.assert_array_equal(
        np.asarray(_rmin(x))[:, 0], np.asarray(x).min(axis=1)
    )
    np.testing.assert_array_equal(
        np.asarray(_rmax(x))[:, 0], np.asarray(x).max(axis=1)
    )


@pytest.mark.parametrize("acc", [jnp.int32, jnp.int16])
def test_unit_context_unicode_contract(acc):
    """Byte context derived in-kernel from codepoints must equal the
    packer's byte context (oracle: corpus._utf8_* / tokenize)."""
    from frizbee_tpu.corpus import pack_corpus

    hay = [
        "a¢€𐍈z",          # 1/2/3/4-byte code points
        "é" * 40 + "x",
        "가나다 ascii mix 123",
        "",
        "\x7f߿ࠀ￿\U00010000",
    ]
    corpus = pack_corpus(hay, unicode=True, bucket_widths=(128,))
    b = corpus.buckets[0]
    cp = jnp.asarray(b.cp.astype(np.int32))
    B = cp.shape[0]
    col = _col(B, acc)
    valid = col < jnp.asarray(b.n_units[:, None], np.int32).astype(acc)
    fb, pb, boff, blen, nb = run_in_kernel(
        lambda c, v, co: _unit_context(c, v, co, 128, True, acc),
        tuple(
            jax.ShapeDtypeStruct(s, acc)
            for s in ((B, W), (B, W), (B, W), (B, W), (B, 1))
        ),
        cp, valid, col,
    )
    real = b.indices >= 0
    np.testing.assert_array_equal(np.asarray(fb)[real], b.first_byte[real])
    np.testing.assert_array_equal(
        np.asarray(pb)[real], b.prev_last_byte[real]
    )
    np.testing.assert_array_equal(np.asarray(boff)[real], b.byte_off[real])
    np.testing.assert_array_equal(np.asarray(blen)[real], b.byte_len[real])
    np.testing.assert_array_equal(
        np.asarray(nb)[real, 0], b.n_bytes[real]
    )


def test_score_fits_int16_bounds():
    assert score_fits_int16((12, 6, 5, 1, 12, 4, 4, 8, 4), 8, 128)
    # default scoring fits even at max needle/width (bound 1300 + 5120)
    assert score_fits_int16((12, 6, 5, 1, 12, 4, 4, 8, 4), 64, 1024)
    # big per-char scores at max needle length blow the bound
    assert not score_fits_int16((500, 6, 5, 1, 12, 99, 99, 8, 99), 64, 128)
    # huge gap costs blow the scan intermediate
    assert not score_fits_int16((12, 6, 500, 300, 12, 4, 4, 8, 4), 4, 128)


def test_fold_bit_contract():
    v = jnp.arange(0x300, dtype=jnp.int32)
    got = np.asarray(_fold_bit(v))
    exp = []
    for x in range(0x300):
        e = x + 0x20 if 0x41 <= x <= 0x5A else x
        exp.append(e & 127)
    np.testing.assert_array_equal(got, np.array(exp))
    # case pairs share a bit
    for c in range(26):
        assert got[0x41 + c] == got[0x61 + c]
