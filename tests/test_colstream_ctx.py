"""Pack-time UTF-8 bonus-context plane parity.

The colstream kernels derive per-column bonus facts (lead/last byte
case + delimiter tests, UTF-8 byte length) in-kernel unless a pack-time
ctx plane is supplied (corpus.device_arrays_colstream). These tests pin
bit-equality between the two paths for the fuzzy AND literal blocks,
and pin the corpus-built plane against a NumPy recomputation.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from frizbee_tpu.ops import colstream  # noqa: E402
from frizbee_tpu.ops.kernels import (  # noqa: E402
    DEFAULT_SCORING,
    pack_needle_scalars,
)
from frizbee_tpu.ops.literal import SUBSTRING, SUFFIX  # noqa: E402

GR = colstream.SUBL * 128


def pack_T(arr, W, dtype=np.int32):
    B = arr.shape[0]
    pad = (-B) % GR
    a = np.pad(arr.astype(np.int32), ((0, pad), (0, 0)))
    nG = a.shape[0] // GR
    return jnp.asarray(
        np.ascontiguousarray(
            a.reshape(nG, colstream.SUBL, 128, W).transpose(0, 3, 1, 2)
        ).reshape(nG * W, colstream.SUBL, 128).astype(dtype)
    )


def build_ctx(cp):
    """Host twin of the corpus ctx-plane construction."""
    first = np.where(cp < 0x80, cp, 0)
    first = np.where((cp >= 0x80) & (cp < 0x800), 0xC0 | (cp >> 6), first)
    first = np.where(
        (cp >= 0x800) & (cp < 0x10000), 0xE0 | (cp >> 12), first
    )
    first = np.where(cp >= 0x10000, 0xF0 | (cp >> 18), first)
    last = np.where(cp < 0x80, cp, 0x80 | (cp & 0x3F))

    def dl(b):
        letter = ((b >= 0x41) & (b <= 0x5A)) | ((b >= 0x61) & (b <= 0x7A))
        digit = (b >= 0x30) & (b <= 0x39)
        return (b >= 0) & (b <= 127) & ~letter & ~digit

    blen = np.ones_like(cp)
    blen = np.where(cp >= 0x80, 2, blen)
    blen = np.where(cp >= 0x800, 3, blen)
    blen = np.where(cp >= 0x10000, 4, blen)
    ctx = ((first >= 0x41) & (first <= 0x5A)).astype(np.int32)
    ctx |= dl(first).astype(np.int32) << 1
    ctx |= ((last >= 0x61) & (last <= 0x7A)).astype(np.int32) << 2
    ctx |= dl(last).astype(np.int32) << 3
    ctx |= blen << 4
    return ctx


def _run(cp, nu, needle, flip, *, mode="fuzzy", with_ctx, T=0, nbl=0):
    B, W = cp.shape
    npk = jnp.asarray(np.concatenate([needle, flip]).astype(np.int32))
    cpT = pack_T(cp, W)
    nuT = jnp.asarray(
        np.pad(nu, (0, (-B) % GR)).reshape(-1, 128).astype(np.int32)
    )
    ctxT = pack_T(build_ctx(cp), W, np.int8) if with_ctx else None
    return colstream.match_units_colstream(
        cpT, nuT, pack_needle_scalars(npk, B), None, None, ctxT,
        W=W, n=len(needle), max_typos=T, scoring=DEFAULT_SCORING,
        unicode=True, interpret=True, mode=mode, needle_byte_len=nbl,
    )


@pytest.mark.parametrize("T", [0, 1])
def test_fuzzy_ctx_plane_parity(T):
    rng = np.random.default_rng(11)
    pool = np.array(
        [0x61, 0x62, 0x5A, 0x2F, 0x31, 0x414, 0x5D0, 0xAC00, 0x1F600],
        np.int32,
    )
    W = 24
    cp = pool[rng.integers(0, len(pool), (GR, W))]
    nu = rng.integers(0, W + 1, GR).astype(np.int32)
    cp = np.where(np.arange(W)[None, :] < nu[:, None], cp, 0)
    for n in (1, 2, 4):
        needle = pool[rng.integers(0, len(pool), n)]
        a = _run(cp, nu, needle, needle.copy(), with_ctx=False, T=T)
        b = _run(cp, nu, needle, needle.copy(), with_ctx=True, T=T)
        for x, y, name in zip(a, b, "msecg"):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"n={n} {name}"
            )


@pytest.mark.parametrize("mode", [SUBSTRING, SUFFIX])
def test_literal_ctx_plane_parity(mode):
    rng = np.random.default_rng(13)
    pool = np.array([0x61, 0x41, 0x2F, 0x414, 0xAC00], np.int32)
    W = 16
    cp = pool[rng.integers(0, len(pool), (GR, W))]
    nu = rng.integers(0, W + 1, GR).astype(np.int32)
    cp = np.where(np.arange(W)[None, :] < nu[:, None], cp, 0)
    needle = pool[np.array([0, 3])]
    nbl = int(sum(1 + (c >= 0x80) + (c >= 0x800) + (c >= 0x10000)
                  for c in needle))
    a = _run(cp, nu, needle, needle.copy(), mode=mode, with_ctx=False,
             nbl=nbl)
    b = _run(cp, nu, needle, needle.copy(), mode=mode, with_ctx=True,
             nbl=nbl)
    for x, y, name in zip(a, b, "msecg"):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=name
        )


def test_corpus_plane_matches_host_twin():
    from frizbee_tpu.corpus import pack_corpus

    rows = ["abc", "إن الكتاب", "Straße/31", "한국어 텍스트", "x" * 40]
    corpus = pack_corpus(rows * 300, unicode=True)
    for b in corpus.buckets:
        cpT, nuT, idxT, _bb, ctxT = b.device_arrays_colstream()
        assert ctxT is not None
        assert ctxT.shape == cpT.shape and ctxT.dtype == jnp.int8
        # recompute the plane from the device cp blocks themselves
        cp = np.asarray(cpT).astype(np.int64)
        want = build_ctx(cp)
        np.testing.assert_array_equal(np.asarray(ctxT), want.astype(np.int8))


def test_ascii_corpus_has_no_plane():
    from frizbee_tpu.corpus import pack_corpus

    corpus = pack_corpus(["abc", "def"] * 600, unicode=False)
    assert corpus.buckets[0].device_arrays_colstream()[4] is None
