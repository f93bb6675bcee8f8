"""Literal column-stream kernel parity vs the jnp literal pipeline.

ops/literal.literal_pipeline_* is differential-pinned to the NumPy
oracle (tests/test_literal.py), so bit-equality against it over
randomized corpora transfers the whole correctness chain to the
transposed literal kernel (ops/colstream._literal_block). Covers all
four modes, ASCII + unicode units, case-flip needles, bonus contexts,
empty rows, and the exact/covers bonus. On CPU the kernel runs in
interpreter mode; the same code compiles via Mosaic on TPU.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from frizbee_tpu.ops import colstream  # noqa: E402
from frizbee_tpu.ops.kernels import (  # noqa: E402
    DEFAULT_SCORING,
    pack_needle_scalars,
)
from frizbee_tpu.ops.literal import (  # noqa: E402
    EXACT,
    PREFIX,
    SUBSTRING,
    SUFFIX,
    literal_pipeline_ascii,
    literal_pipeline_units,
)

GR = colstream.SUBL * 128
MODES = [EXACT, PREFIX, SUFFIX, SUBSTRING]


def pack_T(cp, nu, W):
    B = cp.shape[0]
    pad = (-B) % GR
    cpp = np.pad(cp.astype(np.int32), ((0, pad), (0, 0)))
    if cp.dtype == np.int8:
        cpp = cpp & 0xFF
    nup = np.pad(nu, (0, pad))
    nG = cpp.shape[0] // GR
    cpT = np.ascontiguousarray(
        cpp.reshape(nG, colstream.SUBL, 128, W).transpose(0, 3, 1, 2)
    ).reshape(nG * W, colstream.SUBL, 128)
    return (
        jnp.asarray(cpT),
        jnp.asarray(nup.reshape(nG * colstream.SUBL, 128)),
        B,
    )


def _byte_len(needle, unicode):
    if not unicode:
        return len(needle)
    return sum(
        1 + (c >= 0x80) + (c >= 0x800) + (c >= 0x10000) for c in needle
    )


def _assert_parity(cp, nu, needle, flip, *, mode, unicode,
                   scoring=DEFAULT_SCORING):
    B, W = cp.shape
    nbl = _byte_len(needle, unicode)
    pipeline = literal_pipeline_units if unicode else literal_pipeline_ascii
    cp_in = cp.astype(np.int32) if unicode else cp.astype(np.int8)
    want = pipeline(
        jnp.asarray(cp_in), jnp.asarray(nu[:, None].astype(np.int32)),
        jnp.asarray(needle.astype(np.int32)),
        jnp.asarray(flip.astype(np.int32)),
        jnp.zeros((9,), jnp.int32),
        mode=mode, needle_byte_len=nbl, scoring=scoring,
    )
    npk = jnp.asarray(np.concatenate([needle, flip]).astype(np.int32))
    cpT, nuT, Breal = pack_T(cp, nu, W)
    got = colstream.match_units_colstream(
        cpT, nuT, pack_needle_scalars(npk, B),
        W=W, n=len(needle), scoring=scoring, unicode=unicode,
        interpret=True, mode=mode, needle_byte_len=nbl,
    )
    m = np.asarray(want[0]).astype(bool)
    np.testing.assert_array_equal(
        np.asarray(got[0]).astype(bool)[:Breal], m, err_msg=f"{mode} matched"
    )
    for i, name in ((1, "score"), (2, "exact"), (3, "end_col")):
        w = np.where(m, np.asarray(want[i]), 0)
        g = np.where(m, np.asarray(got[i])[:Breal], 0)
        np.testing.assert_array_equal(g, w, err_msg=f"{mode} {name}")


def _random_ascii(rng, B, W, alphabet=5):
    cp = rng.integers(97, 97 + alphabet, (B, W)).astype(np.int32)
    nu = rng.integers(0, W + 1, B).astype(np.int32)
    up = rng.random((B, W)) < 0.2
    cp = np.where(up, cp - 32, cp)
    dl = rng.random((B, W)) < 0.12
    cp = np.where(dl, np.int32(47), cp)  # '/'
    cp = np.where(np.arange(W)[None, :] < nu[:, None], cp, 0)
    return cp.astype(np.int8), nu


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("W", [16, 64, 128])
def test_ascii_parity(mode, W):
    rng = np.random.default_rng(10 * W + len(mode))
    cp, nu = _random_ascii(rng, GR, W)
    for n in (1, 2, 4, 8):
        needle = rng.integers(97, 102, n).astype(np.int32)
        flip = np.where(rng.random(n) < 0.5, needle - 32, needle)
        _assert_parity(cp, nu, needle, flip, mode=mode, unicode=False)


@pytest.mark.parametrize("mode", MODES)
def test_unicode_parity(mode):
    rng = np.random.default_rng(3 + len(mode))
    pool = np.array(
        [0x61, 0x62, 0x414, 0x5D0, 0xAC00, 0x1F600, 0x41, 0x2F],
        np.int32,
    )
    W = 32
    cp = pool[rng.integers(0, len(pool), (GR, W))]
    nu = rng.integers(0, W + 1, GR).astype(np.int32)
    cp = np.where(np.arange(W)[None, :] < nu[:, None], cp, 0)
    for n in (1, 2, 3):
        needle = pool[rng.integers(0, len(pool), n)]
        _assert_parity(cp, nu, needle, needle.copy(), mode=mode,
                       unicode=True)


@pytest.mark.parametrize("mode", MODES)
def test_structured_rows(mode):
    """Exact/prefix/suffix/embedded/case-flipped/empty rows in one tile,
    plus delimiter and capitalization bonus contexts."""
    needle = np.frombuffer(b"Dead", np.uint8).astype(np.int32)
    flip = np.where(
        (needle >= 65) & (needle <= 90), needle + 32,
        np.where((needle >= 97) & (needle <= 122), needle - 32, needle),
    )
    W = 16
    rows = [
        b"Dead",            # exact (whole-haystack run)
        b"dead",            # case-flipped whole run
        b"DeadBeef",        # prefix
        b"beefDead",        # suffix
        b"xxDeadxx",        # embedded
        b"x/Deadxx",        # delimiter bonus before the run
        b"xdEADxxx",        # mixed-case embedded
        b"",                # empty
        b"Dea",             # too short
        b"DeaDead",         # later occurrence scores differently
        b"DeadDead",        # two occurrences (prefix beats embedded)
    ]
    B = GR
    cp = np.zeros((B, W), np.int8)
    nu = np.zeros(B, np.int32)
    for i, r in enumerate(rows):
        cp[i, : len(r)] = np.frombuffer(r, np.uint8).astype(np.int8)
        nu[i] = len(r)
    _assert_parity(cp, nu, needle, flip, mode=mode, unicode=False)


@pytest.mark.parametrize("mode", MODES)
def test_single_unit_needle(mode):
    rng = np.random.default_rng(77)
    cp, nu = _random_ascii(rng, GR, 32, alphabet=4)
    needle = np.array([97], np.int32)
    _assert_parity(cp, nu, needle, needle - 32, mode=mode, unicode=False)


def test_flagged_groups_write_sentinels():
    """Dead-group skipping must zero literal outputs exactly like the
    fuzzy kernel's."""
    rng = np.random.default_rng(5)
    W = 16
    cp, nu = _random_ascii(rng, 2 * GR, W)
    needle = np.array([97, 98], np.int32)
    npk = jnp.asarray(np.concatenate([needle, needle]).astype(np.int32))
    cpT, nuT, B = pack_T(cp, nu, W)
    flags = jnp.asarray(np.array([1, 0], np.int32))
    got = colstream.match_units_colstream(
        cpT, nuT, pack_needle_scalars(npk, B), flags,
        W=W, n=2, scoring=DEFAULT_SCORING, unicode=False,
        interpret=True, mode=SUBSTRING, needle_byte_len=2,
    )
    m = np.asarray(got[0])
    assert m[GR:].sum() == 0  # dead group: all unmatched
    assert m[:GR].sum() > 0
