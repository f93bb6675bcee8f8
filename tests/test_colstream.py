"""Column-stream (transposed) kernel parity vs the row-major kernel.

The row-major fused kernel (ops/kernels.py) is itself differential-pinned
to the jnp pipeline and the host oracle, so bit-equality against it over
randomized corpora transfers the whole correctness chain to the transposed
kernel (ops/colstream.py). Covers typo budgets 0-3, prefilter on/off,
unicode codepoint units (multi-byte window trims), narrow widths, empty
rows, bonus-context cases (capitalization/delimiter/prefix), and the
exact-match bit. On CPU both kernels run in interpreter mode; the same
code compiles via Mosaic on TPU (benchmarks/probe_colstream_tpu.py pins
compiled parity there).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from frizbee_tpu.ops import colstream  # noqa: E402
from frizbee_tpu.ops.kernels import (  # noqa: E402
    DEFAULT_SCORING,
    fuzzy_match_units,
    pack_needle_scalars,
)

GR = colstream.SUBL * 128


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


def _assert_parity(cp, nu, needle, flip, *, T, unicode, no_prefilter,
                   scoring=DEFAULT_SCORING):
    B, W = cp.shape
    npk = jnp.asarray(np.concatenate([needle, flip]).astype(np.int32))
    want = fuzzy_match_units(
        jnp.asarray(cp), jnp.asarray(nu[:, None]), npk,
        max_typos=T, no_prefilter=no_prefilter, scoring=scoring,
        unicode=unicode, interpret=True,
    )
    cpT, nuT, Breal = pack_T(cp, nu, W)
    got = colstream.match_units_colstream(
        cpT, nuT, pack_needle_scalars(npk, B),
        W=W, n=len(needle), max_typos=T, scoring=scoring,
        unicode=unicode, no_prefilter=no_prefilter, interpret=True,
    )
    m = np.asarray(want[0]).astype(bool)
    np.testing.assert_array_equal(
        np.asarray(got[0]).astype(bool)[:Breal], m
    )
    for i in (1, 2, 3, 4):
        w = np.where(m, np.asarray(want[i]), 0)
        g = np.where(m, np.asarray(got[i])[:Breal], 0)
        np.testing.assert_array_equal(g, w, err_msg=f"column {i}")


def _random_ascii(rng, B, W, alphabet=6, uppers=True, delims=True):
    cp = rng.integers(97, 97 + alphabet, (B, W)).astype(np.int32)
    nu = rng.integers(0, W + 1, B).astype(np.int32)
    col = np.arange(W)[None, :]
    if uppers:
        up = rng.random((B, W)) < 0.15
        cp = np.where(up, cp - 32, cp)
    if delims:
        dl = rng.random((B, W)) < 0.1
        cp = np.where(dl, np.int32(47), cp)  # '/'
    cp = np.where(col < nu[:, None], cp, 0)
    return cp.astype(np.int8), nu


@pytest.mark.parametrize("T,no_pre", [(0, False), (1, False), (2, False),
                                      (3, False), (0, True)])
@pytest.mark.parametrize("W", [16, 64, 128])
def test_ascii_parity(T, no_pre, W):
    rng = np.random.default_rng(100 * W + T + (1000 if no_pre else 0))
    cp, nu = _random_ascii(rng, GR, W)
    for n in (1, 3, 8):
        needle = rng.integers(97, 103, n).astype(np.int32)
        _assert_parity(cp, nu, needle, needle - 32, T=T, unicode=False,
                       no_prefilter=no_pre)


@pytest.mark.parametrize("T", [0, 1, 2])
def test_unicode_parity(T):
    rng = np.random.default_rng(7 + T)
    pool = np.array(
        [0x61, 0x62, 0x414, 0x5D0, 0xAC00, 0x1F600, 0x7A, 0x41, 0x2F],
        np.int32,
    )
    W = 32
    cp = pool[rng.integers(0, len(pool), (GR, W))]
    nu = rng.integers(0, W + 1, GR).astype(np.int32)
    cp = np.where(np.arange(W)[None, :] < nu[:, None], cp, 0)
    for n in (1, 2, 4):
        needle = pool[rng.integers(0, len(pool), n)]
        _assert_parity(cp, nu, needle, needle.copy(), T=T, unicode=True,
                       no_prefilter=False)


def test_exact_and_prefix_rows():
    """Rows equal to the needle (exact bit + bonus), prefixed rows, and
    empty rows in one tile."""
    needle = np.frombuffer(b"DeadBeef", np.uint8).astype(np.int32)
    flip = np.where(
        (needle >= 65) & (needle <= 90), needle + 32,
        np.where((needle >= 97) & (needle <= 122), needle - 32, needle),
    )
    W = 16
    rows = [
        b"DeadBeef",          # exact
        b"deadbeef",          # case-flipped full match
        b"xDeadBeefx",        # embedded
        b"",                  # empty
        b"Dead/Beef",         # delimiter bonus inside
        b"DEADBEEF",
    ]
    B = GR
    cp = np.zeros((B, W), np.int8)
    nu = np.zeros(B, np.int32)
    for i, r in enumerate(rows):
        cp[i, : len(r)] = np.frombuffer(r, np.uint8).astype(np.int8)
        nu[i] = len(r)
    _assert_parity(cp, nu, needle, flip, T=0, unicode=False,
                   no_prefilter=False)
    _assert_parity(cp, nu, needle, flip, T=1, unicode=False,
                   no_prefilter=False)


def test_auto_match_needle_within_budget():
    """n <= max_typos auto-passes every row (full-row window)."""
    rng = np.random.default_rng(3)
    cp, nu = _random_ascii(rng, GR, 16, alphabet=3)
    needle = rng.integers(97, 100, 2).astype(np.int32)
    _assert_parity(cp, nu, needle, needle - 32, T=3, unicode=False,
                   no_prefilter=False)


def test_greedy_flag_unicode():
    """Multi-byte rows whose trimmed window exceeds the 1024-byte DP cap
    must raise the greedy flag identically."""
    W = 512
    B = GR
    cp = np.zeros((B, W), np.int32)
    nu = np.zeros(B, np.int32)
    # row 0: 'l' + 400 x U+1F600 (4 bytes) + 'inux' -> window > 1024 B
    row = [ord("l")] + [0x1F600] * 400 + [ord(c) for c in "inux"]
    cp[0, : len(row)] = row
    nu[0] = len(row)
    cp[1, :5] = [ord(c) for c in "linux"]
    nu[1] = 5
    needle = np.array([ord(c) for c in "linux"], np.int32)
    _assert_parity(cp, nu, needle, needle.copy(), T=0, unicode=True,
                   no_prefilter=False)


def test_block_gather_parity():
    """The Pallas row-copy gather must equal a NumPy fancy-index gather
    (it replaces XLA's take_along_axis in the capped result sort)."""
    from frizbee_tpu.ops.colstream import block_gather

    rng = np.random.default_rng(9)
    data = jnp.asarray(
        rng.integers(-(2**31), 2**31 - 1, (64, 2048), dtype=np.int64)
        .astype(np.int32)
    )
    rows = jnp.asarray(rng.integers(0, 64, 40).astype(np.int32))
    out = block_gather(data, rows, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(data)[np.asarray(rows)]
    )
