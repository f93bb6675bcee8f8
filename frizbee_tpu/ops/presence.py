"""Stage-1 presence prefilter: per-row 128-bit char-presence masks.

The reference's cheapest reject is a SIMD char-presence scan over the
haystack window (reference: src/prefilter/algo/ascii.rs:6-54, the memchr
-style pass that makes its No Match datasets ~140 us/100k). On TPU the
corpus is resident and reused across queries, so the scan moves to pack
time: each row gets a 128-bit mask (4 x int32) with bit ``fold(unit)``
set for every unit in the row, where ``fold`` lowercases ASCII letters
and hashes everything else to 7 bits. At query time a row is rejected
when more needle units are absent than the typo budget.

Soundness: presence of a needle unit's fold-bit anywhere in the row is a
*necessary* condition for the positional prefilter to match that unit
(ASCII case pairs share a fold-bit by construction; unicode case pairs
whose fold-bits differ are tested as an OR of both bits, or skipped in
the bit-matrix form). A needle unit whose value is absent must be
consumed by a typo, so ``missing > max_typos`` rows can never
prefilter-match. Hash collisions only ever add false *positives*, which
the positional prefilter kernel then rejects.

Two query-time forms:

- ``stage1_presence``: per-char word-select over (B, 4) masks — the
  single-query path.
- ``presence_bits`` + an int8 MXU matmul (built inline by the batched
  serving path, ops/batch.py): hits[row, q] = bits[row] @ need[:, q]
  counts how many of query q's distinct fold-bits the row contains —
  one 128-wide matmul scores stage-1 for the whole query batch at MXU
  rate instead of Q elementwise passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MASK_WORDS = 4
# Multiplicity planes: plane k holds "fold-bit appears >= k+1 times".
# Capped occurrence counting makes stage-1 reject rows that hold a mere
# subset of a repeated-char needle (e.g. partial rows under "deadbeef"
# missing one of its three 'e's) — a large survivor-rate cut at zero
# query-time cost, since the planes just widen the one MXU matmul.
PLANES = 3


def _fold_bit(v: jnp.ndarray) -> jnp.ndarray:
    """7-bit presence-bit index of a unit value: ASCII uppercase folds to
    lowercase (so byte case pairs share a bit), everything else hashes to
    ``v & 127``."""
    upper = (v >= 0x41) & (v <= 0x5A)
    return jnp.where(upper, v + 0x20, v) & 127


@jax.jit
def presence_mask(cp: jnp.ndarray, n_units: jnp.ndarray) -> jnp.ndarray:
    """(B, PLANES*4) int32 capped-count presence masks for a packed
    bucket: words [4k, 4k+4) hold plane k (bit c set when the row contains
    fold-bit c more than k times... i.e. count >= k+1).

    ``cp`` is (B, W) int8 bytes or int32 codepoints; ``n_units`` (B, 1).
    Computed on device once per corpus upload."""
    B, W = cp.shape
    u = cp.astype(jnp.int32)
    if cp.dtype == jnp.int8:
        u = u & 0xFF
    v = _fold_bit(u)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    valid = col < n_units
    words = [
        jnp.zeros((B,), jnp.int32) for _ in range(PLANES * MASK_WORDS)
    ]
    for wi in range(MASK_WORDS):
        for bit in range(32):
            c = wi * 32 + bit
            cnt = jnp.sum((valid & (v == c)).astype(jnp.int32), axis=1)
            for plane in range(PLANES):
                words[plane * MASK_WORDS + wi] = (
                    words[plane * MASK_WORDS + wi]
                    | jnp.left_shift((cnt > plane).astype(jnp.int32), bit)
                )
    return jnp.stack(words, axis=1)


@jax.jit
def presence_bits(mask: jnp.ndarray) -> jnp.ndarray:
    """Expand (B, PLANES*4) int32 masks to a (B, PLANES*128) int8 0/1 bit
    matrix — the MXU operand for batched stage-1 (one-time per corpus
    upload)."""
    B = mask.shape[0]
    cols = PLANES * 128
    j = jax.lax.broadcasted_iota(jnp.int32, (B, cols), 1)
    word = jnp.zeros((B, cols), jnp.int32)
    for wi in range(PLANES * MASK_WORDS):
        word = jnp.where((j >> 5) == wi, mask[:, wi:wi + 1], word)
    return (
        (jax.lax.shift_right_logical(word, j & 31) & 1).astype(jnp.int8)
    )


def needle_need_matrix(needles_q: jnp.ndarray) -> tuple:
    """(need (PLANES*128, Q) int8, tot (Q,) int32) for the stage-1 matmul.

    ``needles_q`` is (Q, 2n) int32, orig then flip per query. A fold-bit
    is *needed* when the unit's orig and flip fold to the same bit (ASCII
    always does; unicode case pairs that fold apart are skipped — sound,
    merely weaker). Plane k requires the bit to occur more than k times in
    the needle (capped at PLANES), so the matmul hit count equals
    ``sum_c min(row_count_c, need_count_c, PLANES)`` and ``tot[q] =
    sum_c min(need_count_c, PLANES)``: rows missing occurrences of
    repeated needle chars fall short of ``tot - max_typos``."""
    Q, n2 = needles_q.shape
    n = n2 // 2
    ob = _fold_bit(needles_q[:, :n])
    fb = _fold_bit(needles_q[:, n:])
    eq = ob == fb  # (Q, n)
    j = jax.lax.broadcasted_iota(jnp.int32, (Q, n, 128), 2)
    onehot = (j == ob[:, :, None]) & eq[:, :, None]
    counts = jnp.sum(onehot.astype(jnp.int32), axis=1)  # (Q, 128)
    planes = [
        (counts > k).astype(jnp.int8) for k in range(PLANES)
    ]
    need_q = jnp.concatenate(planes, axis=1)  # (Q, PLANES*128)
    need = need_q.T  # (PLANES*128, Q)
    tot = jnp.sum(need_q.astype(jnp.int32), axis=1)
    return need, tot


def needle_need_matrix_np(needles_q: np.ndarray) -> tuple:
    """Host (NumPy) twin of :func:`needle_need_matrix` — same math, no
    device round trip. Used by the serving dispatcher to choose the
    STATIC result-sort capacity from per-group alive counts before the
    program runs (an in-program ``lax.cond`` around the capped sort
    faults the TPU backend — see ops/batch finalize notes)."""
    needles_q = np.asarray(needles_q)
    Q, n2 = needles_q.shape
    n = n2 // 2
    ob = needles_q[:, :n].copy()
    fb = needles_q[:, n:].copy()

    def fold(v):
        upper = (v >= 0x41) & (v <= 0x5A)
        return np.where(upper, v + 0x20, v) & 127

    ob, fb = fold(ob), fold(fb)
    eq = ob == fb
    counts = np.zeros((Q, 128), np.int32)
    for q in range(Q):
        vals = ob[q][eq[q]]
        counts[q] = np.bincount(vals, minlength=128)[:128]
    planes = [(counts > k).astype(np.int8) for k in range(PLANES)]
    need_q = np.concatenate(planes, axis=1)  # (Q, PLANES*128)
    tot = need_q.astype(np.int32).sum(axis=1)
    return need_q.T, tot


def stage1_presence(
    mask: jnp.ndarray,  # (B, PLANES*4) int32 (only plane 0 is read)
    needle_packed: jnp.ndarray,  # (2n,) int32: orig then flip
    max_typos: int,
) -> jnp.ndarray:
    """(B,) bool: rows that may still match (missing units <= typo budget).
    Per-char OR of the orig/flip fold-bits — exact for unicode case pairs
    whose fold-bits differ. Reads only the >=1-occurrence plane (words
    0..3 of presence_mask's plane-major layout); the single-query path
    trades the multiplicity planes for the simpler per-char test."""
    n = needle_packed.shape[0] // 2
    mask4 = mask[:, :MASK_WORDS]  # plane 0: count >= 1

    def present(val):
        v = _fold_bit(val)
        w = v >> 5
        sel = jnp.zeros(mask4.shape[:1], jnp.int32)
        for wi in range(MASK_WORDS):
            sel = jnp.where(w == wi, mask4[:, wi], sel)
        return (jax.lax.shift_right_logical(sel, v & 31)) & 1

    miss = jnp.zeros(mask4.shape[:1], jnp.int32)
    for k in range(n):
        p = present(needle_packed[k]) | present(needle_packed[n + k])
        miss = miss + 1 - p
    return miss <= int(max_typos)
