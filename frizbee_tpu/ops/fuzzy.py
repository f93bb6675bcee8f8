"""Batched fuzzy matching: prefilter + Smith-Waterman over a packed bucket.

TPU-native design (inter-sequence parallelism): one array row per haystack,
columns are match units; thousands of haystacks score per invocation on the
VPU. The reference's in-register log-shift gap cascade
(src/smith_waterman/algo/ascii_gap.rs) is replaced by an *exact* max-plus
prefix scan of the sequential recurrence:

    left[j] = max_{k<=j} ( C[k] - (Q[j] - Q[k]) )  =  cummax(C + Q)[j] - Q[j]

where ``Q`` is the exclusive cumsum of per-column gap penalties
``p[k] = gap_extend + gap_open'·match[k]``. Both scans are log-depth and
fully vectorized over (batch, width). Scores are computed in int32; the
reference's u16 saturating semantics are reproduced exactly for configs that
pass its overflow guard (chained saturating subtractions equal a single
clamp at zero, and the guard rules out upper saturation).

The prefilter is the exact minimal-position DP over the typo budget (see
oracle/prefilter.py for the semantics contract), fused into the same jit so
XLA overlaps it with packing DMA.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import MAX_HAYSTACK_LEN

# Scoring vector layout (int32, shape (9,)):
#   0 match, 1 mismatch, 2 gap_open, 3 gap_extend, 4 prefix,
#   5 capitalization, 6 matching_case, 7 exact, 8 delimiter
SCORING_FIELDS = (
    "match_score",
    "mismatch_penalty",
    "gap_open_penalty",
    "gap_extend_penalty",
    "prefix_bonus",
    "capitalization_bonus",
    "matching_case_bonus",
    "exact_match_bonus",
    "delimiter_bonus",
)


def scoring_vector(scoring) -> jnp.ndarray:
    import numpy as np

    return jnp.asarray(
        np.array([getattr(scoring, f) for f in SCORING_FIELDS], dtype=np.int32)
    )


def _first_occurrence(occ: jnp.ndarray, cols: jnp.ndarray, big: int) -> jnp.ndarray:
    """Smallest column index where occ is True, else ``big``. (B,)"""
    return jnp.min(jnp.where(occ, cols, big), axis=1)


def _next_occurrence(
    occ: jnp.ndarray, pos: jnp.ndarray, cols: jnp.ndarray, big: int
) -> jnp.ndarray:
    """Smallest column >= pos where occ is True, else ``big``. (B,)"""
    return jnp.min(jnp.where(occ & (cols >= pos[:, None]), cols, big), axis=1)


def _last_occurrence(occ: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """Largest column where occ is True, else -1. (B,)"""
    return jnp.max(jnp.where(occ, cols, -1), axis=1)


def prefilter_bucket(
    cp: jnp.ndarray,  # (B, W) int32 unit values
    byte_off: jnp.ndarray,  # (B, W) int32
    byte_len: jnp.ndarray,  # (B, W) int32
    n_units: jnp.ndarray,  # (B,) int32
    n_bytes: jnp.ndarray,  # (B,) int32
    needle_orig: jnp.ndarray,  # (n,) int32
    needle_flip: jnp.ndarray,  # (n,) int32
    max_typos: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Typo-tolerant ordered-subsequence prefilter + trim window.

    Semantics contract: oracle/prefilter.py. Returns
    (matched (B,) bool, wstart_byte (B,) int32, wend_byte (B,) int32) with the
    *untrimmed* window (the caller applies the start-1 trim).
    """
    B, W = cp.shape
    n = int(needle_orig.shape[0])
    T = int(max_typos)
    BIG = W + 1

    if n <= T:
        # A needle no longer than the typo budget matches everything
        # (reference: src/prefilter/algo/ascii_typos.rs:263-267)
        ones = jnp.ones((B,), jnp.bool_)
        return ones, jnp.zeros((B,), jnp.int32), n_bytes.astype(jnp.int32)

    cols = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    valid = cols < n_units[:, None]

    def occ_of(k: int) -> jnp.ndarray:
        return valid & ((cp == needle_orig[k]) | (cp == needle_flip[k]))

    # Minimal-position DP over the typo budget: f[t] = minimal units consumed
    # to match the needle prefix with <= t deletions
    f = [jnp.zeros((B,), jnp.int32) for _ in range(T + 1)]
    first_occ_start = jnp.full((B,), BIG, jnp.int32)
    start_unit_zero_typo = jnp.zeros((B,), jnp.int32)
    for k in range(n):
        occ = occ_of(k)
        if k <= T and k <= n - 1:
            # window start (typo case): min first-occurrence among the first
            # T+1 needle units
            first_occ_start = jnp.minimum(
                first_occ_start, _first_occurrence(occ, cols, BIG)
            )
        nf = []
        for t in range(T + 1):
            nxt = jnp.where(
                f[t] <= W,
                jnp.minimum(_next_occurrence(occ, f[t], cols, BIG) + 1, BIG),
                BIG,
            )
            if t > 0:
                nxt = jnp.minimum(nxt, f[t - 1])
            nf.append(nxt)
        if k == 0:
            start_unit_zero_typo = jnp.minimum(nf[0] - 1, W)
        f = nf

    matched = f[T] <= W

    if T == 0:
        # start = greedy first hit of needle[0]; end = one past the last
        # occurrence of the final needle unit at/after the greedy completion
        occ_last = occ_of(n - 1)
        last_pos = f[0] - 1  # unit index of the greedy final match
        e = _last_occurrence(occ_last & (cols >= last_pos[:, None]), cols)
        e_c = jnp.clip(e, 0, W - 1)
        start_u = jnp.clip(start_unit_zero_typo, 0, W - 1)
        wstart = jnp.take_along_axis(byte_off, start_u[:, None], axis=1)[:, 0]
        wend = (
            jnp.take_along_axis(byte_off, e_c[:, None], axis=1)
            + jnp.take_along_axis(byte_len, e_c[:, None], axis=1)
        )[:, 0]
        wend = jnp.where(e >= 0, wend, n_bytes)
    else:
        start_u = jnp.clip(first_occ_start, 0, W - 1)
        wstart = jnp.where(
            first_occ_start <= W,
            jnp.take_along_axis(byte_off, start_u[:, None], axis=1)[:, 0],
            0,
        )
        occ_tail = jnp.zeros((B, W), jnp.bool_)
        for k in range(max(n - 1 - T, 0), n):
            occ_tail = occ_tail | occ_of(k)
        e = _last_occurrence(occ_tail, cols)
        e_c = jnp.clip(e, 0, W - 1)
        wend = (
            jnp.take_along_axis(byte_off, e_c[:, None], axis=1)
            + jnp.take_along_axis(byte_len, e_c[:, None], axis=1)
        )[:, 0]
        wend = jnp.where(e >= 0, wend, n_bytes)

    wstart = jnp.where(matched, wstart, 0)
    wend = jnp.where(matched, wend, n_bytes)
    return matched, wstart.astype(jnp.int32), wend.astype(jnp.int32)


def sw_score_bucket(
    cp: jnp.ndarray,  # (B, W) int32
    first_byte: jnp.ndarray,  # (B, W) int32
    prev_last_byte: jnp.ndarray,  # (B, W) int32 (-1 = none)
    byte_off: jnp.ndarray,  # (B, W) int32
    byte_len: jnp.ndarray,  # (B, W) int32
    n_units: jnp.ndarray,  # (B,) int32
    wstart: jnp.ndarray,  # (B,) int32 trimmed window start (byte)
    wend: jnp.ndarray,  # (B,) int32 window end (byte, exclusive)
    needle_orig: jnp.ndarray,  # (n,) int32
    needle_flip: jnp.ndarray,  # (n,) int32
    sc: jnp.ndarray,  # (9,) int32 scoring vector
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched Smith-Waterman scores + end columns over a window-masked bucket.

    Semantics contract: oracle/smith_waterman.py. Returns
    (score (B,) int32, end_col (B,) int32 absolute byte offset).
    """
    B, W = cp.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    valid = cols < n_units[:, None]

    match_score = sc[0]
    mismatch = sc[1]
    gap_ext = sc[3]
    gop_extra = jnp.maximum(sc[2] - gap_ext, 0)

    # Window mask in unit space: a unit participates when fully inside the
    # byte window (see corpus/tokenize docs for the mid-scalar trim cases)
    active = valid & (byte_off >= wstart[:, None]) & (
        byte_off + byte_len <= wend[:, None]
    )
    # First window unit: no capitalization/delimiter bonus (its context byte
    # is outside the window); prefix bonus only when the window starts at
    # byte 0 (reference: src/matcher/algo.rs:332-338, ascii.rs:50-56)
    first_unit_idx = jnp.argmax(active, axis=1).astype(jnp.int32)
    is_first = active & (cols == first_unit_idx[:, None])
    include_prefix = (wstart == 0)[:, None]

    fb = first_byte
    pb = prev_last_byte
    is_upper = (fb >= 0x41) & (fb <= 0x5A)
    prev_lower = (pb >= 0x61) & (pb <= 0x7A)

    def delim(b):
        letter = ((b >= 0x41) & (b <= 0x5A)) | ((b >= 0x61) & (b <= 0x7A))
        digit = (b >= 0x30) & (b <= 0x39)
        return (b >= 0) & (b <= 127) & ~letter & ~digit

    cap_mask = is_upper & prev_lower & ~is_first
    delim_mask = delim(pb) & ~delim(fb) & ~is_first
    bonus = (
        jnp.where(cap_mask, sc[5], 0)
        + jnp.where(delim_mask, sc[8], 0)
        + jnp.where(is_first & include_prefix, sc[4], 0)
    ).astype(jnp.int32)

    zero_row = jnp.zeros((B, W), jnp.int32)

    def shift_right(x):
        return jnp.concatenate([jnp.zeros((B, 1), x.dtype), x[:, :-1]], axis=1)

    def row_step(carry, needle_unit):
        prev_row, prev_mm = carry
        n_o, n_f = needle_unit
        match = active & ((cp == n_o) | (cp == n_f))
        exactc = active & (cp == n_o)

        diag_base = shift_right(prev_row)
        diag_m = (
            diag_base
            + match_score
            + bonus
            + jnp.where(exactc, sc[6], 0)
        )
        diag_u = jnp.maximum(diag_base - mismatch, 0)
        diag = jnp.where(match, diag_m, diag_u)

        up = jnp.maximum(
            prev_row - gap_ext - jnp.where(prev_mm, gop_extra, 0), 0
        )
        c = jnp.maximum(diag, up)

        # Exact max-plus prefix scan of the sequential left propagation
        p = gap_ext + jnp.where(match, gop_extra, 0)  # cost of leaving col j
        q = shift_right(jnp.cumsum(p, axis=1))  # Q[j] = sum_{k<j} p[k]
        row = jax.lax.cummax(c + q, axis=1) - q

        return (row, match), None

    (final_row, _), _ = jax.lax.scan(
        row_step,
        (zero_row, jnp.zeros((B, W), jnp.bool_)),
        (needle_orig, needle_flip),
    )

    # Lanes past the window accumulate mismatch-decayed values that can
    # exceed the true in-window max (the reference DPs only the trimmed
    # window, src/matcher/algo.rs:332-338) — mask them out of the result
    final_row = jnp.where(active, final_row, 0)
    score = jnp.max(final_row, axis=1, initial=0)
    # end column: first column holding the max, reported at the unit's start
    # byte (reference: src/smith_waterman/algo/mod.rs:166-198)
    end_unit = jnp.argmax(final_row == score[:, None], axis=1).astype(jnp.int32)
    end_col = jnp.take_along_axis(byte_off, end_unit[:, None], axis=1)[:, 0]
    # A zero score never beats the scan's initial max, so the reported column
    # degrades to the window start (reference: algo/mod.rs:180-198 + the
    # start_pos add at src/matcher/algo.rs:252-257)
    end_col = jnp.where(score > 0, end_col, wstart)

    return score.astype(jnp.int32), end_col.astype(jnp.int32)


def fuzzy_pipeline(
    cp,
    first_byte,
    prev_last_byte,
    byte_off,
    byte_len,
    n_units,
    n_bytes,
    needle_orig,
    needle_flip,
    sc,
    *,
    max_typos: int = 0,
    no_prefilter: bool = False,
):
    """Full fuzzy pipeline for one bucket: prefilter -> trim -> SW -> exact.

    Returns (matched, score, exact, end_col, needs_greedy, wstart_trimmed,
    wend) — all (B,) arrays. Rows flagged ``needs_greedy`` (trimmed window
    longer than MAX_HAYSTACK_LEN bytes) carry no valid score and must be
    rescored on the host greedy path (reference:
    src/smith_waterman/algo/ascii.rs:11-21).
    """
    B, W = cp.shape
    n = int(needle_orig.shape[0])

    if no_prefilter:
        matched = jnp.ones((B,), jnp.bool_)
        wstart_raw = jnp.zeros((B,), jnp.int32)
        wend = n_bytes.astype(jnp.int32)
    else:
        matched, wstart_raw, wend = prefilter_bucket(
            cp, byte_off, byte_len, n_units, n_bytes,
            needle_orig, needle_flip, max_typos,
        )

    # Trim: back up one byte to preserve the delimiter-bonus context
    # (reference: src/matcher/algo.rs:332-338)
    wstart = jnp.maximum(wstart_raw - 1, 0)
    include_exact = (wstart == 0) & (wend == n_bytes)
    needs_greedy = matched & ((wend - wstart) > MAX_HAYSTACK_LEN)

    score, end_col = sw_score_bucket(
        cp, first_byte, prev_last_byte, byte_off, byte_len, n_units,
        wstart, wend, needle_orig, needle_flip, sc,
    )

    # exact match: full-window coverage and byte equality with the needle
    # (case-sensitive; reference: src/matcher/algo.rs:245-248)
    if n <= W:
        eq_units = jnp.all(cp[:, :n] == needle_orig[None, :], axis=1)
        exact = include_exact & (n_units == n) & eq_units
    else:
        exact = jnp.zeros((B,), jnp.bool_)
    score = jnp.where(exact, jnp.minimum(score + sc[7], 0xFFFF), score)

    return matched, score, exact, end_col, needs_greedy, wstart, wend


# Jitted entry point for the single-device engine; the distributed path calls
# ``fuzzy_pipeline`` directly inside shard_map (frizbee_tpu/parallel.py).
fuzzy_match_bucket = jax.jit(
    fuzzy_pipeline, static_argnames=("max_typos", "no_prefilter")
)
