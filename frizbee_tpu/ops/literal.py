"""Batched literal matching: exact / prefix / suffix / substring.

Device re-design of the reference's literal subsystem
(reference: src/literal/algo.rs). Where the reference seeds a SIMD scan from
the two rarest needle bytes and verifies each seed serially
(src/literal/algo.rs:262-313, rank.rs), the batched shape computes the full
occurrence mask directly: per needle unit k, a match mask shifted left by k
and AND-ed — n passes over the (B, W) bucket, entirely vectorized. Scoring
reuses the SW per-char schedule (match + case + prefix/capitalization/
delimiter bonuses, exact bonus for whole-haystack runs;
src/literal/algo.rs:183-227) via an exclusive prefix sum of the
needle-independent per-unit bonus.

Substring keeps the highest-scoring occurrence preferring the earliest on
ties, exactly like the reference's find_substring. ``max_typos`` is ignored
(reference: src/literal/mod.rs:1-8). Works on both unit packings (bytes or
codepoints); unit-aligned comparison inherently rejects the hybrid byte
sequences the unicode oracle tests pin (src/literal/mod.rs:327-341).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# mode statics
EXACT, PREFIX, SUFFIX, SUBSTRING = "exact", "prefix", "suffix", "substring"


def _shift_left(x, k, fill):
    if k == 0:
        return x
    B = x.shape[0]
    pad = jnp.full((B, k), fill, x.dtype)
    return jnp.concatenate([x[:, k:], pad], axis=1)


def _prefix_sum(x):
    """Inclusive prefix sum along axis 1 via a log2(W) doubling scan
    (jnp.cumsum lowers to an O(W)-per-element reduce-window on TPU)."""
    B, W = x.shape
    k = 1
    out = x
    while k < W:
        out = out + jnp.concatenate(
            [jnp.zeros((B, k), out.dtype), out[:, :-k]], axis=1
        )
        k *= 2
    return out


def literal_context(
    first_byte, prev_last_byte, byte_off, n_units, *, n, W, scoring
):
    """Needle-VALUE-independent context for one bucket: (valid,
    win_bonus, last_start, cols). Depends only on the corpus and the
    static needle length ``n``, so the batched serving path computes it
    ONCE per (bucket, group) and shares it across every query in the
    scan (XLA does not hoist these out of the query loop by itself)."""
    (_ms, _mm, _gop, _gex, prefix_b, cap_b, _case_b, _exact_b,
     delim_b) = scoring
    B = n_units.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    valid = cols < n_units[:, None]
    fb, pb = first_byte, prev_last_byte
    is_upper = (fb >= 0x41) & (fb <= 0x5A)
    prev_lower = (pb >= 0x61) & (pb <= 0x7A)

    def delim(b):
        letter = ((b >= 0x41) & (b <= 0x5A)) | ((b >= 0x61) & (b <= 0x7A))
        digit = (b >= 0x30) & (b <= 0x39)
        return (b >= 0) & (b <= 127) & ~letter & ~digit

    at_zero = byte_off == 0
    bonus = jnp.where(
        at_zero,
        prefix_b,
        jnp.where(is_upper & prev_lower, cap_b, 0)
        + jnp.where(delim(pb) & ~delim(fb), delim_b, 0),
    ).astype(jnp.int32)
    # windowed sum of bonus over [p, p+n): exclusive prefix-sum
    # difference. The prefix sum is a log2(W) doubling scan — XLA's
    # jnp.cumsum lowers to an O(W)-per-element reduce-window on TPU
    # (~13 ms per 100M elements vs ~1 ms here) — and the window-end
    # lookup is a STATIC shift, never a gather (TPU scalarizes
    # per-element dynamic gathers at ~10 ns/element).
    cumb = _prefix_sum(jnp.where(valid, bonus, 0))
    cumb_excl = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), cumb[:, :-1]], axis=1
    )
    if n > 1:
        end_sum = jnp.concatenate(
            [cumb[:, n - 1:],
             jnp.broadcast_to(cumb[:, -1:], (B, n - 1))], axis=1
        )
    else:
        end_sum = cumb
    win_bonus = end_sum - cumb_excl
    last_start = n_units[:, None] - n
    return valid, win_bonus, last_start, cols


def literal_match_ctx(
    ctx, cp, n_units, n_bytes, byte_off, needle_orig, needle_flip,
    *, mode, needle_byte_len, scoring,
):
    """Per-query half of the literal match over one bucket, given the
    hoisted ``literal_context``. Returns (matched, score, exact,
    end_col)."""
    (match_score, _mm, _gop, _gex, _pfx, _cap, case_b, exact_b,
     _dlm) = scoring
    valid, win_bonus, last_start, cols = ctx
    B, W = cp.shape
    n = int(needle_orig.shape[0])

    # Occurrence mask: occ[:, p] == needle matches units p..p+n-1.
    # Match and exact-case bits pack into ONE int8 per (unit, k) so each
    # k materializes a single shifted array (the shift-concats are
    # fusion boundaries — every materialization is a full (B, W) HBM
    # round trip, and this loop dominates the literal serving body).
    occ = jnp.ones((B, W), jnp.bool_)
    case_cnt = jnp.zeros((B, W), jnp.int8)
    for k in range(n):
        eq_o = valid & (cp == needle_orig[k])
        mk = (
            eq_o.astype(jnp.int8)
            | ((valid & (cp == needle_flip[k])).astype(jnp.int8) << 1)
        )
        sh = _shift_left(mk, k, jnp.int8(0))
        occ = occ & (sh > 0)
        case_cnt = case_cnt + (sh & 1)
    occ = occ & (cols <= last_start)
    case_cnt = case_cnt.astype(jnp.int32)

    score_at = n * match_score + win_bonus + case_b * case_cnt
    # whole-haystack exact run bonus (only possible at p == 0 with the
    # needle covering every unit)
    covers = (n_units == n)[:, None] & (cols == 0)
    score_at = score_at + jnp.where(covers, exact_b, 0)
    score_at = jnp.minimum(score_at, 0xFFFF)

    if mode == EXACT:
        sel = occ & (cols == 0) & (n_units == n)[:, None]
    elif mode == PREFIX:
        sel = occ & (cols == 0)
    elif mode == SUFFIX:
        sel = occ & (cols == last_start)
    elif mode == SUBSTRING:
        sel = occ
    else:  # pragma: no cover
        raise ValueError(mode)

    NEG = jnp.int32(-1)
    masked = jnp.where(sel, score_at, NEG)
    best = jnp.max(masked, axis=1)
    matched = best >= 0
    # earliest position achieving the best score (reference tie-break)
    BIGP = W + 1
    pos_candidates = jnp.where(masked == best[:, None], cols, BIGP)
    pos = jnp.clip(jnp.min(pos_candidates, axis=1), 0, W - 1)
    # byte offset at pos via a masked reduce (no per-row gather)
    pos_byte = jnp.max(
        jnp.where(cols == pos[:, None], byte_off, 0), axis=1
    )
    end_col = jnp.where(
        matched,
        jnp.minimum(pos_byte + needle_byte_len - 1, 0xFFFF),
        0,
    )
    exact = matched & (pos == 0) & (n_bytes == needle_byte_len)
    score = jnp.where(matched, best, 0)
    return matched, score.astype(jnp.int32), exact, end_col.astype(jnp.int32)


def literal_pipeline(
    cp: jnp.ndarray,  # (B, W) int32 unit values
    first_byte: jnp.ndarray,  # (B, W) int32
    prev_last_byte: jnp.ndarray,  # (B, W) int32 (-1 = none)
    byte_off: jnp.ndarray,  # (B, W) int32
    byte_len: jnp.ndarray,  # (B, W) int32
    n_units: jnp.ndarray,  # (B,) int32
    n_bytes: jnp.ndarray,  # (B,) int32
    needle_orig: jnp.ndarray,  # (n,) int32
    needle_flip: jnp.ndarray,  # (n,) int32
    sc: jnp.ndarray,  # (9,) int32 scoring vector (unused: statics rule)
    *,
    mode: str,
    needle_byte_len: int,
    scoring: Tuple[int, ...],
):
    """Batched literal match. Returns (matched, score, exact, end_col,
    needs_greedy=False, wstart=0, wend=n_bytes) matching the fuzzy
    pipeline's output contract so the fused graph can mix pattern modes."""
    B, W = cp.shape
    n = int(needle_orig.shape[0])

    if n == 0 or n > W:
        z = jnp.zeros((B,), jnp.int32)
        f = jnp.zeros((B,), jnp.bool_)
        return f, z, f, z, f, z, n_bytes.astype(jnp.int32)

    ctx = literal_context(
        first_byte, prev_last_byte, byte_off, n_units,
        n=n, W=W, scoring=scoring,
    )
    matched, score, exact, end_col = literal_match_ctx(
        ctx, cp, n_units, n_bytes, byte_off, needle_orig, needle_flip,
        mode=mode, needle_byte_len=needle_byte_len, scoring=scoring,
    )
    zeros = jnp.zeros((B,), jnp.int32)
    return (
        matched,
        score,
        exact,
        end_col,
        jnp.zeros((B,), jnp.bool_),
        zeros,
        n_bytes.astype(jnp.int32),
    )


# Jitted entry point for the standalone engine path; the fused graph calls
# literal_pipeline directly (ops/batch.py)
literal_match_bucket = functools.partial(
    jax.jit, static_argnames=("mode", "needle_byte_len", "scoring")
)(literal_pipeline)


def literal_pipeline_ascii(
    cp8: jnp.ndarray,  # (B, W) int8 bytes
    n_units2: jnp.ndarray,  # (B, 1) int32
    needle_orig: jnp.ndarray,
    needle_flip: jnp.ndarray,
    sc: jnp.ndarray,
    *,
    mode: str,
    needle_byte_len: int,
    scoring: Tuple[int, ...],
):
    """ASCII adapter: derives the byte-context arrays from cp8 in-graph so
    the kernel-path corpus representation feeds the literal op too."""
    B, W = cp8.shape
    cp = cp8.astype(jnp.int32) & 0xFF
    nu = n_units2[:, 0]
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), cp[:, :-1]], axis=1
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    ones = jnp.ones((B, W), jnp.int32)
    return literal_pipeline(
        cp, cp, prev, cols, ones, nu, nu, needle_orig, needle_flip, sc,
        mode=mode, needle_byte_len=needle_byte_len, scoring=scoring,
    )


def literal_pipeline_units(
    cp32: jnp.ndarray,  # (B, W) int32 codepoints
    n_units2: jnp.ndarray,  # (B, 1) int32
    needle_orig: jnp.ndarray,
    needle_flip: jnp.ndarray,
    sc: jnp.ndarray,
    *,
    mode: str,
    needle_byte_len: int,
    scoring: Tuple[int, ...],
):
    """Unicode adapter: derives the UTF-8 byte context from codepoints
    in-graph (same formulas as ops/kernels._unit_context) so the
    codepoint kernel representation feeds the literal op too."""
    B, W = cp32.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    valid = cols < n_units2
    cp = jnp.where(valid, cp32, 0)
    blen = (
        1
        + (cp >= 0x80).astype(jnp.int32)
        + (cp >= 0x800).astype(jnp.int32)
        + (cp >= 0x10000).astype(jnp.int32)
    )
    blen = jnp.where(valid, blen, 0)
    first = jnp.where(
        cp < 0x80,
        cp,
        jnp.where(
            cp < 0x800,
            0xC0 | (cp >> 6),
            jnp.where(cp < 0x10000, 0xE0 | (cp >> 12), 0xF0 | (cp >> 18)),
        ),
    )
    first = jnp.where(valid, first, 0)
    last = jnp.where(cp < 0x80, cp, 0x80 | (cp & 0x3F))
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), last[:, :-1]], axis=1
    )
    prev = jnp.where(valid, prev, -1)
    csum = _prefix_sum(blen)
    boff = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), csum[:, :-1]], axis=1
    )
    boff = jnp.where(valid, boff, 0)
    n_bytes = csum[:, -1]
    nu = n_units2[:, 0]
    return literal_pipeline(
        cp, first, prev, boff, blen, nu, n_bytes,
        needle_orig, needle_flip, sc,
        mode=mode, needle_byte_len=needle_byte_len, scoring=scoring,
    )
