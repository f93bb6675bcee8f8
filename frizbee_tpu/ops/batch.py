"""Fused whole-corpus matching: all buckets + all patterns + sort, one call.

The tunnel/PCIe boundary is the expensive resource (every dispatch and every
device->host fetch pays a latency floor), so the entire query — per-bucket
prefilter+SW for every pattern, multi-pattern combination, match filtering,
and the final (score desc, index asc) sort — runs as ONE jitted computation
returning one compact int32 matrix plus a match count. The host then issues
exactly two fetches: the count, and the first ``count`` sorted rows.

This is the TPU-shape of the reference's ``match_list`` contract
(reference: src/matcher/mod.rs:205-222 + src/sort.rs): same result set, same
total order, produced by one device program instead of a per-haystack loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .kernels import fuzzy_match_units
from .fuzzy import fuzzy_pipeline
from .literal import (
    literal_pipeline,
    literal_pipeline_ascii,
    literal_pipeline_units,
)

INT32_MAX = jnp.iinfo(jnp.int32).max

FUZZY_MODE = "fuzzy"


def _bucket_pattern_result(
    b, needle_orig, needle_flip, sc,
    *, max_typos, no_prefilter, use_kernel, scoring, mode, needle_byte_len,
    unicode=False,
):
    """One pattern over one bucket -> (matched, score, exact, end_col,
    greedy), each sized to the bucket's rows."""
    needle_packed = (
        jnp.concatenate([needle_orig, needle_flip]).astype(jnp.int32)
        if use_kernel and mode == FUZZY_MODE else None
    )
    if use_kernel and mode == FUZZY_MODE:
        # Fused Pallas path (byte or codepoint units)
        cp_units, nu2, _idx = b
        return fuzzy_match_units(
            cp_units, nu2, needle_packed,
            max_typos=max_typos, no_prefilter=no_prefilter,
            scoring=scoring, unicode=unicode,
        )
    if use_kernel and unicode:
        cp32, nu2, _idx = b
        m, s, e, ec, g, _ws, _we = literal_pipeline_units(
            cp32, nu2, needle_orig, needle_flip, sc,
            mode=mode, needle_byte_len=needle_byte_len, scoring=scoring,
        )
        return m, s, e, ec, g
    if use_kernel:
        cp8, nu2, _idx = b
        m, s, e, ec, g, _ws, _we = literal_pipeline_ascii(
            cp8, nu2, needle_orig, needle_flip, sc,
            mode=mode, needle_byte_len=needle_byte_len, scoring=scoring,
        )
        return m, s, e, ec, g
    cp, fb, plb, boff, blen, nu, nb, _idx = b
    if mode == FUZZY_MODE:
        m, s, e, ec, g, _ws, _we = fuzzy_pipeline(
            cp, fb, plb, boff, blen, nu, nb, needle_orig, needle_flip, sc,
            max_typos=max_typos, no_prefilter=no_prefilter,
        )
    else:
        m, s, e, ec, g, _ws, _we = literal_pipeline(
            cp, fb, plb, boff, blen, nu, nb, needle_orig, needle_flip, sc,
            mode=mode, needle_byte_len=needle_byte_len, scoring=scoring,
        )
    return m, s, e, ec, g


def _pack_misc(exact, end_col, greedy):
    """exact -> bit 17, greedy -> bit 16, end_col -> bits 0..15."""
    return (
        (exact.astype(jnp.int32) << 17)
        | (greedy.astype(jnp.int32) << 16)
        | jnp.minimum(end_col, 0xFFFF)
    )


def _sort_matches_desc(matched, score, exact, end_col, greedy, index,
                       n, score_bound):
    """Device sort by (matched first, score desc, index asc).

    When the static score bound and the corpus size fit one int32, score
    and index pack into a single composite key (score in the high bits,
    complemented index below) and the sort carries two operands instead of
    three; otherwise a two-key sort with a packed payload."""
    packed = _pack_misc(exact, end_col, greedy)
    idx_bits = max((n - 1).bit_length(), 1)
    if (
        score_bound is not None
        and score_bound.bit_length() + idx_bits <= 31
    ):
        idx_mask = (1 << idx_bits) - 1
        comp = (score << idx_bits) | (idx_mask - index)
        key = jnp.where(matched, -comp, 1).astype(jnp.int32)
        key, packed = jax.lax.sort((key, packed), num_keys=1)
        comp = -key
        index = idx_mask - (comp & idx_mask)
        score = comp >> idx_bits
        # unmatched rows decode to garbage index; restore the sentinel
        index = jnp.where(key == 1, INT32_MAX, index)
        score = jnp.where(key == 1, 0, score)
        return jnp.stack([index, score, packed], axis=1)
    key1 = jnp.where(matched, -score, 1).astype(jnp.int32)
    key2 = jnp.where(matched, index, INT32_MAX).astype(jnp.int32)
    key1, key2, packed = jax.lax.sort((key1, key2, packed), num_keys=2)
    return jnp.stack([key2, -key1, packed], axis=1)


def _fused_match_body(
    buckets, patterns, xl_mask, n, pattern_statics, sort_by_score,
    use_kernel, unicode, score_bound=None
):
    # Per-bucket combination (all patterns share the bucket layout), then a
    # single concatenation — no dense scatters. XL rows appear in no bucket
    # and so are naturally absent from device results (host path fills
    # them in); xl_mask is unused but kept in the signature for cache
    # stability of the public jits.
    parts = []
    for b in buckets:
        idx_b = b[-1] if len(b) == 3 else b[7]
        rows = idx_b.shape[0]
        # size-class padding rows carry index -1 and can never match
        cm = idx_b >= 0
        cs = jnp.zeros((rows,), jnp.int32)
        ce = jnp.zeros((rows,), jnp.bool_)
        cec = jnp.zeros((rows,), jnp.int32)
        cg = jnp.zeros((rows,), jnp.bool_)
        for (orig, flip, sc), (
            typos, nopre, negated, scoring, mode, nbl
        ) in zip(patterns, pattern_statics):
            m, s, e, ec, g = _bucket_pattern_result(
                b, orig, flip, sc, max_typos=typos, no_prefilter=nopre,
                use_kernel=use_kernel, scoring=scoring, mode=mode,
                needle_byte_len=nbl, unicode=unicode,
            )
            if negated:
                cm = cm & ~m
            else:
                cm = cm & m
                cs = jnp.minimum(cs + jnp.where(m, s, 0), 0xFFFF)
                ce = ce | (e & m)
                cec = jnp.maximum(cec, jnp.where(m, ec, 0))
                cg = cg | (g & m)
        parts.append((cm, cs, ce, cec, cg, idx_b))

    if not parts:  # corpus entirely XL/empty: no device rows
        z = jnp.zeros((0,), jnp.int32)
        parts = [(z.astype(jnp.bool_), z, z.astype(jnp.bool_), z,
                  z.astype(jnp.bool_), z)]
    c_matched, c_score, c_exact, c_end, c_greedy, index = (
        jnp.concatenate([p[i] for p in parts]) for i in range(6)
    )
    count = jnp.sum(c_matched).astype(jnp.int32)
    if sort_by_score:
        out = _sort_matches_desc(c_matched, c_score, c_exact, c_end,
                                 c_greedy, index, n, score_bound)
    else:
        key2 = jnp.where(c_matched, index, INT32_MAX).astype(jnp.int32)
        packed = _pack_misc(c_exact, c_end, c_greedy)
        key2, score, packed = jax.lax.sort(
            (key2, c_score, packed), num_keys=1
        )
        out = jnp.stack([key2, score, packed], axis=1)
    # Row 0 carries the match count so count + top rows arrive in ONE
    # device->host fetch (the transport roundtrip is the latency floor)
    header = jnp.stack(
        [count, jnp.int32(0), jnp.int32(0)]
    )[None, :]
    return jnp.concatenate([header, out], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "pattern_statics", "sort_by_score", "use_kernel", "unicode",
        "score_bound",
    ),
)
def fused_match_sorted(
    buckets,  # per-bucket tuples: jnp 8-tuples, or kernel 3-tuples
    patterns,  # tuple of per-pattern (needle_orig, needle_flip, sc) tuples
    xl_mask,  # (n,) bool: rows longer than the largest bucket (host path)
    *,
    n: int,
    # per-pattern statics: (typos, no_prefilter, negated, scoring 9-tuple)
    pattern_statics: Tuple[Tuple[int, bool, bool, Tuple[int, ...]], ...],
    sort_by_score: bool = True,
    use_kernel: bool = False,
    unicode: bool = False,
    score_bound=None,
):
    """One-call corpus match. Returns out (1+n, 3) int32.

    Row 0 is [match_count, 0, 0]; rows 1.. are [index, score, packed] with
    packed = exact<<17 | needs_greedy<<16 | end_col. Matched rows come first
    in (score desc, index asc) order when ``sort_by_score``, else index asc.
    Multi-pattern combination per the reference model
    (src/matcher/multi.rs:84-152): non-negated scores sum (saturating u16),
    exact ORs, end_col maxes, negated patterns veto.
    """
    return _fused_match_body(
        buckets, patterns, xl_mask, n, pattern_statics, sort_by_score,
        use_kernel, unicode, score_bound,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "pattern_statics", "sort_by_score", "use_kernel", "unicode",
        "score_bound", "fetch_rows",
    ),
)
def fused_match_sorted_batch(
    buckets,
    stacked_patterns,  # tuple (per pattern position) of (orig, flip, sc),
    #                    each with a leading query axis Q
    xl_mask,
    *,
    n: int,
    pattern_statics: Tuple,  # shared by every query in the batch
    sort_by_score: bool = True,
    use_kernel: bool = False,
    unicode: bool = False,
    score_bound=None,
    fetch_rows: int = 6144,
):
    """Pipelined serving: match Q shape-uniform queries against one resident
    corpus in a single device program, one (Q, 1+fetch_rows, 3) fetch.

    The query loop is a ``lax.scan`` so the program is traced once
    regardless of Q — the device analog of running the reference's matcher
    once per query on a hot corpus, with dispatch and transport amortized
    across the batch (the production serving shape on an accelerator).
    Queries must agree on pattern count, per-pattern needle lengths, and
    statics; the caller groups by those.
    """

    def body(carry, patterns):
        out = _fused_match_body(
            buckets, patterns, xl_mask, n, pattern_statics, sort_by_score,
            use_kernel, unicode, score_bound,
        )
        return carry, out[: 1 + fetch_rows]

    _, outs = jax.lax.scan(body, jnp.int32(0), stacked_patterns)
    return outs
