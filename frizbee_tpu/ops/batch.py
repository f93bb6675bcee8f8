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
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .fuzzy import fuzzy_pipeline

INT32_MAX = jnp.iinfo(jnp.int32).max


def _dense_pattern_result(
    buckets, needle_orig, needle_flip, sc, n, *, max_typos, no_prefilter
):
    """Run one pattern over every bucket, scattered into dense (n,) arrays."""
    matched = jnp.zeros((n,), jnp.bool_)
    score = jnp.zeros((n,), jnp.int32)
    exact = jnp.zeros((n,), jnp.bool_)
    end_col = jnp.zeros((n,), jnp.int32)
    greedy = jnp.zeros((n,), jnp.bool_)
    for b in buckets:
        cp, fb, plb, boff, blen, nu, nb, idx = b
        m, s, e, ec, g, _ws, _we = fuzzy_pipeline(
            cp, fb, plb, boff, blen, nu, nb, needle_orig, needle_flip, sc,
            max_typos=max_typos, no_prefilter=no_prefilter,
        )
        matched = matched.at[idx].set(m)
        score = score.at[idx].set(s)
        exact = exact.at[idx].set(e)
        end_col = end_col.at[idx].set(ec)
        greedy = greedy.at[idx].set(g)
    return matched, score, exact, end_col, greedy


def _sort_matches_desc(matched, score, exact, end_col, greedy, index):
    """Device sort by (matched first, score desc, index asc)."""
    key1 = jnp.where(matched, -score, 1).astype(jnp.int32)
    key2 = jnp.where(matched, index, INT32_MAX).astype(jnp.int32)
    _k1, _k2, index, score, exact, end_col, greedy = jax.lax.sort(
        (key1, key2, index, score, exact.astype(jnp.int32),
         end_col, greedy.astype(jnp.int32)),
        num_keys=2,
    )
    out = jnp.stack([index, score, exact, end_col, greedy], axis=1)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("n", "pattern_statics", "sort_by_score"),
)
def fused_match_sorted(
    buckets,  # tuple of per-bucket 8-tuples (device arrays, idx last)
    patterns,  # tuple of per-pattern (needle_orig, needle_flip, sc) tuples
    xl_mask,  # (n,) bool: rows longer than the largest bucket (host path)
    *,
    n: int,
    pattern_statics: Tuple[Tuple[int, bool, bool], ...],  # (typos, nopre, neg)
    sort_by_score: bool = True,
):
    """One-call corpus match. Returns (out (n,5) int32 sorted, count int32).

    out columns: index, score, exact, end_col, needs_greedy. Matched rows
    come first in (score desc, index asc) order when ``sort_by_score``, else
    index asc; ``count`` of them are valid. Multi-pattern combination per the
    reference model (src/matcher/multi.rs:84-152): non-negated scores sum
    (saturating u16), exact ORs, end_col maxes, negated patterns veto.
    """
    c_matched = jnp.ones((n,), jnp.bool_)
    c_score = jnp.zeros((n,), jnp.int32)
    c_exact = jnp.zeros((n,), jnp.bool_)
    c_end = jnp.zeros((n,), jnp.int32)
    c_greedy = jnp.zeros((n,), jnp.bool_)

    for (orig, flip, sc), (typos, nopre, negated) in zip(
        patterns, pattern_statics
    ):
        m, s, e, ec, g = _dense_pattern_result(
            buckets, orig, flip, sc, n, max_typos=typos, no_prefilter=nopre
        )
        if negated:
            c_matched = c_matched & ~m
        else:
            c_matched = c_matched & m
            c_score = jnp.minimum(c_score + jnp.where(m, s, 0), 0xFFFF)
            c_exact = c_exact | (e & m)
            c_end = jnp.maximum(c_end, jnp.where(m, ec, 0))
            c_greedy = c_greedy | (g & m)

    c_matched = c_matched & ~xl_mask
    index = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    count = jnp.sum(c_matched).astype(jnp.int32)
    if sort_by_score:
        out = _sort_matches_desc(c_matched, c_score, c_exact, c_end,
                                 c_greedy, index)
    else:
        key2 = jnp.where(c_matched, index, INT32_MAX).astype(jnp.int32)
        _k2, index, score, exact, end_col, greedy = jax.lax.sort(
            (key2, index, c_score, c_exact.astype(jnp.int32), c_end,
             c_greedy.astype(jnp.int32)),
            num_keys=1,
        )
        out = jnp.stack([index, score, exact, end_col, greedy], axis=1)
    return out, count
