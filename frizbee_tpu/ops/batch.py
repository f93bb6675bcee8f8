"""Fused whole-corpus matching: all buckets + all patterns + sort, one call.

The tunnel/PCIe boundary is the expensive resource (every dispatch and every
device->host fetch pays a latency floor), so the entire query — per-bucket
stage-1 reject + prefilter + SW for every pattern, multi-pattern
combination, match filtering, and the final (score desc, index asc) sort —
runs as ONE jitted computation returning one compact int32 matrix plus a
match count. The host then issues exactly two fetches: the count, and the
first ``count`` sorted rows.

Sorting is capacity-branched: matched rows are stable-partitioned to the
front in O(B) elementwise work, then only the smallest covering capacity
(8k / 64k / 256k / all) is actually sorted — the device analog of the
reference sorting its ``Vec<Match>`` of survivors, not the whole corpus
(reference: src/matcher/mod.rs:205-222 + src/sort.rs).

Fetched rows are packed to two int32 words ([index, meta]) to halve
transport on latency/bandwidth-limited host links.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .kernels import (
    INT16_MOSAIC_OK,
    block_rows,
    fuzzy_match_units,
    match_units,
    pack_needle_scalars,
    pack_rows_for_kernel,
    score_fits_int16,
)
from .presence import needle_need_matrix
from .fuzzy import fuzzy_pipeline
from .literal import (
    literal_pipeline,
    literal_pipeline_ascii,
    literal_pipeline_units,
)

INT32_MAX = jnp.iinfo(jnp.int32).max

FUZZY_MODE = "fuzzy"

# Sort capacities (padded upward per corpus); see _select_sorted
SORT_CAPS = (8192, 65536, 262144)

# Test hook: force the two-key (wide) result sort regardless of corpus
# size, so small CPU corpora can exercise the 10M+-row key layout
_FORCE_WIDE_KEYS = False

# Batched P3 sorts amortize the per-sort floor across Q, but their HLO
# temps scale with Q x total x n_operands; past this TOTAL-element budget
# (512M elements = 2 GB of int32 across all operands) the result sort
# runs per query inside the scan body and only fetch_rows survive to the
# stack — this is what keeps the in-place fallback compilable at 10M+
# rows. Module-level so tests can lower it to exercise the in-body path
# on small corpora.
SORT_BODY_BUDGET = 1 << 29


def order_keys(matched, score, index):
    """(primary, secondary) ascending-sort keys realizing (matched first,
    score desc, index asc); unmatched rows sort last as (1, INT32_MAX).
    Shared by the batch fast path's wide result keys and the mesh top-k
    (parallel.py) so the two orders can never diverge."""
    neg_score = jnp.where(matched, -score, 1)
    idx = jnp.where(matched, index, INT32_MAX)
    return neg_score.astype(jnp.int32), idx.astype(jnp.int32)


def _bucket_pattern_result(
    b, needle_orig, needle_flip, sc,
    *, max_typos, no_prefilter, use_kernel, scoring, mode, needle_byte_len,
    unicode=False,
):
    """One pattern over one bucket -> (matched, score, exact, end_col,
    greedy), each sized to the bucket's rows."""
    if use_kernel and mode == FUZZY_MODE:
        # Fused Pallas path (byte or codepoint units)
        cp_units, nu2, _idx, mask4, _bits8 = b
        needle_packed = jnp.concatenate(
            [needle_orig, needle_flip]
        ).astype(jnp.int32)
        return fuzzy_match_units(
            cp_units, nu2, needle_packed,
            max_typos=max_typos, no_prefilter=no_prefilter,
            scoring=scoring, unicode=unicode, mask4=mask4,
        )
    if use_kernel and unicode:
        cp32, nu2, _idx, _mask4, _bits8 = b
        m, s, e, ec, g, _ws, _we = literal_pipeline_units(
            cp32, nu2, needle_orig, needle_flip, sc,
            mode=mode, needle_byte_len=needle_byte_len, scoring=scoring,
        )
        return m, s, e, ec, g
    if use_kernel:
        cp8, nu2, _idx, _mask4, _bits8 = b
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


def _pack_meta(score, exact, greedy, end_col):
    """meta word: score<<16 | exact<<15 | greedy<<14 | end_col (14 bits).

    end_col is a byte offset within one haystack window, <= 4096 for the
    widest unicode bucket, so 14 bits are exact. Score is the saturated
    u16; bit patterns above 2^15 ride the int32 sign bit and are decoded
    with a uint32 view on the host."""
    return (
        jnp.left_shift(score & 0xFFFF, 16)
        | (exact.astype(jnp.int32) << 15)
        | (greedy.astype(jnp.int32) << 14)
        | jnp.minimum(end_col, 0x3FFF)
    )


def _select_sorted(matched, score, exact, end_col, greedy, index,
                   n, score_bound, sort_by_score):
    """Device select+sort: [index, meta] rows with all matches first in
    the configured order, via stable partition + capacity-branched sort.

    When the static score bound and the corpus size fit one int32, score
    and index pack into a single composite key (score in the high bits,
    complemented index below) so the sort carries two operands; otherwise
    a two-key sort."""
    B = matched.shape[0]
    count = jnp.sum(matched).astype(jnp.int32)
    meta = _pack_meta(score, exact, greedy, end_col)
    if B == 0:
        return count, jnp.zeros((0, 2), jnp.int32)

    idx_bits = max((n - 1).bit_length(), 1)
    composite = (
        sort_by_score
        and score_bound is not None
        and score_bound.bit_length() + idx_bits <= 31
    )

    # stable partition of matched rows to the front (O(B) elementwise)
    m32 = matched.astype(jnp.int32)
    cs = jnp.cumsum(m32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]
    pos = jnp.where(matched, cs - 1, count + iota - cs)

    if composite:
        idx_mask = (1 << idx_bits) - 1
        comp = (score << idx_bits) | (idx_mask - index)
        key = jnp.where(matched, -comp, INT32_MAX).astype(jnp.int32)
    elif sort_by_score:
        key = jnp.where(matched, -score, INT32_MAX).astype(jnp.int32)
    else:
        key = jnp.where(matched, index, INT32_MAX).astype(jnp.int32)
    key_p = jnp.full((B,), INT32_MAX, jnp.int32).at[pos].set(key)
    meta_p = jnp.zeros((B,), jnp.int32).at[pos].set(meta)
    idx_p = jnp.zeros((B,), jnp.int32).at[pos].set(index)

    caps = [c for c in SORT_CAPS if c < B] + [B]

    def sort_cap(cap):
        if composite:
            k2, m2 = jax.lax.sort(
                (key_p[:cap], meta_p[:cap]), num_keys=1, is_stable=False
            )
            comp2 = -k2
            i2 = idx_mask - (comp2 & idx_mask)
        elif sort_by_score:
            k2, i2, m2 = jax.lax.sort(
                (key_p[:cap], idx_p[:cap], meta_p[:cap]), num_keys=2,
                is_stable=False,
            )
        else:
            i2, m2 = jax.lax.sort(
                (key_p[:cap], meta_p[:cap]), num_keys=1, is_stable=False
            )
        head = jnp.stack([i2, m2], axis=1)
        if cap < B:
            tail = jnp.stack([idx_p[cap:], meta_p[cap:]], axis=1)
            head = jnp.concatenate([head, tail], axis=0)
        return head

    if len(caps) > 1:
        which = jnp.sum(
            jnp.stack([count > c for c in caps[:-1]]).astype(jnp.int32)
        )
        rows = jax.lax.switch(
            which, [functools.partial(sort_cap, c) for c in caps]
        )
    else:
        rows = sort_cap(B)
    return count, rows


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
        idx_b = b[2] if len(b) == 5 else b[7]
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
    count, out = _select_sorted(
        c_matched, c_score, c_exact, c_end, c_greedy, index,
        n, score_bound, sort_by_score,
    )
    # Row 0 carries the match count so count + top rows arrive in ONE
    # device->host fetch (the transport roundtrip is the latency floor)
    header = jnp.stack([count, jnp.int32(0)])[None, :]
    return jnp.concatenate([header, out], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "pattern_statics", "sort_by_score", "use_kernel", "unicode",
        "score_bound",
    ),
)
def fused_match_sorted(
    buckets,  # per-bucket tuples: jnp 8-tuples, or kernel 4-tuples
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
    """One-call corpus match. Returns out (1+rows, 2) int32.

    Row 0 is [match_count, 0]; rows 1.. are [index, meta] with
    meta = score<<16 | exact<<15 | needs_greedy<<14 | end_col. Matched rows
    come first in (score desc, index asc) order when ``sort_by_score``,
    else index asc. Multi-pattern combination per the reference model
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
        "score_bound", "fetch_rows", "bucket_statics",
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
    bucket_statics=None,  # per bucket (ident_base, n_real) for the fast path
):
    """Pipelined serving: match Q shape-uniform queries against one resident
    corpus in a single device program, one (Q, 1+fetch_rows, 2) fetch.

    The query loop is a ``lax.scan`` so the program is traced once
    regardless of Q — the device analog of running the reference's matcher
    once per query on a hot corpus, with dispatch and transport amortized
    across the batch (the production serving shape on an accelerator).
    Queries must agree on pattern count, per-pattern needle lengths, and
    statics; the caller groups by those.
    """

    fast = (
        use_kernel
        and sort_by_score
        and len(pattern_statics) == 1
        and pattern_statics[0][4] == FUZZY_MODE
        and not pattern_statics[0][2]  # not negated
        and score_bound is not None
        # any corpus size: the fast path switches to a two-key result
        # sort when score and index no longer co-pack into one int32
    )
    if fast:
        return _fused_match_batch_fast(
            buckets, stacked_patterns[0], n=n,
            statics=pattern_statics[0], unicode=unicode,
            score_bound=score_bound, fetch_rows=fetch_rows,
            bucket_statics=bucket_statics,
        )

    def body(carry, patterns):
        out = _fused_match_body(
            buckets, patterns, xl_mask, n, pattern_statics, sort_by_score,
            use_kernel, unicode, score_bound,
        )
        return carry, out[: 1 + fetch_rows]

    _, outs = jax.lax.scan(body, jnp.int32(0), stacked_patterns)
    return outs


def _fused_match_batch_fast(
    buckets,  # kernel 5-tuples: (cp, nu, idx, mask4, bits8)
    pattern,  # (orig (Q,n), flip (Q,n), sc (Q,9))
    *,
    n: int,
    statics,  # (typos, no_prefilter, negated, scoring, mode, nbl)
    unicode: bool,
    score_bound: int,
    fetch_rows: int,
    bucket_statics=None,  # per bucket (ident_base, n_real); base -1 = no
):
    """Q-batched single-pattern serving: the hot path.

    The per-query device floors on this class of backend are sorts and
    row-gathers (see benchmarks/probe_xla*.jsonl: a 131k-row sort costs
    about as much as an 8k-row one, gathers cost ~21 ns *per row*
    regardless of row width, and elementwise stage-1 costs ~1 ms/query at
    1M rows). The structure:

      P1 (batched, MXU): stage-1 presence for ALL queries is ONE int8
          matmul per bucket — presence-bit matrix (B, 128) x needle-need
          matrix (128, Q) -> hits. Survivor permutations come from one
          batched (Q, B) single-operand sort per bucket, whose key packs
          [reject-flag | n_units | row], so the kernel's unit counts ride
          the sort for free (survivor order is irrelevant: the composite
          result key restores (score, index) order in P3).
      P2 (scan over Q): ONE row-gather of the corpus at the static
          survivor capacity, then the fused prefilter+SW kernel, then
          composite result keys. Row indices are recovered arithmetically
          when the bucket rows are a contiguous corpus range (the common
          single-bucket case) — no second gather. A capacity miss (any
          query over the 1/8 survivor budget) switches the whole batch to
          the in-place flow, which skips compaction and runs the kernel
          over every row.
      P3 (batched): one (Q, cap) two-operand sort -> [index, meta] rows.
    """
    typos, no_prefilter, _neg, scoring, _mode, _nbl = statics
    orig_q, flip_q, _sc_q = pattern
    Q, nlen = orig_q.shape
    # clamp the typo budget to the needle length (a budget >= needle
    # length auto-passes either way; an unclamped budget would unroll
    # that many DP states in the kernel)
    T = min(int(typos), nlen)
    use_stage1 = not no_prefilter and nlen > T
    if bucket_statics is None:
        bucket_statics = ((-1, 0),) * len(buckets)

    idx_bits = max((n - 1).bit_length(), 1)
    idx_mask = (1 << idx_bits) - 1
    # Result ordering key: score and index co-pack into one int32 word
    # when they fit (one-operand P3 sort); corpora too large for that
    # (score_bits + idx_bits > 31, e.g. 10M+ rows) use a two-key sort
    # (-score, index) instead of falling off the fast path entirely.
    wide_keys = (
        score_bound.bit_length() + idx_bits > 31 or _FORCE_WIDE_KEYS
    )
    needles_q = jnp.concatenate([orig_q, flip_q], axis=1).astype(jnp.int32)

    if not buckets:
        # bucket-less corpus (empty, or every row XL): no device rows;
        # the host path fills XL matches in downstream
        return jnp.zeros((Q, 1 + fetch_rows, 2), jnp.int32)

    def run_kernel(cp_r, nu_r, needle_q, count_rows, width):
        """Kernel over logical rows; narrow (<128-lane) buckets pack
        G = 128//W rows per vector (kernels.pack_rows_for_kernel) and the
        (rows, 8) result restores logical order."""
        interpret = jax.default_backend() != "tpu"
        rows = cp_r.shape[0]
        cp_k, nu_k, seg, g = pack_rows_for_kernel(cp_r, nu_r)
        count = (count_rows + (g - 1)) // g if g > 1 else count_rows
        out = match_units(
            cp_k, nu_k, pack_needle_scalars(needle_q, count),
            max_typos=T, scoring=scoring, unicode=unicode,
            no_prefilter=no_prefilter,
            int16_lanes=(
                (not unicode)
                and score_fits_int16(scoring, nlen, width)
                and (interpret or INT16_MOSAIC_OK)
            ),
            interpret=interpret, seg=seg,
        )
        return out.reshape(rows, 8)

    def keys_from(out8, idx):
        matched = (out8[:, 0] > 0) & (idx >= 0)
        score = out8[:, 1]
        meta = _pack_meta(
            jnp.where(matched, score, 0),
            matched & (out8[:, 2] > 0),
            matched & (out8[:, 4] > 0),
            jnp.where(matched, out8[:, 3], 0),
        )
        cnt = jnp.sum(matched).astype(jnp.int32)
        if wide_keys:
            return order_keys(matched, score, idx), meta, cnt
        comp = (score << idx_bits) | (idx_mask - idx)
        key = jnp.where(matched, -comp, INT32_MAX).astype(jnp.int32)
        return (key,), meta, cnt

    def cat_keys(keys):
        """Concatenate per-bucket key tuples component-wise."""
        return tuple(
            jnp.concatenate([k[c] for k in keys])
            for c in range(len(keys[0]))
        )

    # one key operand (packed) or two (wide) + the meta payload
    n_sort_ops = 3 if wide_keys else 2

    def sort_in_body(total):
        """True when the batched finalize sort's operands would exceed
        the HBM budget — the single predicate both body_reduce and the
        finalize callers consult (they must agree: finalize skips the
        sort exactly when the body already did it)."""
        return Q * total * n_sort_ops > SORT_BODY_BUDGET

    def body_reduce(keys, metas, counts, total):
        """Per-scan-iteration reduction: concat bucket pieces, and sort+
        slice in-body when the batched finalize sort would blow HBM."""
        kc = cat_keys(keys)
        mc = jnp.concatenate(metas)
        cnt = jnp.sum(jnp.stack(counts))
        if sort_in_body(total):
            ops = jax.lax.sort(
                (*kc, mc), dimension=0, num_keys=len(kc),
                is_stable=False,
            )
            kc = tuple(o[:fetch_rows] for o in ops[:-1])
            mc = ops[-1][:fetch_rows]
        return kc, mc, cnt

    def finalize(keys, metas, counts, presorted):
        # P3: one batched multi-operand sort (skipped when the scan body
        # already sorted per query), then decode [index, meta] rows.
        # keys is a 1-tuple (packed word) or 2-tuple (-score, index);
        # keys embed the unique row index, so the order is total and the
        # sort need not be stable (stability would add an iota operand).
        if presorted:
            ops = (*keys, metas)
        else:
            ops = jax.lax.sort(
                (*keys, metas), dimension=1, num_keys=len(keys),
                is_stable=False,
            )
        metas = ops[-1]
        if wide_keys:
            index = ops[1]
        else:
            comp = -ops[0]
            index = idx_mask - (comp & idx_mask)
        rows = jnp.stack([index, metas], axis=2)[:, :fetch_rows]
        if rows.shape[1] < fetch_rows:
            rows = jnp.pad(
                rows, ((0, 0), (0, fetch_rows - rows.shape[1]), (0, 0))
            )
        header = jnp.concatenate(
            [counts[:, None, None],
             jnp.zeros((Q, 1, 1), jnp.int32)], axis=2,
        )
        return jnp.concatenate([header, rows], axis=1)

    def in_place_flow(perms, survivors):
        total = sum(b[0].shape[0] for b in buckets)

        def body(carry, xs):
            needle_q = xs[0]
            keys, metas, counts = [], [], []
            for b in buckets:
                cp, nu, idx, _m4, _bits8 = b
                out8 = run_kernel(
                    cp, nu, needle_q, cp.shape[0], cp.shape[1]
                )
                key, meta, cnt = keys_from(out8, idx)
                keys.append(key)
                metas.append(meta)
                counts.append(cnt)
            return carry, body_reduce(keys, metas, counts, total)

        _, (keys, metas, counts) = jax.lax.scan(
            body, jnp.int32(0), (needles_q,)
        )
        return finalize(keys, metas, counts, presorted=sort_in_body(total))

    def compacted_flow(div, perms, survivors):
        # perms: per bucket (Q, B_b) packed keys; survivors: (Q, n_buckets)
        def body(carry, xs):
            needle_q, perm_bs, surv = xs
            keys, metas, counts = [], [], []
            for bi, b in enumerate(buckets):
                cp, _nu, idx_arr, _m4, _bits8 = b
                B, W = cp.shape
                bbits = max((B - 1).bit_length(), 1)
                cap = _bucket_cap(B, W, div)
                pk = perm_bs[bi][:cap]
                row = pk & ((1 << bbits) - 1)
                nu_k = (
                    jax.lax.shift_right_logical(pk, bbits)
                    & ((1 << W.bit_length()) - 1)
                )[:, None]
                cp_k = jnp.take(cp, row, axis=0)
                base, n_real = bucket_statics[bi]
                if base >= 0:
                    idx = jnp.where(row < n_real, row + base, -1)
                else:
                    idx = jnp.take(idx_arr, row)
                cnt = jnp.minimum(surv[bi], cap)
                out8 = run_kernel(cp_k, nu_k, needle_q, cnt, W)
                key, meta, mcnt = keys_from(out8, idx)
                keys.append(key)
                metas.append(meta)
                counts.append(mcnt)
            return carry, body_reduce(keys, metas, counts, total)

        total = sum(
            _bucket_cap(b[0].shape[0], b[0].shape[1], div)
            for b in buckets
        )
        _, (keys, metas, counts) = jax.lax.scan(
            body, jnp.int32(0), (needles_q, perms, survivors)
        )
        return finalize(keys, metas, counts, presorted=sort_in_body(total))

    if not use_stage1:
        return in_place_flow(None, None)

    # P1a: MXU stage-1 hits + survivor counts (always runs; cheap)
    need, tot = needle_need_matrix(needles_q)
    thresh = tot - T  # (Q,) distinct bits that must be present
    s1_cols = []
    surv_cols = []
    for b in buckets:
        _cp, _nu, _idx, _mask4, bits8 = b
        hits = jax.lax.dot_general(
            bits8, need, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (B, Q)
        s1 = hits >= thresh[None, :]
        s1_cols.append(s1)
        surv_cols.append(jnp.sum(s1, axis=0).astype(jnp.int32))
    survivors = jnp.stack(surv_cols, axis=1)  # (Q, n_buckets)

    def empty_flow(_s):
        # No query in the batch has a single stage-1 survivor: the batch
        # analog of the reference prefilter's early exit on no-match
        # corpora — skip the survivor sorts, gathers, and kernels outright
        zeros = jnp.zeros((Q, fetch_rows, 2), jnp.int32)
        header = jnp.zeros((Q, 1, 2), jnp.int32)
        return jnp.concatenate([header, zeros], axis=1)

    def full_path(survivors):
        # P1b: one batched packed-key sort per bucket -> survivor perms
        perms = []
        for bi, b in enumerate(buckets):
            cp, nu, _idx, _mask4, _bits8 = b
            B, W = cp.shape
            bbits = max((B - 1).bit_length(), 1)
            # the packed survivor key is [reject | n_units | row]: row bits
            # + unit-count bits + the reject flag must fit int32. Holds for
            # every bucket built by pack_corpus (corpus.max_bucket_rows
            # caps B so bbits + wbits <= 30); a hand-built PackedBucket
            # violating it would silently mis-sort survivors.
            assert bbits + W.bit_length() + 1 <= 31, (
                f"bucket too large for the packed survivor key: "
                f"{B} rows x width {W} (see corpus.max_bucket_rows)"
            )
            iota = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
            keyb = (nu[:, 0] << bbits) | iota  # query-independent base
            key = jnp.where(
                s1_cols[bi], keyb[:, None],
                keyb[:, None] | (1 << (bbits + W.bit_length())),
            )
            # keys embed the row iota -> already a total order; an
            # unstable sort is ~2x cheaper on this backend
            perms.append(
                jax.lax.sort(key.T, dimension=1, is_stable=False)
            )  # (Q, B)

        # Tiered capacity switch: the row gather costs ~21 ns/row whether
        # or not a row survived, so low-survivor batches (stricter
        # needles, sparse-match corpora) take a 4x smaller gather tier; a
        # full miss falls back to the in-place flow (no compaction)
        def fits(div):
            return jnp.all(
                survivors
                <= jnp.asarray(
                    [_bucket_cap(b[0].shape[0], b[0].shape[1], div)
                     for b in buckets],
                    jnp.int32,
                )[None, :]
            )

        def tier(div, nxt):
            return lambda p, s: jax.lax.cond(
                fits(div), functools.partial(compacted_flow, div), nxt,
                p, s,
            )

        # 1/16 -> 1/8 -> 1/4 -> in-place: high-survivor workloads (large
        # typo budgets, short common needles) still compact at 1/4 — a
        # full-corpus kernel pass costs ~4x the B/4 tier
        chain = in_place_flow
        for div in (4, 8, 16):
            chain = tier(div, chain)
        return chain(tuple(perms), survivors)

    return jax.lax.cond(
        jnp.sum(survivors) == 0, empty_flow, full_path, survivors
    )


def _bucket_cap(B: int, W: int, div: int = 8) -> int:
    """Static survivor capacity for the compacted flow: 1/div of the
    bucket, rounded up to whole kernel blocks (in LOGICAL rows; narrow
    buckets pack G = 128//W rows per vector)."""
    g = 128 // W if W < 128 else 1
    tbo = block_rows(max(W, 128)) * g
    return min(B, -(-(B // div) // tbo) * tbo)
