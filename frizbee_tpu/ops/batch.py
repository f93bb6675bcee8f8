"""Fused whole-corpus matching: all buckets + all patterns + sort, one call.

The tunnel/PCIe boundary is the expensive resource (every dispatch and every
device->host fetch pays a latency floor), so the entire query — per-bucket
stage-1 reject + prefilter + SW for every pattern, multi-pattern
combination, match filtering, and the final (score desc, index asc) sort —
runs as ONE jitted computation returning one compact int32 matrix plus a
match count. The host then issues exactly two fetches: the count, and the
first ``count`` sorted rows.

Sorting packs everything into ONE int64 key per row and runs ONE
single-operand device sort (sentinel keys sort last) — the device analog
of the reference sorting its ``Vec<Match>`` of survivors
(reference: src/matcher/mod.rs:205-222 + src/sort.rs); the batched
serving path additionally caps the sort to the stage-1-alive groups.

Fetched rows are packed to two int32 words ([index, meta]) to halve
transport on latency/bandwidth-limited host links.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .colstream import (
    colstream_literal_supported,
    colstream_supported,
    match_units_colstream,
)
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
    EXACT,
    PREFIX,
    SUBSTRING,
    SUFFIX,
    literal_context,
    literal_match_ctx,
    literal_pipeline,
    literal_pipeline_ascii,
    literal_pipeline_units,
)

INT32_MAX = jnp.iinfo(jnp.int32).max
INT64_MAX = jnp.iinfo(jnp.int64).max

FUZZY_MODE = "fuzzy"


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
    the configured order, via one packed single-operand sort.

    Everything packs into ONE int64 sort key — by score:
    [-((score << idx_bits) | (idx_mask - index)) << 16 | meta_low16];
    by index: [index << 32 | meta_u32] — because XLA:TPU's single-operand
    sort runs ~2x its two-operand sort at any width up to 64 bits
    (benchmarks/probe_sort64.py). Ascending int64 order realizes the
    configured total order; unmatched rows carry INT64_MAX."""
    B = matched.shape[0]
    count = jnp.sum(matched).astype(jnp.int32)
    meta = _pack_meta(score, exact, greedy, end_col)
    if B == 0:
        return count, jnp.zeros((0, 2), jnp.int32)

    idx_bits = max((n - 1).bit_length(), 1)
    idx_mask = (1 << idx_bits) - 1

    # int64 creation/promotion needs the scoped x64 flag during tracing
    # (global x64 would flip dtypes across every pipeline; this block is
    # the only 64-bit region in the package)
    with jax.enable_x64(True):
        if sort_by_score:
            comp = (
                (score.astype(jnp.int64) << idx_bits)
                | (idx_mask - index).astype(jnp.int64)
            )
            k64 = ((-comp) << 16) | (meta & 0xFFFF).astype(jnp.int64)
        else:
            k64 = (index.astype(jnp.int64) << 32) | (
                meta.astype(jnp.int64) & 0xFFFFFFFF
            )
        k64 = jnp.where(matched, k64, INT64_MAX)

        def decode(k):
            if sort_by_score:
                comp2 = -jax.lax.shift_right_arithmetic(k, 16)
                score2 = jax.lax.shift_right_logical(
                    comp2, jnp.int64(idx_bits)
                )
                i2 = (idx_mask - (comp2 & idx_mask)).astype(jnp.int32)
                m2 = (
                    (score2.astype(jnp.int32) << 16)
                    | (k & 0xFFFF).astype(jnp.int32)
                )
            else:
                i2 = jax.lax.shift_right_arithmetic(
                    k, jnp.int64(32)
                ).astype(jnp.int32)
                m2 = (k & 0xFFFFFFFF).astype(jnp.int32)
            return jnp.stack([i2, m2], axis=1)

        # ONE full single-operand sort. A stable-partition + capacity-
        # boxed sort was tried here and REMOVED: the partition's
        # 1M-element scatter scalarizes on TPU (~75 ms/query inside the
        # batch scan) while the full int64 single-op sort costs ~2.7 ms
        # at 1M rows — the "cheap" O(B) partition was 25x the sort it
        # saved (sentinel rows sort last either way).
        rows = decode(jax.lax.sort(k64, is_stable=False))
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
        "score_bound", "fetch_rows", "bucket_statics", "finalize_cap",
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
    buckets_T=None,  # per bucket (cpT, nuT, idxT) colstream blocks, or None
    finalize_cap=None,  # STATIC capped-sort group budget (host-chosen)
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

    single = (
        use_kernel
        and sort_by_score
        and len(pattern_statics) == 1
        and not pattern_statics[0][2]  # not negated
    )
    mode0 = pattern_statics[0][4] if pattern_statics else None
    nlen0 = stacked_patterns[0][0].shape[1] if stacked_patterns else 0

    fast = single and mode0 == FUZZY_MODE and score_bound is not None
    # literal serving rides the SAME flag-gated in-place flow when the
    # literal colstream kernel covers the needle (every use_kernel
    # bucket width <= CS_MAX_W, so all buckets take the kernel)
    fast_lit_cs = (
        single
        and mode0 in (EXACT, PREFIX, SUFFIX, SUBSTRING)
        and buckets_T is not None
        and colstream_literal_supported(nlen0)
    )
    if fast or fast_lit_cs:
        return _fused_match_batch_fast(
            buckets, stacked_patterns[0], n=n,
            statics=pattern_statics[0], unicode=unicode,
            score_bound=score_bound, fetch_rows=fetch_rows,
            bucket_statics=bucket_statics, buckets_T=buckets_T,
            finalize_cap=finalize_cap,
        )

    # multi-pattern (or single-negated) serving through the skip-gated
    # colstream kernels: stage-1-narrowed, columns-mode combine
    if (
        use_kernel
        and sort_by_score
        and len(pattern_statics) >= 1
        and buckets_T is not None
        and colstream_eligible_all(
            pattern_statics,
            tuple(p[0].shape[1] for p in stacked_patterns),
        )
    ):
        return _fused_multi_batch_fast(
            buckets, stacked_patterns, n=n,
            pattern_statics=pattern_statics, unicode=unicode,
            fetch_rows=fetch_rows, buckets_T=buckets_T,
            finalize_cap=finalize_cap,
        )

    fast_lit = (
        single and mode0 in (EXACT, PREFIX, SUFFIX, SUBSTRING)
    )
    if fast_lit:
        return _fused_literal_batch_fast(
            buckets, stacked_patterns[0], n=n,
            statics=pattern_statics[0], unicode=unicode,
            fetch_rows=fetch_rows, bucket_statics=bucket_statics,
        )

    def body(carry, patterns):
        out = _fused_match_body(
            buckets, patterns, xl_mask, n, pattern_statics, sort_by_score,
            use_kernel, unicode, score_bound,
        )
        return carry, out[: 1 + fetch_rows]

    _, outs = jax.lax.scan(body, jnp.int32(0), stacked_patterns)
    return outs


def _keys_from_cols(matched, score, exact, end_col, greedy, idx,
                    idx_bits):
    """Pack kernel result columns into SINGLE int64 sort keys:
    [(0xFFFF - score) | index | meta_low16] — the same layout the
    colstream kernel's key-emit mode writes as int32 halves.

    A single-operand sort is ~2x XLA:TPU's two-operand (key, payload)
    sort (benchmarks/probe_sort64.py: int64 1-op == int32 1-op ==
    ~0.5x the 2-op cost at serving shapes), and inv-score(16b) +
    index(<=31b) + the non-score meta bits (16b) always fit 63 bits —
    one layout for every corpus size. Ascending int64 order realizes
    (matched first, score desc, index asc); unmatched rows carry
    INT64_MAX."""
    matched = matched & (idx >= 0)
    meta = _pack_meta(
        jnp.where(matched, score, 0),
        matched & exact,
        matched & greedy,
        jnp.where(matched, end_col, 0),
    )
    cnt = jnp.sum(matched).astype(jnp.int32)
    with jax.enable_x64(True):  # scoped: the only 64-bit region
        k64 = (
            ((0xFFFF - score).astype(jnp.int64) << (idx_bits + 16))
            | (idx.astype(jnp.int64) << 16)
            | (meta & 0xFFFF).astype(jnp.int64)
        )
        k64 = jnp.where(matched, k64, INT64_MAX)
    return k64, cnt


def _decode_keys(k64, idx_bits, idx_mask):
    """[index, meta] from sorted int64 keys (sentinel rows are past
    the count header, never read by the host)."""
    with jax.enable_x64(True):
        inv = jax.lax.shift_right_logical(
            k64, jnp.int64(idx_bits + 16)
        )
        score = (0xFFFF - inv.astype(jnp.int32)) & 0xFFFF
        index = (
            jax.lax.shift_right_logical(k64, jnp.int64(16))
            & idx_mask
        ).astype(jnp.int32)
        meta = (score << 16) | (k64 & 0xFFFF).astype(jnp.int32)
    return index, meta


# Broad-needle result selection: block-min tournament constants. R is
# the slots-per-block (the Pallas gather moves R*2 int32 = 8R bytes per
# block DMA; 128 -> 1 KB); G the DMAs per grid step. Values chosen on
# the real device (benchmarks/probe_broad_topk.py).
BROAD_TOPK_R = 128
BROAD_TOPK_G = 8


def _broad_topk_ok(total, fetch_rows):
    """Gate for the tournament: needs total % R == 0 (group-padded
    colstream totals are multiples of 1024; unpadded row-major totals
    simply fall back), at least fetch_rows blocks, and a gathered
    candidate set no more than half the full width (else the full sort
    is as cheap)."""
    R = BROAD_TOPK_R
    return (
        total % R == 0
        and fetch_rows <= total // R
        and 2 * fetch_rows * R <= total
    )


def _broad_topk(hi, lo, *, fetch_rows, interpret):
    """EXACT top-``fetch_rows`` smallest int64 keys per query from
    (Q, total) int32 key halves, without the full-width sort: a
    block-min tournament.

    Correctness: block minima over R-slot blocks are themselves row
    keys, and valid keys are UNIQUE (they embed the row index), so for
    S = fetch_rows the S-th smallest block-min bm_S >= the S-th
    smallest row key r_S (minima are a subset of the keys). Any true
    top-S row r has key(r) <= r_S <= bm_S, so its block's minimum is
    <= bm_S and that block sits among the S smallest block minima —
    gathering those S blocks provably captures every top-S row.
    Sentinel blocks (all INT64_MAX) tie, but carry no valid rows, so
    an arbitrary tie-break among them is harmless. The gather rides
    the same Pallas row-DMA kernel as the capped finalize (XLA's own
    batched block gather faults the TPU worker — round-4 repro),
    moving int64 keys as bitcast int32 pairs so one DMA carries both
    halves of a block.

    This replaces the full (Q, total) sort for broad needles (common-
    particle unicode queries keep ~85-95% of groups stage-1-alive and
    so never fit the capped path). Measured serving cost is NEUTRAL vs
    that sort at the 1M arabic profile (bit-equal, blocking floors
    identical — benchmarks/probe_broad_ab.{py,out}; the sort turned
    out NOT to be the broad bottleneck, see STATUS.md known-gaps); it
    stays on because it shrinks the finalize's sort working set from
    (Q, total) to (Q, fetch*R), which matters as corpora scale past
    1M rows."""
    from .colstream import row_gather

    Q, total = hi.shape
    R = BROAD_TOPK_R
    NB = total // R
    S = min(fetch_rows, NB)
    with jax.enable_x64(True):
        k64 = (
            (hi.astype(jnp.int64) << 32)
            | (lo.astype(jnp.int64) & 0xFFFFFFFF)
        )
        bm = jnp.min(k64.reshape(Q, NB, R), axis=2)
        pos = jax.lax.broadcasted_iota(jnp.int32, (Q, NB), 1)
        _, spos = jax.lax.sort(
            (bm, pos), dimension=1, num_keys=1, is_stable=False
        )
        # int64 -> int32 pairs: one DMA moves both halves of a block
        pairs = jax.lax.bitcast_convert_type(k64, jnp.int32)
    sel = spos[:, :S].astype(jnp.int32)
    flat = pairs.reshape(Q * NB, R * 2)
    qbase = jax.lax.broadcasted_iota(jnp.int32, (Q, S), 0) * NB
    g = row_gather(
        flat, (qbase + sel).reshape(-1), G=BROAD_TOPK_G,
        interpret=interpret,
    )
    with jax.enable_x64(True):
        gk = jax.lax.bitcast_convert_type(
            g.reshape(Q, S * R, 2), jnp.int64
        )
        ks = jax.lax.sort(gk, dimension=1, is_stable=False)
        return ks[:, :fetch_rows]


def _finalize(keys, counts, *, presorted, flags_cat, Q, fetch_rows,
              finalize_cap, idx_bits, idx_mask):
    # (finalize_cap is a static of the enclosing jit)
    # P3: ONE single-operand batched sort (skipped when the scan body
    # already sorted per query), then decode [index, meta] rows.
    # Keys embed the unique row index, so the order is total and the
    # sort need not be stable.
    #
    # With per-group stage-1 flags (in-place colstream flow), dead
    # groups hold only INT64_MAX sentinels — so the sort first
    # gathers the ALIVE groups' keys to the front (a cheap batched
    # block gather: ~1.5k groups of 8 KB rows) and sorts only a
    # 1/4- or 1/2-capacity prefix when every query's alive groups
    # fit. The (Q, total) full sort is the fallback; at chromium
    # scale it alone costs ~2.5 ms/query.
    from .colstream import SUBL

    gr = SUBL * 128
    if flags_cat is not None:
        # a fetch window approaching half the corpus leaves nothing
        # for the capped tiers to cut — take the plain full sort
        if -(-fetch_rows // gr) + 1 >= -(-flags_cat.shape[1] // 2):
            flags_cat = None
    if presorted:
        kc = keys
    elif flags_cat is not None and finalize_cap:
        # hi/lo int32 halves arrive SEPARATELY (keys is a (hi, lo)
        # tuple): the combined (Q, total) int64 array plus its
        # int32 bitcast copy cost ~540 MB at 1M x Q=32 and tipped
        # the program plan over HBM — halves gather directly and
        # only the capped selection ever materializes as int64.
        # STATIC capacity, chosen by the dispatcher from HOST-side
        # per-group alive counts (ops/presence.needle_need_matrix_np
        # over corpus.host_blk_bits) — an in-program lax.cond around
        # this gather+sort FAULTS the TPU backend (minimal repro:
        # the cond-chained capped sort crashes the worker while the
        # identical branch body runs clean called directly). The
        # dispatcher guarantees every query's alive groups fit
        # finalize_cap, so dropping the tail is exact.
        from .colstream import block_gather

        # finalize_cap: (cap_blocks, n_sel) — queries [0:n_sel] of the
        # (dispatcher-reordered) batch are SELECTIVE: every alive group
        # fits cap_blocks, so the capped gather+sort is exact for them.
        # Queries [n_sel:] are BROAD (e.g. common-particle unicode
        # needles keeping ~94% of groups alive) and take the full
        # per-row sort in the same batch — the per-query mixed
        # finalize. A bare int means every query is selective.
        cap_blocks, n_sel = (
            finalize_cap if isinstance(finalize_cap, tuple)
            else (finalize_cap, Q)
        )
        n_sel = min(n_sel, Q)
        nGtot = flags_cat.shape[1]
        cap_blocks = min(cap_blocks, nGtot)
        hi, lo = keys
        interp = jax.default_backend() != "tpu"
        parts = []
        if n_sel > 0:
            # Pallas block gather on the int32 bit-halves: XLA's batched
            # block take_along_axis FAULTS the TPU worker at some
            # serving shapes (round-4 minimal repro), so the alive-first
            # groups DMA through our own copy kernel. Built OUTSIDE the
            # x64 scope: an index map traced under enable_x64 emits i64
            # block indices Mosaic won't legalize.
            order = jnp.argsort(
                1 - flags_cat[:n_sel], axis=1, stable=True
            )[:, :cap_blocks]
            qbase = jax.lax.broadcasted_iota(
                jnp.int32, (n_sel, cap_blocks), 0
            ) * nGtot
            rows = (qbase + order).reshape(-1)
            g_hi = block_gather(
                hi[:n_sel].reshape(n_sel * nGtot, gr), rows,
                interpret=interp,
            ).reshape(n_sel, cap_blocks * gr)
            g_lo = block_gather(
                lo[:n_sel].reshape(n_sel * nGtot, gr), rows,
                interpret=interp,
            ).reshape(n_sel, cap_blocks * gr)
            with jax.enable_x64(True):
                sel = (
                    (g_hi.astype(jnp.int64) << 32)
                    | (g_lo.astype(jnp.int64) & 0xFFFFFFFF)
                )
                kc_s = jax.lax.sort(
                    sel, dimension=1, is_stable=False
                )[:, :fetch_rows]
                if cap_blocks * gr < fetch_rows:
                    kc_s = jnp.pad(
                        kc_s,
                        ((0, 0), (0, fetch_rows - cap_blocks * gr)),
                        constant_values=INT64_MAX,
                    )
            parts.append(kc_s)
        if n_sel < Q:
            if _broad_topk_ok(hi.shape[1], fetch_rows):
                # broad queries: exact block-min tournament instead of
                # the full (Q_b, total) sort
                kc_b = _broad_topk(
                    hi[n_sel:], lo[n_sel:], fetch_rows=fetch_rows,
                    interpret=interp,
                )
            else:
                with jax.enable_x64(True):
                    kb = (
                        (hi[n_sel:].astype(jnp.int64) << 32)
                        | (lo[n_sel:].astype(jnp.int64) & 0xFFFFFFFF)
                    )
                    kc_b = jax.lax.sort(
                        kb, dimension=1, is_stable=False
                    )[:, :fetch_rows]
                    if kc_b.shape[1] < fetch_rows:
                        kc_b = jnp.pad(
                            kc_b,
                            ((0, 0), (0, fetch_rows - kc_b.shape[1])),
                            constant_values=INT64_MAX,
                        )
            parts.append(kc_b)
        kc = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    elif (
        isinstance(keys, tuple)
        and _broad_topk_ok(keys[0].shape[1], fetch_rows)
    ):
        # the in-place flow with no capped tier (every query broad, or
        # the corpus below the mixed-finalize group gate): exact
        # block-min tournament instead of the full (Q, total) sort
        kc = _broad_topk(
            keys[0], keys[1], fetch_rows=fetch_rows,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        if isinstance(keys, tuple):
            hi, lo = keys
            with jax.enable_x64(True):
                keys = (
                    (hi.astype(jnp.int64) << 32)
                    | (lo.astype(jnp.int64) & 0xFFFFFFFF)
                )
        kc = jax.lax.sort(keys, dimension=1, is_stable=False)
    kc = kc[:, :fetch_rows]
    index, metas = _decode_keys(kc, idx_bits, idx_mask)
    rows = jnp.stack([index, metas], axis=2)
    if rows.shape[1] < fetch_rows:
        rows = jnp.pad(
            rows, ((0, 0), (0, fetch_rows - rows.shape[1]), (0, 0))
        )
    header = jnp.concatenate(
        [counts[:, None, None],
         jnp.zeros((Q, 1, 1), jnp.int32)], axis=2,
    )
    return jnp.concatenate([header, rows], axis=1)


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
    buckets_T=None,  # per bucket (cpT, nuT, idxT) colstream blocks, or None
    finalize_cap=None,  # STATIC capped-sort group budget (host-chosen)
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
    typos, no_prefilter, _neg, scoring, mode, nbl = statics
    orig_q, flip_q, _sc_q = pattern
    Q, nlen = orig_q.shape
    is_literal = mode != FUZZY_MODE
    # clamp the typo budget to the needle length (a budget >= needle
    # length auto-passes either way; an unclamped budget would unroll
    # that many DP states in the kernel). Literal matching ignores the
    # typo budget entirely (reference: src/literal/mod.rs:1-8), so its
    # stage-1 presence reject runs at T=0 — sound a fortiori for
    # contiguous runs — regardless of the config's max_typos.
    T = 0 if is_literal else min(int(typos), nlen)
    use_stage1 = (
        nlen > 0 if is_literal else (not no_prefilter and nlen > T)
    )
    if bucket_statics is None:
        bucket_statics = ((-1, 0),) * len(buckets)

    idx_bits = max((n - 1).bit_length(), 1)
    idx_mask = (1 << idx_bits) - 1
    needles_q = jnp.concatenate([orig_q, flip_q], axis=1).astype(jnp.int32)

    if not buckets:
        # bucket-less corpus (empty, or every row XL): no device rows;
        # the host path fills XL matches in downstream
        return jnp.zeros((Q, 1 + fetch_rows, 2), jnp.int32)

    # literal mode has no row-major kernel fallback: the router only
    # sends it here with colstream blocks for a supported needle
    assert not is_literal or (buckets_T is not None and nlen > 0), (
        "literal fast path requires colstream blocks"
    )

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

    def keys_from_cols(matched, score, exact, end_col, greedy, idx):
        return _keys_from_cols(
            matched, score, exact, end_col, greedy, idx, idx_bits
        )

    def keys_from(out8, idx):
        return keys_from_cols(
            out8[:, 0] > 0, out8[:, 1], out8[:, 2] > 0, out8[:, 3],
            out8[:, 4] > 0, idx,
        )

    def sort_in_body(total):
        """True when the batched finalize sort's operands would exceed
        the HBM budget (int64 keys count as two words) — the single
        predicate both body_reduce and the finalize callers consult
        (they must agree: finalize skips the sort exactly when the body
        already did it)."""
        return Q * total * 2 > SORT_BODY_BUDGET

    def body_reduce(keys, counts, total):
        """Per-scan-iteration reduction: concat bucket pieces, and sort+
        slice in-body when the batched finalize sort would blow HBM."""
        kc = jnp.concatenate(keys)
        cnt = jnp.sum(jnp.stack(counts), dtype=jnp.int32)
        if sort_in_body(total):
            kc = jax.lax.sort(kc, is_stable=False)[:fetch_rows]
        return kc, cnt

    def finalize(keys, counts, presorted, flags_cat=None):
        return _finalize(
            keys, counts, presorted=presorted, flags_cat=flags_cat,
            Q=Q, fetch_rows=fetch_rows, finalize_cap=finalize_cap,
            idx_bits=idx_bits, idx_mask=idx_mask,
        )

    # Column-stream dispatch: the transposed kernel runs ~5-10x the
    # row-major kernel per row (benchmarks/probe_colstream_tpu.py) when
    # the needle/typo budget fits its register budget. In-place flows
    # stream the corpus-resident transposed blocks (buckets_T); the
    # compacted flow transposes its survivor gather on device (one
    # relayout, ~2x the gather bytes of HBM traffic, repaid ~4x over by
    # the kernel).
    use_colstream = (
        buckets_T is not None
        and (
            colstream_literal_supported(nlen)
            if is_literal
            else colstream_supported(nlen, T, no_prefilter)
        )
    )
    cs_interpret = jax.default_backend() != "tpu"

    def run_colstream(cpT_k, nuT_k, needle_q, count, W, flags=None,
                      idx_blocks=None, ctxT=None):
        return match_units_colstream(
            cpT_k, nuT_k, pack_needle_scalars(needle_q, count), flags,
            idx_blocks, ctxT,
            W=W, n=nlen, max_typos=T, scoring=scoring, unicode=unicode,
            no_prefilter=no_prefilter, interpret=cs_interpret,
            idx_bits=idx_bits if idx_blocks is not None else 0,
            mode=mode, needle_byte_len=nbl,
        )

    def to_colstream_blocks(cp_k, nu_k):
        """Device-side (cap, W) -> colstream blocks (one transpose)."""
        from .colstream import SUBL

        gr = SUBL * 128
        cap, W = cp_k.shape
        pad = (-cap) % gr
        if pad:
            cp_k = jnp.pad(cp_k, ((0, pad), (0, 0)))
            nu_k = jnp.pad(nu_k, (0, pad))
        ng = cp_k.shape[0] // gr
        cpT = (
            cp_k.astype(jnp.int32)
            .reshape(ng, SUBL, 128, W)
            .transpose(0, 3, 1, 2)
            .reshape(ng * W, SUBL, 128)
        )
        return cpT, nu_k.reshape(ng * SUBL, 128)

    # Colstream in-place serves buckets up to this width; wider buckets
    # take the row-major kernel inside the same in-place body. (A w256
    # bucket was wrongly convicted of the round-4 worker faults — the
    # real culprit was XLA's block take_along_axis in the capped result
    # sort, replaced by the Pallas block_gather; with that fixed, wide-
    # bucket colstream is clean and capping at 128 cost the _128-median
    # datasets ~35x, since HALF their rows land in w256.)
    CS_MAX_W = 1024

    def cs_bucket(bi):
        return use_colstream and buckets[bi][0].shape[1] <= CS_MAX_W

    def group_flags():
        """Per-group stage-1 alive flags (Q, nG) per bucket: one tiny
        MXU matmul over the corpus-resident block-OR presence planes
        (corpus.device_arrays_colstream). Content-clustered ordering
        makes most groups dead for most queries, and the kernel skips
        dead groups outright — the in-place flow's cost then scales
        with the stage-1-alive fraction WITHOUT any survivor sort or
        row gather. Non-colstream buckets get all-ones flags (their
        keys ride in BUCKET order, not clustered order, so the group
        planes don't apply)."""
        if not (use_colstream and use_stage1):
            return None
        flags_T = []
        for bi in range(len(buckets)):
            blk_bits = buckets_T[bi][3]
            if cs_bucket(bi):
                hits = jax.lax.dot_general(
                    blk_bits, need, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # (nG, Q)
                flags_T.append(
                    (hits >= thresh[None, :]).T.astype(jnp.int32)
                )
            else:
                flags_T.append(
                    jnp.ones((Q, blk_bits.shape[0]), jnp.int32)
                )
        return flags_T

    def in_place_flow(survivors, flags_T=None):
        total = sum(b[0].shape[0] for b in buckets)

        def body(carry, xs):
            needle_q = xs[0]
            his, los, counts = [], [], []
            for bi, b in enumerate(buckets):
                cp, nu, idx, _m4, _bits8 = b
                B, W = cp.shape
                if cs_bucket(bi):
                    # corpus colstream blocks are content-clustered;
                    # idxT maps colstream slot -> corpus index. The
                    # kernel emits the packed sort key directly as
                    # int32 halves (key-emit mode) — combining them is
                    # the ONLY per-row host-graph work, vs ~10 int64
                    # ops per row for packing result columns (which
                    # cost more than the DP on skip-heavy workloads).
                    # Keys keep the GROUP-PADDED length so the capped
                    # finalize can select whole groups (padding slots
                    # carry idx -1 -> sentinel keys).
                    bt = buckets_T[bi]
                    cpT, nuT, idxT = bt[0], bt[1], bt[2]
                    ctxT = bt[4] if len(bt) > 4 else None
                    fl = xs[1 + bi] if flags_T is not None else None
                    hi, lo, mcol = run_colstream(
                        cpT, nuT, needle_q, B, W, flags=fl,
                        idx_blocks=idxT.reshape(-1, 128), ctxT=ctxT,
                    )
                    cnt = jnp.sum(mcol).astype(jnp.int32)
                else:
                    out8 = run_kernel(cp, nu, needle_q, B, W)
                    key, cnt = keys_from(out8, idx)
                    with jax.enable_x64(True):
                        hi = jax.lax.shift_right_logical(
                            key, jnp.int64(32)
                        ).astype(jnp.int32)
                        lo = (key & 0xFFFFFFFF).astype(jnp.int32)
                    if use_colstream:
                        # group-pad so the capped finalize's block
                        # reshape stays aligned across buckets
                        from .colstream import SUBL

                        gr = SUBL * 128
                        pad = (-B) % gr
                        if pad:
                            hi = jnp.concatenate([
                                hi,
                                jnp.full((pad,), 0x7FFFFFFF, jnp.int32),
                            ])
                            lo = jnp.concatenate([
                                lo, jnp.full((pad,), -1, jnp.int32),
                            ])
                his.append(hi)
                los.append(lo)
                counts.append(cnt)
            # keys ride the scan as int32 HALVES: combining to int64 in
            # the stacked (Q, total) form doubled the finalize's working
            # set and tipped the Q=32 1M-row program plan over HBM
            hi_cat = jnp.concatenate(his)
            lo_cat = jnp.concatenate(los)
            cnt = jnp.sum(jnp.stack(counts), dtype=jnp.int32)
            if sort_in_body(total):
                with jax.enable_x64(True):
                    kc = (
                        (hi_cat.astype(jnp.int64) << 32)
                        | (lo_cat.astype(jnp.int64) & 0xFFFFFFFF)
                    )
                    kc = jax.lax.sort(kc, is_stable=False)[:fetch_rows]
                return carry, (kc, cnt)
            return carry, (hi_cat, lo_cat, cnt)

        if use_colstream:
            total = sum(bt[2].shape[0] for bt in buckets_T)
        xs = (needles_q,) + (tuple(flags_T) if flags_T else ())
        if sort_in_body(total):
            _, (keys, counts) = jax.lax.scan(body, jnp.int32(0), xs)
        else:
            _, (hi_s, lo_s, counts) = jax.lax.scan(
                body, jnp.int32(0), xs
            )
            keys = (hi_s, lo_s)
        return finalize(
            keys, counts, presorted=sort_in_body(total),
            flags_cat=(
                jnp.concatenate(flags_T, axis=1)
                if flags_T is not None and not sort_in_body(total)
                else None
            ),
        )

    def survivor_perms():
        # P1b: one batched packed-key sort per bucket -> survivor perms.
        # Called INSIDE each compacted tier branch so the in-place branch
        # never pays for sorts it would discard (the (Q, B) sorts cost
        # ~1.7 ms/query/bucket at 786k rows — 60 ms/batch of pure waste
        # on high-survivor corpora that fall through to in-place).
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
        return tuple(perms)

    def compacted_flow(div, survivors):
        perms = survivor_perms()

        # perms: per bucket (Q, B_b) packed keys; survivors: (Q, n_buckets)
        def body(carry, xs):
            needle_q, perm_bs, surv = xs
            keys, counts = [], []
            for bi, b in enumerate(buckets):
                cp, _nu, idx_arr, _m4, _bits8 = b
                B, W = cp.shape
                bbits = max((B - 1).bit_length(), 1)
                cap = _bucket_cap(B, W, div)
                pk = perm_bs[bi][:cap]
                row = pk & ((1 << bbits) - 1)
                nu_k = (
                    jax.lax.shift_right_logical(pk, jnp.int32(bbits))
                    & ((1 << W.bit_length()) - 1)
                )[:, None]
                cp_k = jnp.take(cp, row, axis=0)
                base, n_real = bucket_statics[bi]
                if base >= 0:
                    idx = jnp.where(row < n_real, row + base, -1)
                else:
                    idx = jnp.take(idx_arr, row)
                cnt = jnp.minimum(surv[bi], cap)
                if use_colstream:
                    cpT_k, nuT_k = to_colstream_blocks(cp_k, nu_k[:, 0])
                    m, s, e, ec, g = run_colstream(
                        cpT_k, nuT_k, needle_q, cnt, W
                    )
                    key, mcnt = keys_from_cols(
                        m[:cap] > 0, s[:cap], e[:cap] > 0, ec[:cap],
                        g[:cap] > 0, idx,
                    )
                else:
                    out8 = run_kernel(cp_k, nu_k, needle_q, cnt, W)
                    key, mcnt = keys_from(out8, idx)
                keys.append(key)
                counts.append(mcnt)
            return carry, body_reduce(keys, counts, total)

        total = sum(
            _bucket_cap(b[0].shape[0], b[0].shape[1], div)
            for b in buckets
        )
        _, (keys, counts) = jax.lax.scan(
            body, jnp.int32(0), (needles_q, perms, survivors)
        )
        return finalize(keys, counts, presorted=sort_in_body(total))

    if not use_stage1:
        return in_place_flow(None)

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
        # Tiered capacity switch: the row gather costs ~21 ns/row whether
        # or not a row survived, so low-survivor batches (stricter
        # needles, sparse-match corpora) take a 4x smaller gather tier; a
        # full miss falls back to the in-place flow (no compaction). The
        # P1b survivor sorts live inside each compacted branch
        # (survivor_perms), so only the taken tier pays for them.
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
            return lambda s: jax.lax.cond(
                fits(div), functools.partial(compacted_flow, div), nxt, s,
            )

        # 1/16 -> 1/8 -> 1/4 -> in-place: high-survivor workloads (large
        # typo budgets, short common needles) still compact at 1/4 — a
        # full-corpus kernel pass costs ~4x the B/4 tier
        flags_T = group_flags()
        chain = lambda s: in_place_flow(s, flags_T)  # noqa: E731
        for div in (4, 8, 16):
            chain = tier(div, chain)

        if flags_T is None:
            return chain(survivors)

        # In-place is UNCONDITIONAL when the column-stream kernel serves
        # the needle: the compacted tiers' per-query row gather alone
        # costs ~21 ns/row (probe_xla) while the colstream kernel's full
        # pass costs ~4-8 ns/row and the group flags cut it further — a
        # gather-based tier can never come out ahead, and it ALSO pays
        # the (Q, B) survivor sorts (~1.7 ms/query/bucket at 786k rows)
        # and a per-query device transpose (traced at ~4x the whole
        # skip-gated kernel on the arabic profile). The tier chain
        # remains the route for row-major-kernel needles (long needles /
        # large typo budgets), where per-row costs are ~10x higher and
        # compaction pays.
        return in_place_flow(survivors, flags_T)

    return jax.lax.cond(
        jnp.sum(survivors) == 0, empty_flow, full_path, survivors
    )


def colstream_eligible_all(pattern_statics, needle_lens) -> bool:
    """True when EVERY pattern in a multi-pattern group fits the
    column-stream kernel (fuzzy needle/typo budget in range, or literal
    needle in range) — the gate for the multi-pattern fast path. Shared
    with the dispatcher (matcher.py) so routing and block building
    can't diverge."""
    for st, ln in zip(pattern_statics, needle_lens):
        typos, nopre, _neg, _sc, mode, _nbl = st
        if ln < 1:
            return False
        if mode == FUZZY_MODE:
            if not colstream_supported(ln, min(int(typos), ln), nopre):
                return False
        elif mode in (EXACT, PREFIX, SUFFIX, SUBSTRING):
            if not colstream_literal_supported(ln):
                return False
        else:  # pragma: no cover
            return False
    return True


def _pattern_s1_contributes(st, nlen) -> bool:
    """Whether a pattern's stage-1 presence flags narrow the combined
    group-alive set: non-negated, and its prefilter actually rejects
    (literal always can at T=0; fuzzy needs a budget below the needle
    length). MUST match the host cap chooser
    (matcher._colstream_finalize_cap) exactly — the static capacity is
    sound only if host and device compute the same alive sets."""
    typos, nopre, neg, _sc, mode, _nbl = st
    if neg:
        return False
    if mode != FUZZY_MODE:
        return nlen > 0
    T = min(int(typos), nlen)
    return (not nopre) and nlen > T


def _fused_multi_batch_fast(
    buckets,
    stacked_patterns,  # per pattern (orig (Q,n_p), flip (Q,n_p), sc)
    *,
    n: int,
    pattern_statics: Tuple,
    unicode: bool,
    fetch_rows: int,
    buckets_T,
    finalize_cap=None,
):
    """Q-batched MULTI-pattern serving over the column-stream kernels.

    The reference narrows survivors between patterns — the first
    pattern runs over all haystacks, later ones only over its gathered
    survivors (reference: src/matcher/multi.rs:84-152). On this backend
    a per-row survivor gather costs ~21 ns/row while the skip-gated
    colstream kernel's whole pass costs ~4-8 ns/row
    (benchmarks/probe_xla*.jsonl), so narrowing moves UP to stage-1:
    the per-group alive flags are the AND of every contributing
    (non-negated, prefiltering) pattern's presence flags — a group dead
    for ANY such pattern can hold no combined match — and every
    pattern's kernel runs in-place over the same skip-gated blocks in
    columns mode. Result columns combine per the multi-pattern model
    (non-negated scores sum saturating u16, exact ORs, end_col maxes,
    greedy ORs, negated patterns veto), pack into the shared int32 key
    halves, and take the same capped block-gather finalize as the
    single-pattern fast path.
    """
    Q = stacked_patterns[0][0].shape[0]
    idx_bits = max((n - 1).bit_length(), 1)
    idx_mask = (1 << idx_bits) - 1
    cs_interpret = jax.default_backend() != "tpu"

    if not buckets:
        return jnp.zeros((Q, 1 + fetch_rows, 2), jnp.int32)
    assert buckets_T is not None

    infos = []
    for (orig_q, flip_q, _sc), st in zip(stacked_patterns,
                                         pattern_statics):
        typos, nopre, neg, scoring, mode, nbl = st
        nlen = orig_q.shape[1]
        T = 0 if mode != FUZZY_MODE else min(int(typos), nlen)
        infos.append({
            "needles": jnp.concatenate(
                [orig_q, flip_q], axis=1
            ).astype(jnp.int32),
            "T": T, "mode": mode, "nbl": nbl, "scoring": scoring,
            "neg": neg, "nopre": nopre, "nlen": nlen,
            "s1": _pattern_s1_contributes(st, nlen),
        })

    # combined per-group stage-1 flags: AND over contributing patterns
    flags_T = None
    if any(i["s1"] for i in infos):
        needs = [
            (needle_need_matrix(i["needles"]), i["T"])
            for i in infos if i["s1"]
        ]
        flags_T = []
        for bi in range(len(buckets)):
            blk_bits = buckets_T[bi][3]
            f = jnp.ones((Q, blk_bits.shape[0]), jnp.int32)
            for (need, tot), t_p in needs:
                hits = jax.lax.dot_general(
                    blk_bits, need, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # (nG, Q)
                f = f & (hits >= (tot - t_p)[None, :]).T.astype(
                    jnp.int32
                )
            flags_T.append(f)

    total = sum(bt[2].shape[0] for bt in buckets_T)
    in_body = Q * total * 2 > SORT_BODY_BUDGET

    def body(carry, xs):
        needle_qs = xs[: len(infos)]
        fls = xs[len(infos):]
        his, los, counts = [], [], []
        for bi, b in enumerate(buckets):
            B, W = b[0].shape
            bt = buckets_T[bi]
            cpT, nuT, idxT = bt[0], bt[1], bt[2]
            ctxT = bt[4] if len(bt) > 4 else None
            idx_flat = idxT.reshape(-1)
            fl = fls[bi] if flags_T is not None else None
            cm = idx_flat >= 0
            cs = jnp.zeros_like(idx_flat)
            ce = jnp.zeros(idx_flat.shape, jnp.bool_)
            cec = jnp.zeros_like(idx_flat)
            cg = jnp.zeros(idx_flat.shape, jnp.bool_)
            for pi, info in enumerate(infos):
                m, s, e, ec, g = match_units_colstream(
                    cpT, nuT,
                    pack_needle_scalars(needle_qs[pi], B),
                    fl, None, ctxT,
                    W=W, n=info["nlen"], max_typos=info["T"],
                    scoring=info["scoring"], unicode=unicode,
                    no_prefilter=info["nopre"],
                    interpret=cs_interpret,
                    mode=(
                        "fuzzy" if info["mode"] == FUZZY_MODE
                        else info["mode"]
                    ),
                    needle_byte_len=info["nbl"],
                )
                mb = m > 0
                if info["neg"]:
                    cm = cm & ~mb
                else:
                    cm = cm & mb
                    cs = jnp.minimum(
                        cs + jnp.where(mb, s, 0), 0xFFFF
                    )
                    ce = ce | ((e > 0) & mb)
                    cec = jnp.maximum(cec, jnp.where(mb, ec, 0))
                    cg = cg | ((g > 0) & mb)
            key, cnt = _keys_from_cols(
                cm, cs, ce, cec, cg, idx_flat, idx_bits
            )
            with jax.enable_x64(True):
                his.append(
                    jax.lax.shift_right_logical(
                        key, jnp.int64(32)
                    ).astype(jnp.int32)
                )
                los.append((key & 0xFFFFFFFF).astype(jnp.int32))
            counts.append(cnt)
        hi_cat = jnp.concatenate(his)
        lo_cat = jnp.concatenate(los)
        cnt = jnp.sum(jnp.stack(counts), dtype=jnp.int32)
        if in_body:
            with jax.enable_x64(True):
                kc = (
                    (hi_cat.astype(jnp.int64) << 32)
                    | (lo_cat.astype(jnp.int64) & 0xFFFFFFFF)
                )
                kc = jax.lax.sort(kc, is_stable=False)[:fetch_rows]
            return carry, (kc, cnt)
        return carry, (hi_cat, lo_cat, cnt)

    xs = tuple(i["needles"] for i in infos) + (
        tuple(flags_T) if flags_T is not None else ()
    )
    if in_body:
        _, (keys, counts) = jax.lax.scan(body, jnp.int32(0), xs)
    else:
        _, (hi_s, lo_s, counts) = jax.lax.scan(body, jnp.int32(0), xs)
        keys = (hi_s, lo_s)
    return _finalize(
        keys, counts, presorted=in_body,
        flags_cat=(
            jnp.concatenate(flags_T, axis=1)
            if flags_T is not None and not in_body
            else None
        ),
        Q=Q, fetch_rows=fetch_rows, finalize_cap=finalize_cap,
        idx_bits=idx_bits, idx_mask=idx_mask,
    )


def _fused_literal_batch_fast(
    buckets,  # kernel 5-tuples: (cp, nu, idx, mask4, bits8)
    pattern,  # (orig (Q,n), flip (Q,n), sc (Q,9))
    *,
    n: int,
    statics,  # (typos, no_prefilter, negated, scoring, mode, nbl)
    unicode: bool,
    fetch_rows: int,
    bucket_statics=None,
):
    """Q-batched single-pattern LITERAL serving: the literal twin of
    _fused_match_batch_fast. The needle-value-independent context
    (validity, windowed bonus prefix sums, byte offsets —
    literal_context) is hoisted OUT of the query scan and shared by
    every query (XLA performs no loop-invariant motion of large ops out
    of while bodies: measured 232 ms/query with the generic per-query
    body vs a few ms here), and the result sort runs ONCE batched over
    (Q, total) int64 keys. Key packing/decoding matches the fuzzy fast
    path exactly so orders can never diverge."""
    _typos, _nopre, _neg, scoring, mode, nbl = statics
    orig_q, flip_q, _sc_q = pattern
    Q, nlen = orig_q.shape
    if bucket_statics is None:
        bucket_statics = ((-1, 0),) * len(buckets)
    idx_bits = max((n - 1).bit_length(), 1)
    idx_mask = (1 << idx_bits) - 1

    if not buckets or nlen == 0:
        return jnp.zeros((Q, 1 + fetch_rows, 2), jnp.int32)

    # hoisted per-bucket context (needle-length static per group)
    prep = []
    for bi, b in enumerate(buckets):
        cpu, nu2, idx_arr, _m4, _b8 = b
        B, W = cpu.shape
        nu = nu2[:, 0]
        base, n_real = bucket_statics[bi]
        if base >= 0:
            iota = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
            idx_use = jnp.where(iota < n_real, iota + base, -1)
        else:
            idx_use = idx_arr
        if nlen > W:
            prep.append((None, B, idx_use))
            continue
        if unicode:
            cols = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
            vmask = cols < nu2
            cp = jnp.where(vmask, cpu, 0)
            blen = (
                1
                + (cp >= 0x80).astype(jnp.int32)
                + (cp >= 0x800).astype(jnp.int32)
                + (cp >= 0x10000).astype(jnp.int32)
            )
            blen = jnp.where(vmask, blen, 0)
            first = jnp.where(
                cp < 0x80,
                cp,
                jnp.where(
                    cp < 0x800,
                    0xC0 | (cp >> 6),
                    jnp.where(
                        cp < 0x10000,
                        0xE0 | (cp >> 12), 0xF0 | (cp >> 18),
                    ),
                ),
            )
            first = jnp.where(vmask, first, 0)
            last = jnp.where(cp < 0x80, cp, 0x80 | (cp & 0x3F))
            prev = jnp.concatenate(
                [jnp.full((B, 1), -1, jnp.int32), last[:, :-1]], axis=1
            )
            prev = jnp.where(vmask, prev, -1)
            from .literal import _prefix_sum

            csum = _prefix_sum(blen)
            boff = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.int32), csum[:, :-1]], axis=1
            )
            boff = jnp.where(vmask, boff, 0)
            n_bytes = csum[:, -1]
        else:
            cp = cpu.astype(jnp.int32) & 0xFF
            first = cp
            prev = jnp.concatenate(
                [jnp.full((B, 1), -1, jnp.int32), cp[:, :-1]], axis=1
            )
            boff = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
            n_bytes = nu
        ctx = literal_context(
            first, prev, boff, nu, n=nlen, W=W, scoring=scoring,
        )
        prep.append(((ctx, cp, nu, n_bytes, boff), B, idx_use))

    total = sum(p[1] for p in prep)

    def keys_from(matched, score, exact, end_col, idx):
        matched = matched & (idx >= 0)
        meta = _pack_meta(
            jnp.where(matched, score, 0),
            matched & exact,
            jnp.zeros_like(matched),
            jnp.where(matched, end_col, 0),
        )
        cnt = jnp.sum(matched).astype(jnp.int32)
        with jax.enable_x64(True):
            k64 = (
                ((0xFFFF - score).astype(jnp.int64) << (idx_bits + 16))
                | (idx.astype(jnp.int64) << 16)
                | (meta & 0xFFFF).astype(jnp.int64)
            )
            k64 = jnp.where(matched, k64, INT64_MAX)
        return k64, cnt

    sort_in_body = Q * total * 2 > SORT_BODY_BUDGET

    def body(carry, xs):
        o_q, f_q = xs
        keys, counts = [], []
        for p in prep:
            args, B, idx_use = p
            if args is None:  # needle longer than the bucket width
                with jax.enable_x64(True):
                    keys.append(jnp.full((B,), INT64_MAX, jnp.int64))
                counts.append(jnp.int32(0))
                continue
            ctx, cp, nu, n_bytes, boff = args
            m, s, e, ec = literal_match_ctx(
                ctx, cp, nu, n_bytes, boff, o_q, f_q,
                mode=mode, needle_byte_len=nbl, scoring=scoring,
            )
            key, cnt = keys_from(m, s, e, ec, idx_use)
            keys.append(key)
            counts.append(cnt)
        kc = jnp.concatenate(keys)
        if sort_in_body:
            kc = jax.lax.sort(kc, is_stable=False)[:fetch_rows]
        return carry, (kc, jnp.sum(jnp.stack(counts), dtype=jnp.int32))

    _, (keys, counts) = jax.lax.scan(
        body, jnp.int32(0), (orig_q, flip_q)
    )

    with jax.enable_x64(True):
        if sort_in_body:
            kc = keys
        else:
            kc = jax.lax.sort(keys, dimension=1, is_stable=False)
        kc = kc[:, :fetch_rows]
        inv = jax.lax.shift_right_logical(kc, jnp.int64(idx_bits + 16))
        score = (0xFFFF - inv.astype(jnp.int32)) & 0xFFFF
        index = (
            jax.lax.shift_right_logical(kc, jnp.int64(16)) & idx_mask
        ).astype(jnp.int32)
        meta = (score << 16) | (kc & 0xFFFF).astype(jnp.int32)
    rows = jnp.stack([index, meta], axis=2)
    if rows.shape[1] < fetch_rows:
        rows = jnp.pad(
            rows, ((0, 0), (0, fetch_rows - rows.shape[1]), (0, 0))
        )
    header = jnp.concatenate(
        [counts[:, None, None], jnp.zeros((Q, 1, 1), jnp.int32)], axis=2,
    )
    return jnp.concatenate([header, rows], axis=1)


def _bucket_cap(B: int, W: int, div: int = 8) -> int:
    """Static survivor capacity for the compacted flow: 1/div of the
    bucket, rounded up to whole kernel blocks (in LOGICAL rows; narrow
    buckets pack G = 128//W rows per vector)."""
    g = 128 // W if W < 128 else 1
    tbo = block_rows(max(W, 128)) * g
    return min(B, -(-(B // div) // tbo) * tbo)
