"""Fused Pallas TPU kernel: prefilter + Smith-Waterman over packed units.

One kernel family covers both packings: ASCII (units are bytes, int8 input)
and Unicode (units are codepoints, int32 input) — the UTF-8 byte context
the scoring schedule needs (first byte, previous unit's last byte, byte
offsets, byte lengths) is derived from the codepoints inside VMEM, so HBM
traffic is one read of the unit matrix plus tiny result writes.

Round-2 architecture (one device pass instead of two):

1. **Stage-1 presence reject** (plain XLA, ops/presence.py): per-row
   128-bit char-presence masks are precomputed once per corpus; a query
   rejects rows missing more needle units than the typo budget in a few
   elementwise ops. This is the TPU-native form of the reference's cheap
   char-presence scan (reference: src/prefilter/algo/ascii.rs:6-54) with
   the scan cost moved to pack time.
2. **Compaction** (plain XLA): stable partition moves stage-1 survivors to
   the front; a capacity switch picks the smallest precompiled kernel size
   that covers the survivor count, so kernel cost scales with survivors.
3. **``match_units``** (this file): ONE fused Pallas kernel runs the exact
   positional prefilter (typo-budget minimal-position DP), the start-1
   window trim, and the full bonus-schedule affine-gap DP per tile.
   Fusing the two phases halves grid-step overhead and keeps the window
   values in VMEM (the reference runs them as two passes over a Vec,
   src/matcher/algo.rs:78-103; on TPU the phases share one streamed tile).

Kernel shape choices (v5e measurements, see benchmarks/probe_*.jsonl):

- Fat grid steps with an inner sub-tile loop: the backend has a fixed
  per-grid-step cost, so each step streams ``SUBTILES`` sub-tiles and
  loops over them in VMEM (``lax.fori_loop`` + ``pl.ds``), cutting step
  count 8x without the register pressure of a fat vectorized body.
- Dynamic needle length: the needle rides in SMEM via scalar prefetch,
  padded to ``MAX_KERNEL_NEEDLE``; the per-unit loops are ``fori_loop``s
  bounded by the runtime length, so ONE Mosaic program serves every
  needle length (the reference monomorphizes per SIMD backend instead).
- int16 score lanes for ASCII configs whose score bound fits (the analog
  of the reference's u8/u16 dual-precision backends,
  src/smith_waterman/mod.rs:92-116): 2x VPU lanes on the default scoring.
  Dispatch: ``score_fits_int16``. Unicode stays int32 (codepoint compares
  don't fit 16 bits and mixed-width masks relayout).

Lanes are haystack units, sublanes are haystacks (inter-sequence
parallelism — the layout the reference rejected for CPU SIMD, reference
README.md:179, and the natural fit for the 8x128 VPU). The left-to-right
gap recurrence is an exact max-plus prefix scan (cummax(c + q) - q with q
the exclusive cumsum of per-column gap costs) in log2(W) lane shifts;
semantics are identical to ops/fuzzy.py's jnp pipeline (the differential
-testing oracle for these kernels, itself pinned to the host oracle and
the reference's scoring tests).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MAX_HAYSTACK_LEN
from .presence import stage1_presence

# Longest needle the kernel accepts (SMEM pad size); longer needles take
# the jnp pipeline (they are vanishingly rare for interactive matching)
MAX_KERNEL_NEEDLE = 64

DEFAULT_SCORING = (12, 6, 5, 1, 12, 4, 4, 8, 4)

# Sub-tiles per grid step: amortizes the backend's fixed per-step cost.
# Env overrides exist so device sweeps (benchmarks/probe_kernel_sol.py)
# can explore tile shapes without code edits; the defaults are the
# measured v5e optimum and what the committed benchmarks used.
SUBTILES = int(os.environ.get("FRIZBEE_TPU_SUBTILES", "8"))

# Per-sub-tile VMEM budget in unit-lanes (rows*width); see _tile_rows
_TILE_BUDGET = int(os.environ.get("FRIZBEE_TPU_TILE_BUDGET", "32768"))

# int16 score lanes compile and pass parity in interpreter mode, but the
# current Mosaic TPU backend cannot lower them: measured failures are
# "Reductions over int16 not implemented", "Rotate with non-32-bit data",
# and "Target does not support this comparison" (vector<...xi16> slt).
# Flip this on when the toolchain gains 16-bit VPU lowering — dispatch
# (score_fits_int16) and the kernel are already wired for it.
INT16_MOSAIC_OK = False


def _tile_rows(width: int) -> int:
    """Sub-tile rows: bounds live VMEM working arrays to ~ a dozen
    (TBI, W) vectors (measured on v5e: fatter vectorized bodies regress
    on register/VMEM pressure — fatness comes from SUBTILES instead)."""
    return max(8, min(256, _TILE_BUDGET // width))


def block_rows(width: int) -> int:
    """Rows per grid step (the streamed block)."""
    return _tile_rows(width) * SUBTILES


def score_fits_int16(scoring: Tuple[int, ...], n: int, width: int) -> bool:
    """True when every DP intermediate provably fits int16 lanes.

    Max cell score: n * (match + matching_case + max(cap, delim)) +
    prefix + exact (context bonuses are mutually exclusive per char);
    the scan intermediate c+q adds at most W * (gap_extend + gap_open').
    The analog of the reference's u8-width dispatch predicate
    (src/smith_waterman/mod.rs:92-116 score_fits_in_u8)."""
    (match_score, _mismatch, gap_open, gap_ext, prefix_b, cap_b, case_b,
     exact_b, delim_b) = scoring
    per_char = match_score + case_b + max(cap_b, delim_b)
    bound = n * per_char + prefix_b + exact_b
    qmax = width * (gap_ext + max(gap_open - gap_ext, 0))
    return bound + qmax < 30000


def _shift_right(x, d, fill, col):
    """Shift lanes right by ``d`` (toward higher index), filling with
    ``fill``; ``col`` is the lane-index iota of x's shape/dtype — pass a
    segment-local iota (col % seg) for a segmented shift (each segment's
    first d lanes take ``fill``).

    int32 uses the native lane rotate; narrower dtypes use a circular
    slice+concat (Mosaic's rotate is 32-bit only). Both are circular +
    mask so the fill applies at segment boundaries, not just lane 0."""
    if x.dtype == jnp.int32:
        rolled = pltpu.roll(x, d, axis=1)
    else:
        rolled = jnp.concatenate(
            [x[:, x.shape[1] - d:], x[:, : x.shape[1] - d]], axis=1
        )
    return jnp.where(col < d, jnp.asarray(fill, x.dtype), rolled)


def _cumsum_lanes(x, col, width):
    """Exclusive-of-nothing (inclusive) prefix sum over lanes. ``col`` is
    the SEGMENT-LOCAL lane index and ``width`` the segment size: passing
    ``col % seg`` and ``seg`` yields a segmented scan (the shift fill
    masks at each segment boundary), the layout used when G = W/seg short
    rows share one vector (see _match_tile's ``seg``)."""
    d = 1
    while d < width:
        x = x + _shift_right(x, d, 0, col)
        d *= 2
    return x


def _cummax_lanes(x, col, width, neg_big):
    d = 1
    while d < width:
        x = jnp.maximum(x, _shift_right(x, d, neg_big, col))
        d *= 2
    return x


def _roll_lanes(x, d, width):
    """Circular lane rotate by ``d`` (toward higher index)."""
    d = d % width
    if d == 0:
        return x
    if x.dtype == jnp.int32:
        return pltpu.roll(x, d, axis=1)
    return jnp.concatenate([x[:, width - d:], x[:, :width - d]], axis=1)


def _seg_allreduce(x, colm, seg, width, op):
    """All-reduce within each ``seg``-lane segment, every lane receiving
    its segment's total (lane-broadcast). Doubling rotate network: at
    step d each lane holds the reduce of its trailing segment-circular
    window of d lanes; the segment-local rotate is two circular rotates
    selected at the boundary."""
    d = 1
    while d < seg:
        a = _roll_lanes(x, d, width)
        b = _roll_lanes(x, d - seg, width)
        x = op(x, jnp.where(colm < d, b, a))
        d *= 2
    return x


def _rmin(x):
    """Cross-lane min in int32 lanes (Mosaic has no int16 reductions),
    result cast back to x's dtype."""
    return jnp.min(
        x.astype(jnp.int32), axis=1, keepdims=True
    ).astype(x.dtype)


def _rmax(x):
    return jnp.max(
        x.astype(jnp.int32), axis=1, keepdims=True
    ).astype(x.dtype)


def _gather_lane(x, idx, col):
    """x[:, idx] per row via masked sum; idx (TB,1), zero when idx is out
    of lanes (matches the jnp pipeline's zero-padded byte_off gathers)."""
    return jnp.sum(
        jnp.where(col == idx, x, 0).astype(jnp.int32),
        axis=1, keepdims=True,
    ).astype(x.dtype)


def _unit_context(hay, valid, col, width, unicode, acc, allsum=None):
    """(first_byte, prev_last_byte, byte_off, byte_len, n_bytes) derived
    from unit values, in ``acc`` lanes. ASCII: unit == byte, context is
    trivial. ``hay`` is int32 here (byte values 0..255 or codepoints).
    ``col``/``width`` are segment-local (see _match_tile seg); ``allsum``
    replaces the cross-lane sum with a segmented one when packing."""
    if not unicode:
        first = hay.astype(acc)
        prev = _shift_right(first, 1, -1, col)
        prev = jnp.where(valid, prev, jnp.asarray(-1, acc))
        boff = jnp.where(valid, col, 0)
        blen = valid.astype(acc)
        if allsum is None:
            n_bytes = jnp.sum(blen.astype(jnp.int32), axis=1, keepdims=True)
        else:
            n_bytes = allsum(blen.astype(jnp.int32))
        return first, prev, boff, blen, n_bytes.astype(acc)
    blen = (
        1
        + (hay >= 0x80).astype(jnp.int32)
        + (hay >= 0x800).astype(jnp.int32)
        + (hay >= 0x10000).astype(jnp.int32)
    )
    blen = jnp.where(valid, blen, 0).astype(acc)
    first = jnp.where(
        hay < 0x80,
        hay,
        jnp.where(
            hay < 0x800,
            0xC0 | (hay >> 6),
            jnp.where(hay < 0x10000, 0xE0 | (hay >> 12), 0xF0 | (hay >> 18)),
        ),
    )
    first = jnp.where(valid, first, 0).astype(acc)
    last = jnp.where(hay < 0x80, hay, 0x80 | (hay & 0x3F)).astype(acc)
    prev = _shift_right(last, 1, -1, col)
    prev = jnp.where(valid, prev, jnp.asarray(-1, acc))
    boff = _shift_right(_cumsum_lanes(blen, col, width), 1, 0, col)
    boff = jnp.where(valid, boff, 0)
    if allsum is None:
        n_bytes = jnp.sum(blen.astype(jnp.int32), axis=1, keepdims=True)
    else:
        n_bytes = allsum(blen.astype(jnp.int32))
    return first, prev, boff, blen, n_bytes.astype(acc)


def _match_tile(scalars_ref, hay_in, nu, n, T, width, scoring, unicode,
                no_prefilter, acc, seg=None):
    """Fused prefilter + windowed SW for one (TBI, W) sub-tile.

    ``scalars_ref`` layout: [count, n, orig x MAXN, flip x MAXN] (SMEM).
    Returns int32 (TBI, 1) columns:
    (matched, score, exact, end_col, greedy). Semantics contract:
    ops/fuzzy.py fuzzy_pipeline (the jnp differential twin).

    ``seg``: sub-lane packing. When set (a power of two < width), each
    vector holds G = width//seg independent rows of <= seg units — the
    corpus packs a (B, seg) bucket and reshapes pairs/quads into full
    128-lane vectors, so short rows stop wasting lanes. All lane scans
    become segmented (shift fills mask at the boundary), cross-lane
    reductions become rotate-network all-reduces (lane-broadcast per
    segment), ``nu`` arrives as (TBI, G), and the returned columns are
    (TBI, G) per-segment values. seg=None is the classic single-row
    layout and traces byte-identically to the pre-seg kernel."""
    (match_score, mismatch, gap_open, gap_ext, prefix_b, cap_b, case_b,
     exact_b, delim_b) = scoring
    gop_extra = max(gap_open - gap_ext, 0)
    tb = hay_in.shape[0]
    G = 1 if seg is None else width // seg
    S = width if seg is None else seg
    BIG = S + 1
    NEG = -(20000 if acc == jnp.int16 else (1 << 30))

    hay = hay_in.astype(jnp.int32)
    if not unicode:
        hay = hay & 0xFF
    col32 = jax.lax.broadcasted_iota(jnp.int32, (tb, width), 1)
    if G == 1:
        col32m = col32
    else:
        col32m = col32 & (S - 1)
        seg_id = jax.lax.shift_right_logical(
            col32, jnp.int32(S.bit_length() - 1)
        )
    col = col32m.astype(acc)

    if G == 1:
        def allmin(x):
            return _rmin(x)

        def allmax(x):
            return _rmax(x)

        def gather(x, idx):
            return _gather_lane(x, idx, col)

        nu_l = nu  # (TBI, 1) int32
    else:
        def _seg_col_for(x):
            # boundary-mask compares must share the operand's lane width
            # (Mosaic can't relayout i1 masks between 16/32-bit layouts)
            return col32m if x.dtype == jnp.int32 else col

        def allmin(x):
            return _seg_allreduce(x, _seg_col_for(x), S, width, jnp.minimum)

        def allmax(x):
            return _seg_allreduce(x, _seg_col_for(x), S, width, jnp.maximum)

        def gather(x, idx):
            # one lane per segment satisfies col == idx; x >= 0 always
            # (byte offsets / lengths), so max-reduce extracts it
            return allmax(jnp.where(col == idx, x, 0))

        # lane-broadcast per-segment unit counts from the (TBI, G) column
        nu_l = jnp.zeros((tb, width), jnp.int32)
        for g in range(G):
            nu_l = jnp.where(seg_id == g, nu[:, g:g + 1], nu_l)
    # every mask in the acc domain comes from acc-typed compares: Mosaic
    # can't relayout i1 vectors between 16- and 32-bit mask layouts
    valid = col < jnp.minimum(nu_l, BIG).astype(acc)
    if G == 1:
        allsum32 = None
    else:
        def allsum32(x):
            return _seg_allreduce(x, col32m, S, width, jnp.add)

    fb, pb, boff, blen, n_bytes = _unit_context(
        hay, valid, col, S, unicode, acc, allsum=allsum32
    )
    if not unicode and acc == jnp.int16:
        hay_c = hay.astype(acc)  # byte compares in int16 lanes

        def needle_val(k, flip):
            return scalars_ref[2 + (MAX_KERNEL_NEEDLE if flip else 0) + k
                               ].astype(acc)
    else:
        hay_c = hay

        def needle_val(k, flip):
            return scalars_ref[2 + (MAX_KERNEL_NEEDLE if flip else 0) + k]

    def occ_of(k):
        return valid & (
            (hay_c == needle_val(k, False)) | (hay_c == needle_val(k, True))
        )

    zero1 = jnp.zeros((tb, 1) if G == 1 else (tb, width), acc)

    # ---- positional prefilter (minimal-position DP over the typo budget;
    # semantics contract: oracle/prefilter.py) -----------------------------
    if no_prefilter:
        matched = jnp.ones((tb, 1) if G == 1 else (tb, width), jnp.bool_)
        wstart_raw = zero1
        wend = n_bytes
    else:
        def pf_body(k, carry):
            f, fos, start0, tail = carry
            occ = occ_of(k)
            fo = allmin(jnp.where(occ, col, jnp.asarray(BIG, acc)))
            fos = jnp.where(k <= T, jnp.minimum(fos, fo), fos)
            nf = []
            for t in range(T + 1):
                nxt_occ = allmin(
                    jnp.where(occ & (col >= f[t]), col,
                              jnp.asarray(BIG, acc))
                )
                nxt = jnp.where(
                    f[t] <= S,
                    jnp.minimum(nxt_occ + 1, jnp.asarray(BIG, acc)),
                    jnp.asarray(BIG, acc),
                )
                if t > 0:
                    nxt = jnp.minimum(nxt, f[t - 1])
                nf.append(nxt)
            start0 = jnp.where(
                k == 0, jnp.minimum(nf[0] - 1, jnp.asarray(S, acc)),
                start0,
            )
            # masks carry as integer lanes: Mosaic's loop lowering can't
            # legalize i1 vector block arguments
            tail = jnp.where((k >= n - 1 - T) & occ, jnp.asarray(1, acc),
                             tail)
            return tuple(nf), fos, start0, tail

        f0 = tuple(zero1 for _ in range(T + 1))
        fos0 = jnp.full_like(zero1, BIG)
        tail0 = jnp.zeros((tb, width), acc)
        f, fos, start0, tail_i = jax.lax.fori_loop(
            0, n, pf_body, (f0, fos0, zero1, tail0)
        )
        tail = tail_i > 0
        matched = f[T] <= S
        if T == 0:
            last_pos = f[0] - 1
            e = allmax(
                jnp.where(tail & (col >= last_pos), col,
                          jnp.asarray(-1, acc))
            )
            start_u = jnp.clip(start0, 0, S - 1)
            wstart_raw = gather(boff, start_u)
        else:
            e = allmax(jnp.where(tail, col, jnp.asarray(-1, acc)))
            start_u = jnp.clip(fos, 0, S - 1)
            wstart_raw = jnp.where(fos <= S, gather(boff, start_u), 0)
        e_c = jnp.clip(e, 0, S - 1)
        wend = gather(boff, e_c) + gather(blen, e_c)
        wend = jnp.where(e >= 0, wend, n_bytes)
        wstart_raw = jnp.where(matched, wstart_raw, 0)
        wend = jnp.where(matched, wend, n_bytes)
        # a needle no longer than the typo budget matches everything
        # (reference: src/prefilter/algo/ascii_typos.rs:263-267)
        auto = n <= T
        matched = matched | auto
        wstart_raw = jnp.where(auto, 0, wstart_raw)
        wend = jnp.where(auto, n_bytes, wend)

    # ---- windowed affine-gap Smith-Waterman (full bonus schedule;
    # jnp twin: ops/fuzzy.py sw_score_bucket) ------------------------------
    # trim: start-1 keeps delimiter context (ref: src/matcher/algo.rs:332)
    wstart = jnp.maximum(wstart_raw - 1, 0)
    include_exact = (wstart == 0) & (wend == n_bytes)
    active = valid & (boff >= wstart) & (boff + blen <= wend)
    first_unit = allmin(jnp.where(active, col, jnp.asarray(BIG, acc)))
    is_first = active & (col == first_unit)
    include_prefix = wstart == 0

    is_upper = (fb >= 0x41) & (fb <= 0x5A)
    prev_lower = (pb >= 0x61) & (pb <= 0x7A)

    def delim(b):
        letter = ((b >= 0x41) & (b <= 0x5A)) | ((b >= 0x61) & (b <= 0x7A))
        digit = (b >= 0x30) & (b <= 0x39)
        return (b >= 0) & (b <= 127) & ~letter & ~digit

    cap_mask = is_upper & prev_lower & ~is_first
    delim_mask = delim(pb) & ~delim(fb) & ~is_first
    bonus = (
        jnp.where(cap_mask, jnp.asarray(cap_b, acc), 0)
        + jnp.where(delim_mask, jnp.asarray(delim_b, acc), 0)
        + jnp.where(is_first & include_prefix, jnp.asarray(prefix_b, acc), 0)
    )

    def sw_body(k, carry):
        prev_row, prev_mm, neq = carry
        o32 = scalars_ref[2 + k]
        match = active & (
            (hay_c == needle_val(k, False)) | (hay_c == needle_val(k, True))
        )
        exactc = active & (hay_c == needle_val(k, False))
        diag_base = _shift_right(prev_row, 1, 0, col)
        diag_m = (
            diag_base + jnp.asarray(match_score, acc) + bonus
            + jnp.where(exactc, jnp.asarray(case_b, acc), 0)
        )
        diag_u = jnp.maximum(diag_base - mismatch, 0)
        diag = jnp.where(match, diag_m, diag_u)
        up = jnp.maximum(
            prev_row - gap_ext
            - jnp.where(prev_mm > 0, jnp.asarray(gop_extra, acc), 0),
            0,
        )
        c = jnp.maximum(diag, up)
        p = gap_ext + jnp.where(match, jnp.asarray(gop_extra, acc), 0)
        q = _shift_right(_cumsum_lanes(p, col, S), 1, 0, col)
        prev_row = _cummax_lanes(c + q, col, S, NEG) - q
        # exact-equality accumulation: unit k of the haystack vs the needle
        # (case-sensitive; reference: src/matcher/algo.rs:245-248)
        if G == 1:
            hk = jnp.sum(jnp.where(col32 == k, hay, 0), axis=1,
                         keepdims=True)
            neq = neq | (hk != o32).astype(jnp.int32)
        else:
            # per-lane: each lane records whether ITS unit equals the
            # needle unit at its position (one visit per lane over the
            # k-loop); the cross-lane check happens once after the loop
            neq = jnp.where(
                col32m == k, (hay != o32).astype(jnp.int32), neq
            )
        return prev_row, match.astype(acc), neq

    prev_row, _mm, neq_i = jax.lax.fori_loop(
        0, n,
        sw_body,
        (
            jnp.zeros((tb, width), acc),
            jnp.zeros((tb, width), acc),
            jnp.zeros((tb, 1) if G == 1 else (tb, width), jnp.int32),
        ),
    )
    if G == 1:
        neq = neq_i > 0
    else:
        # a lane holding a needle position (col < n) that never matched
        neq = allmax(jnp.where(col32m < n, neq_i, 0)) > 0
    # Lanes past the window: mismatch-decayed values can exceed the true
    # in-window max (the jnp twin applies the same mask)
    prev_row = jnp.where(active, prev_row, 0)
    score = jnp.maximum(allmax(prev_row), 0)
    end_unit = allmin(
        jnp.where(prev_row == score, col, jnp.asarray(BIG, acc))
    )
    end_b = gather(boff, jnp.minimum(end_unit, S - 1))
    end_col = jnp.where(score > 0, end_b, wstart)

    exact = include_exact & (nu_l == n) & ~neq
    score32 = score.astype(jnp.int32)
    score32 = jnp.where(
        exact, jnp.minimum(score32 + exact_b, 0xFFFF), score32
    )
    greedy = matched & (
        (wend.astype(jnp.int32) - wstart.astype(jnp.int32))
        > MAX_HAYSTACK_LEN
    )
    cols = (
        matched.astype(jnp.int32),
        score32,
        exact.astype(jnp.int32),
        end_col.astype(jnp.int32),
        greedy.astype(jnp.int32),
    )
    if G == 1:
        return cols
    # every result is lane-broadcast within its segment, so segment g's
    # value is a static single-lane slice at lane g*S
    return tuple(
        jnp.concatenate([c[:, g * S: g * S + 1] for g in range(G)], axis=1)
        for c in cols
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_typos", "scoring", "unicode", "no_prefilter", "int16_lanes",
        "interpret", "seg",
    ),
)
def match_units(
    cp: jnp.ndarray,  # (B, W) int8 bytes (ascii) or int32 codepoints
    n_units: jnp.ndarray,  # (B, G) int32 (G = 1, or W//seg when packed)
    scalars: jnp.ndarray,  # (2 + 2*MAXN,) int32: count, n, orig pad, flip pad
    *,
    max_typos: int = 0,
    scoring: Tuple[int, ...] = DEFAULT_SCORING,
    unicode: bool = False,
    no_prefilter: bool = False,
    int16_lanes: bool = False,
    interpret: bool = False,
    seg: int = 0,
):
    """Fused prefilter + SW over the first ``scalars[0]`` rows. Returns
    (B, 8) int32: matched, score, exact, end_col, greedy, 0, 0, 0 (rows
    at/after the count are zero).

    ``seg`` > 0 selects the sub-lane packed layout: each (B, W) vector
    row holds G = W//seg logical rows of <= seg units (see
    pack_rows_for_kernel); the count is in VECTOR rows and the result is
    (B, 8*G) — segment g's columns at [8g, 8g+8) — so
    ``out.reshape(B*G, 8)`` restores logical-row order."""
    B, W = cp.shape
    T = int(max_typos)
    G = 1 if not seg else W // seg
    TBI = _tile_rows(W)
    # small inputs don't pad up to a full fat block: one grid step with
    # only as many sub-tiles as the rows need
    TBO = TBI * min(SUBTILES, max(1, -(-B // TBI)))
    pad = (-B) % TBO
    if pad:
        cp = jnp.pad(cp, ((0, pad), (0, 0)))
        n_units = jnp.pad(n_units, ((0, pad), (0, 0)))
    Bp = cp.shape[0]
    acc = jnp.int16 if int16_lanes else jnp.int32

    def kernel(scalars_ref, cp_ref, nu_ref, out_ref):
        base = pl.program_id(0) * TBO
        count = scalars_ref[0]
        n = scalars_ref[1]

        def sub(s, _):
            off = s * TBI

            @pl.when(base + off < count)
            def _():
                res = _match_tile(
                    scalars_ref,
                    cp_ref[pl.ds(off, TBI), :],
                    nu_ref[pl.ds(off, TBI), :],
                    n, T, W, scoring, unicode, no_prefilter, acc,
                    seg=seg if G > 1 else None,
                )
                if G == 1:
                    block = jnp.concatenate(
                        list(res) + [jnp.zeros((TBI, 3), jnp.int32)],
                        axis=1,
                    )
                else:
                    parts = []
                    for g in range(G):
                        parts.extend(c[:, g: g + 1] for c in res)
                        parts.append(jnp.zeros((TBI, 3), jnp.int32))
                    block = jnp.concatenate(parts, axis=1)
                out_ref[pl.ds(off, TBI), :] = block

            @pl.when(base + off >= count)
            def _():
                out_ref[pl.ds(off, TBI), :] = jnp.zeros(
                    (TBI, 8 * G), jnp.int32
                )

            return 0

        jax.lax.fori_loop(0, TBO // TBI, sub, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // TBO,),
        in_specs=[
            pl.BlockSpec((TBO, W), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TBO, G), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TBO, 8 * G), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, 8 * G), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, cp, n_units)
    return out[:B]


KERNEL_LANES = 128


def pack_rows_for_kernel(cp: jnp.ndarray, n_units: jnp.ndarray):
    """Narrow-bucket sub-lane packing: (B, W) rows with W < 128 reshape to
    G = 128//W logical rows per 128-lane vector (a pure row-major reshape:
    logical rows g*i..g*i+G-1 become vector row i's segments). Returns
    (cp_k, nu_k, seg, G); W >= 128 passes through unpacked."""
    B, W = cp.shape
    if W >= KERNEL_LANES:
        return cp, n_units, 0, 1
    assert KERNEL_LANES % W == 0 and B % (KERNEL_LANES // W) == 0, (B, W)
    G = KERNEL_LANES // W
    return (
        cp.reshape(B // G, KERNEL_LANES),
        n_units.reshape(B // G, G),
        W,
        G,
    )


def pack_needle_scalars(needle_packed: jnp.ndarray, count) -> jnp.ndarray:
    """[count, n, orig x MAXN, flip x MAXN] int32 for the SMEM prefetch."""
    n = needle_packed.shape[0] // 2
    assert n <= MAX_KERNEL_NEEDLE
    orig = jnp.zeros((MAX_KERNEL_NEEDLE,), jnp.int32).at[:n].set(
        needle_packed[:n].astype(jnp.int32)
    )
    flip = jnp.zeros((MAX_KERNEL_NEEDLE,), jnp.int32).at[:n].set(
        needle_packed[n:].astype(jnp.int32)
    )
    head = jnp.stack(
        [jnp.asarray(count, jnp.int32), jnp.asarray(n, jnp.int32)]
    )
    return jnp.concatenate([head, orig, flip])


def fuzzy_match_units(
    cp: jnp.ndarray,  # (B, W) int8 (ascii) or int32 (unicode)
    n_units: jnp.ndarray,  # (B, 1) int32
    needle_packed: jnp.ndarray,  # (2n,) int32: orig then flip
    *,
    max_typos: int = 0,
    no_prefilter: bool = False,
    scoring: Tuple[int, ...] = DEFAULT_SCORING,
    unicode: bool = False,
    interpret: bool = None,
    mask4: jnp.ndarray = None,  # (B, 4) int32 presence masks (optional)
):
    """Full fused fuzzy match: stage-1 presence reject -> compact ->
    fused prefilter+DP kernel -> scatter back.

    Returns (matched, score, exact, end_col, needs_greedy), each (B,).
    Composable inside a larger jit. The bucket width must be lane-aligned
    (multiple of 128) and <= MAX_HAYSTACK_LEN units.
    """
    B, W = cp.shape
    n = needle_packed.shape[0] // 2
    assert (W % 128 == 0 or 128 % W == 0) and W <= 1024, W
    assert n <= MAX_KERNEL_NEEDLE
    if interpret is None:
        # Compiled Mosaic on TPU; interpreter everywhere else (CPU tests)
        interpret = jax.default_backend() != "tpu"
    T = min(int(max_typos), n)
    int16_lanes = (
        (not unicode)
        and score_fits_int16(scoring, n, W)
        and (interpret or INT16_MOSAIC_OK)
    )
    G = 1 if W >= KERNEL_LANES else KERNEL_LANES // W
    TBO = block_rows(max(W, KERNEL_LANES)) * G  # logical rows per block

    def run(cp_r, nu_r, count_rows):
        """Kernel over logical rows: narrow buckets pack G rows per
        vector; the (rows, 8) result restores logical order."""
        rows = cp_r.shape[0]
        padr = (-rows) % G
        if padr:  # zero-unit filler rows, sliced back off below
            cp_r = jnp.pad(cp_r, ((0, padr), (0, 0)))
            nu_r = jnp.pad(nu_r, ((0, padr), (0, 0)))
        cp_k, nu_k, seg, g = pack_rows_for_kernel(cp_r, nu_r)
        count_vec = (count_rows + (g - 1)) // g if g > 1 else count_rows
        out = match_units(
            cp_k, nu_k, pack_needle_scalars(needle_packed, count_vec),
            max_typos=T, scoring=scoring, unicode=unicode,
            no_prefilter=no_prefilter, int16_lanes=int16_lanes,
            interpret=interpret, seg=seg,
        )
        return out.reshape(-1, 8)[:rows]

    def unpack(out, matched_pre=None):
        matched = out[:, 0].astype(jnp.bool_)
        if matched_pre is not None:
            matched = matched & matched_pre
        score = jnp.where(matched, out[:, 1], 0)
        exact = matched & out[:, 2].astype(jnp.bool_)
        end_col = jnp.where(matched, out[:, 3], 0)
        greedy = matched & out[:, 4].astype(jnp.bool_)
        return matched, score, exact, end_col, greedy

    # Stage-1 presence reject: sound superset of the positional prefilter
    # (a needle unit absent from the row costs >= 1 typo), so it never
    # drops a true match. Skipped when the DP is unconditional.
    use_stage1 = (
        mask4 is not None and not no_prefilter and n > T and B >= 2 * TBO
    )
    if not use_stage1:
        return unpack(run(cp, n_units, B))

    s1 = stage1_presence(mask4, needle_packed, T)
    m32 = s1.astype(jnp.int32)
    cs = jnp.cumsum(m32)
    C = cs[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]
    pos = jnp.where(s1, cs - 1, C + iota - cs)
    perm = jnp.zeros((B,), jnp.int32).at[pos].set(iota)

    # Capacity switch: kernel cost (grid steps + DMA) scales with the
    # array it streams, so pick the smallest precompiled capacity that
    # covers the survivor count (same shapes repeat across corpora via
    # the corpus size classes, so the compile cache hits).
    caps = []
    for div in (32, 8, 2):
        cap = min(B, -(-(B // div) // TBO) * TBO)
        if 0 < cap < B and cap not in caps:
            caps.append(cap)

    def run_cap(cap):
        permc = perm[:cap] if cap < B else perm
        cpc = jnp.take(cp, permc, axis=0)
        nuc = jnp.take(n_units, permc, axis=0)
        out = run(cpc, nuc, jnp.minimum(C, cap))
        if cap < B:
            out = jnp.pad(out, ((0, B - cap), (0, 0)))
        return out

    if caps:
        branches = [functools.partial(run_cap, c) for c in caps]
        branches.append(functools.partial(run_cap, B))
        which = jnp.sum(
            jnp.stack([C > c for c in caps]).astype(jnp.int32)
        )
        out_c = jax.lax.switch(which, branches)
    else:
        out_c = run_cap(B)
    out = jnp.take(out_c, pos, axis=0)  # back to original row order
    return unpack(out, matched_pre=s1)


def fuzzy_match_ascii(
    cp, n_units, needle_packed, *,
    max_typos: int = 0, no_prefilter: bool = False,
    scoring: Tuple[int, ...] = DEFAULT_SCORING, interpret: bool = None,
    mask4=None,
):
    """ASCII compatibility wrapper (greedy can never trigger: bucket width
    <= MAX_HAYSTACK_LEN bytes). Returns (matched, score, exact, end_col)."""
    m, s, e, ec, _g = fuzzy_match_units(
        cp, n_units, needle_packed, max_typos=max_typos,
        no_prefilter=no_prefilter, scoring=scoring, unicode=False,
        interpret=interpret, mask4=mask4,
    )
    return m, s, e, ec
