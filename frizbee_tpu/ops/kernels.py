"""Fused Pallas TPU kernels: prefilter + Smith-Waterman over packed units.

One kernel family covers both packings: ASCII (units are bytes, int8 input)
and Unicode (units are codepoints, int32 input) — the UTF-8 byte context
the scoring schedule needs (first byte, previous unit's last byte, byte
offsets, byte lengths) is derived from the codepoints inside VMEM, so HBM
traffic is one read of the unit matrix plus tiny result writes.

Mirrors the reference's two-phase shape — a cheap typo-tolerant subsequence
prefilter rejects most haystacks before the affine-gap DP (reference:
src/matcher/algo.rs:78-103) — as two VPU kernels with a device-side
compaction between them:

1. ``prefilter``: one pass over every (TB, W) tile; emits matched + the
   conservative byte-window trim.
2. compaction (plain XLA): a stable partition moves surviving rows to the
   front (cumsum positions + one row gather); the survivor count C rides
   into the DP kernel as a prefetched scalar.
3. ``sw``: the full bonus-schedule affine-gap DP, but only tiles whose rows
   lie below C do any compute — cost scales with survivors, like the
   reference, while shapes stay static for XLA.

Lanes are haystack units, sublanes are haystacks (inter-sequence
parallelism — the layout the reference rejected for CPU SIMD,
reference README.md:179, and the natural fit for the 8x128 VPU). The
left-to-right gap recurrence is an exact max-plus prefix scan
(cummax(c + q) - q with q the exclusive cumsum of per-column gap costs) in
log2(W) lane shifts; semantics are identical to ops/fuzzy.py's jnp pipeline
(the differential-testing oracle for these kernels, itself pinned to the
host oracle and the reference's scoring tests).

The needle rides in SMEM via scalar prefetch; scoring constants and the
typo budget are compile-time constants (queries change needles often,
scoring configs almost never).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MAX_HAYSTACK_LEN

NEG_BIG = -(1 << 30)
# Longest needle the unrolled kernels accept; longer needles take the jnp
# pipeline (they are vanishingly rare for interactive fuzzy matching)
MAX_KERNEL_NEEDLE = 64

DEFAULT_SCORING = (12, 6, 5, 1, 12, 4, 4, 8, 4)


def _tile_rows(width: int) -> int:
    """Rows per grid step; bounds live VMEM to ~ a dozen (TB, W) i32 arrays.
    (Measured on v5e: larger tiles do not help — the prefilter slows down
    ~2x at TB=1024, likely register/VMEM pressure.)"""
    return max(32, min(512, 32768 // width))


def _shift_right(x, d, fill, col):
    """Shift lanes right by ``d`` (toward higher index), filling with
    ``fill``; ``col`` is the lane-index iota of x's shape."""
    rolled = pltpu.roll(x, d, axis=1)
    return jnp.where(col < d, fill, rolled)


def _cumsum_lanes(x, col, width):
    d = 1
    while d < width:
        x = x + _shift_right(x, d, 0, col)
        d *= 2
    return x


def _cummax_lanes(x, col, width):
    d = 1
    while d < width:
        x = jnp.maximum(x, _shift_right(x, d, NEG_BIG, col))
        d *= 2
    return x


def _gather_lane(x, idx, col):
    """x[:, idx] per row via masked sum; idx (TB,1), zero when idx is out
    of lanes (matches the jnp pipeline's zero-padded byte_off gathers)."""
    return jnp.sum(jnp.where(col == idx, x, 0), axis=1, keepdims=True)


def _unit_context(hay, valid, col, width, unicode):
    """(first_byte, prev_last_byte, byte_off, byte_len, n_bytes) derived
    from unit values. ASCII: unit == byte, so context is trivial."""
    if not unicode:
        first = hay
        prev = _shift_right(hay, 1, -1, col)
        prev = jnp.where(valid, prev, -1)
        boff = jnp.where(valid, col, 0)
        blen = valid.astype(jnp.int32)
        n_bytes = jnp.sum(blen, axis=1, keepdims=True)
        return first, prev, boff, blen, n_bytes
    blen = (
        1
        + (hay >= 0x80).astype(jnp.int32)
        + (hay >= 0x800).astype(jnp.int32)
        + (hay >= 0x10000).astype(jnp.int32)
    )
    blen = jnp.where(valid, blen, 0)
    first = jnp.where(
        hay < 0x80,
        hay,
        jnp.where(
            hay < 0x800,
            0xC0 | (hay >> 6),
            jnp.where(hay < 0x10000, 0xE0 | (hay >> 12), 0xF0 | (hay >> 18)),
        ),
    )
    first = jnp.where(valid, first, 0)
    last = jnp.where(hay < 0x80, hay, 0x80 | (hay & 0x3F))
    prev = _shift_right(last, 1, -1, col)
    prev = jnp.where(valid, prev, -1)
    boff = _shift_right(_cumsum_lanes(blen, col, width), 1, 0, col)
    boff = jnp.where(valid, boff, 0)
    n_bytes = jnp.sum(blen, axis=1, keepdims=True)
    return first, prev, boff, blen, n_bytes


def _prefilter_body(needle_ref, hay, nu, col, n, T, width, unicode):
    """Minimal-position DP over the typo budget. Returns
    (matched, wstart_raw, wend), byte positions, each (TB, 1). Semantics
    contract: oracle/prefilter.py; jnp twin: ops/fuzzy.py
    prefilter_bucket."""
    tb = hay.shape[0]
    BIG = width + 1
    valid = col < nu
    _first, _prev, boff, blen, n_bytes = _unit_context(
        hay, valid, col, width, unicode
    )

    def occ_of(k):
        return valid & ((hay == needle_ref[k]) | (hay == needle_ref[n + k]))

    if n <= T:
        ones = jnp.ones((tb, 1), jnp.bool_)
        return ones, jnp.zeros((tb, 1), jnp.int32), n_bytes

    f = [jnp.zeros((tb, 1), jnp.int32) for _ in range(T + 1)]
    first_occ_start = jnp.full((tb, 1), BIG, jnp.int32)
    start_zero = jnp.zeros((tb, 1), jnp.int32)
    occ_last = None
    for k in range(n):
        occ = occ_of(k)
        if k == n - 1:
            occ_last = occ
        if k <= T:
            first_occ_start = jnp.minimum(
                first_occ_start,
                jnp.min(jnp.where(occ, col, BIG), axis=1, keepdims=True),
            )
        nf = []
        for t in range(T + 1):
            nxt_occ = jnp.min(
                jnp.where(occ & (col >= f[t]), col, BIG),
                axis=1, keepdims=True,
            )
            nxt = jnp.where(
                f[t] <= width, jnp.minimum(nxt_occ + 1, BIG), BIG
            )
            if t > 0:
                nxt = jnp.minimum(nxt, f[t - 1])
            nf.append(nxt)
        if k == 0:
            start_zero = jnp.minimum(nf[0] - 1, width)
        f = nf
    matched = f[T] <= width

    if T == 0:
        last_pos = f[0] - 1
        e = jnp.max(
            jnp.where(occ_last & (col >= last_pos), col, -1),
            axis=1, keepdims=True,
        )
        start_u = jnp.clip(start_zero, 0, width - 1)
        wstart = _gather_lane(boff, start_u, col)
    else:
        start_u = jnp.clip(first_occ_start, 0, width - 1)
        wstart = jnp.where(
            first_occ_start <= width,
            _gather_lane(boff, start_u, col),
            0,
        )
        occ_tail = jnp.zeros((tb, width), jnp.bool_)
        for k in range(max(n - 1 - T, 0), n):
            occ_tail = occ_tail | occ_of(k)
        e = jnp.max(jnp.where(occ_tail, col, -1), axis=1, keepdims=True)
    e_c = jnp.clip(e, 0, width - 1)
    wend = _gather_lane(boff, e_c, col) + _gather_lane(blen, e_c, col)
    wend = jnp.where(e >= 0, wend, n_bytes)
    wstart = jnp.where(matched, wstart, 0)
    wend = jnp.where(matched, wend, n_bytes)
    return matched, wstart, wend


def _sw_body(needle_ref, hay, nu, wstart_raw, wend, col, n, width, scoring,
             unicode):
    """Windowed affine-gap Smith-Waterman with the full bonus schedule.
    Windows are byte positions. Returns (score, exact, end_col), each
    (TB, 1). jnp twin: ops/fuzzy.py sw_score_bucket."""
    (match_score, mismatch, gap_open, gap_ext, prefix_b, cap_b, case_b,
     exact_b, delim_b) = scoring
    gop_extra = max(gap_open - gap_ext, 0)
    tb = hay.shape[0]
    BIG = width + 1
    valid = col < nu
    fb, pb, boff, blen, n_bytes = _unit_context(
        hay, valid, col, width, unicode
    )

    # window trim (start-1 keeps delimiter context;
    # reference: src/matcher/algo.rs:332-338)
    wstart = jnp.maximum(wstart_raw - 1, 0)
    include_exact = (wstart == 0) & (wend == n_bytes)

    active = valid & (boff >= wstart) & (boff + blen <= wend)
    first_unit = jnp.min(jnp.where(active, col, BIG), axis=1, keepdims=True)
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
        jnp.where(cap_mask, cap_b, 0)
        + jnp.where(delim_mask, delim_b, 0)
        + jnp.where(is_first & include_prefix, prefix_b, 0)
    ).astype(jnp.int32)

    prev_row = jnp.zeros((tb, width), jnp.int32)
    prev_mm = jnp.zeros((tb, width), jnp.bool_)
    for k in range(n):
        o = needle_ref[k]
        fl = needle_ref[n + k]
        match = active & ((hay == o) | (hay == fl))
        exactc = active & (hay == o)

        diag_base = _shift_right(prev_row, 1, 0, col)
        diag_m = (
            diag_base + match_score + bonus + jnp.where(exactc, case_b, 0)
        )
        diag_u = jnp.maximum(diag_base - mismatch, 0)
        diag = jnp.where(match, diag_m, diag_u)
        up = jnp.maximum(
            prev_row - gap_ext - jnp.where(prev_mm, gop_extra, 0), 0
        )
        c = jnp.maximum(diag, up)
        p = gap_ext + jnp.where(match, gop_extra, 0)
        q = _shift_right(_cumsum_lanes(p, col, width), 1, 0, col)
        prev_row = _cummax_lanes(c + q, col, width) - q
        prev_mm = match

    # Mask lanes past the window: their mismatch-decayed values can exceed
    # the true in-window max (jnp twin has the same mask)
    prev_row = jnp.where(active, prev_row, 0)
    score = jnp.maximum(jnp.max(prev_row, axis=1, keepdims=True), 0)
    end_unit = jnp.min(
        jnp.where(prev_row == score, col, BIG), axis=1, keepdims=True
    )
    # Pad lanes map to byte offset 0, matching the jnp pipeline's
    # zero-padded byte_off gather (only reachable on unmatched rows)
    end_b = _gather_lane(boff, jnp.minimum(end_unit, width - 1), col)
    end_col = jnp.where(score > 0, end_b, wstart)

    # exact match (unit equality over the whole haystack;
    # reference: src/matcher/algo.rs:245-248)
    if n <= width:
        neq = jnp.zeros((tb, 1), jnp.bool_)
        for k in range(n):
            neq = neq | (hay[:, k:k + 1] != needle_ref[k])
        exact = include_exact & (nu == n) & ~neq
    else:
        exact = jnp.zeros((tb, 1), jnp.bool_)
    score = jnp.where(exact, jnp.minimum(score + exact_b, 0xFFFF), score)
    return score, exact, end_col


def _pad_rows(x, tb):
    pad = (-x.shape[0]) % tb
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _block_specs(TB, W, n_tensors):
    return [
        pl.BlockSpec((TB, W if i == 0 else 1), lambda j, *_: (j, 0),
                     memory_space=pltpu.VMEM)
        for i in range(n_tensors)
    ]


@functools.partial(
    jax.jit, static_argnames=("max_typos", "unicode", "interpret")
)
def prefilter_units(
    cp: jnp.ndarray,  # (B, W) int8 bytes (ascii) or int32 codepoints
    n_units: jnp.ndarray,  # (B, 1) int32
    needle_packed: jnp.ndarray,  # (2n,) int32: orig then flip
    *,
    max_typos: int = 0,
    unicode: bool = False,
    interpret: bool = False,
):
    """Prefilter a packed bucket. Returns (B, 3) int32:
    matched, wstart_raw (byte), wend (byte)."""
    B, W = cp.shape
    n = needle_packed.shape[0] // 2
    TB = _tile_rows(W)
    cp = _pad_rows(cp, TB)
    n_units = _pad_rows(n_units, TB)
    Bp = cp.shape[0]
    T = int(max_typos)

    def kernel(needle_ref, cp_ref, nu_ref, out_ref):
        hay = cp_ref[:].astype(jnp.int32)
        if not unicode:
            hay = hay & 0xFF
        nu = nu_ref[:]
        col = jax.lax.broadcasted_iota(jnp.int32, hay.shape, 1)
        matched, wstart_raw, wend = _prefilter_body(
            needle_ref, hay, nu, col, n, T, W, unicode
        )
        out_ref[:, 0:1] = matched.astype(jnp.int32)
        out_ref[:, 1:2] = wstart_raw
        out_ref[:, 2:3] = wend

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, W), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, 3), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, 3), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(needle_packed, cp, n_units)
    return out[:B]


@functools.partial(
    jax.jit, static_argnames=("scoring", "unicode", "interpret")
)
def sw_units(
    cp: jnp.ndarray,  # (B, W) int8/int32 (typically compacted)
    n_units: jnp.ndarray,  # (B, 1) int32
    wstart_raw: jnp.ndarray,  # (B, 1) int32 untrimmed window start (byte)
    wend: jnp.ndarray,  # (B, 1) int32 window end (byte, exclusive)
    count: jnp.ndarray,  # (1,) int32: rows needing DP; tiles past it skip
    needle_packed: jnp.ndarray,  # (2n,) int32
    *,
    scoring: Tuple[int, ...] = DEFAULT_SCORING,
    unicode: bool = False,
    interpret: bool = False,
):
    """Windowed Smith-Waterman over the first ``count`` rows. Returns
    (B, 3) int32: score, exact, end_col (rows >= count are zero)."""
    B, W = cp.shape
    n = needle_packed.shape[0] // 2
    TB = _tile_rows(W)
    cp = _pad_rows(cp, TB)
    n_units = _pad_rows(n_units, TB)
    wstart_raw = _pad_rows(wstart_raw, TB)
    wend = _pad_rows(wend, TB)
    Bp = cp.shape[0]

    # needle scalars and the count share one prefetch array:
    # [count, orig..., flip...]
    scalars = jnp.concatenate(
        [count.astype(jnp.int32), needle_packed.astype(jnp.int32)]
    )

    def kernel(scalars_ref, cp_ref, nu_ref, ws_ref, we_ref, out_ref):
        i = pl.program_id(0)

        class _NeedleView:
            def __getitem__(self, k):
                return scalars_ref[k + 1]

        @pl.when(i * TB < scalars_ref[0])
        def _():
            hay = cp_ref[:].astype(jnp.int32)
            if not unicode:
                hay = hay & 0xFF
            nu = nu_ref[:]
            col = jax.lax.broadcasted_iota(jnp.int32, hay.shape, 1)
            score, exact, end_col = _sw_body(
                _NeedleView(), hay, nu, ws_ref[:], we_ref[:], col, n, W,
                scoring, unicode,
            )
            out_ref[:, 0:1] = score
            out_ref[:, 1:2] = exact.astype(jnp.int32)
            out_ref[:, 2:3] = end_col

        @pl.when(i * TB >= scalars_ref[0])
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, W), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, 3), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, 3), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, cp, n_units, wstart_raw, wend)
    return out[:B]


def fuzzy_match_units(
    cp: jnp.ndarray,  # (B, W) int8 (ascii) or int32 (unicode)
    n_units: jnp.ndarray,  # (B, 1) int32
    needle_packed: jnp.ndarray,  # (2n,) int32
    *,
    max_typos: int = 0,
    no_prefilter: bool = False,
    scoring: Tuple[int, ...] = DEFAULT_SCORING,
    unicode: bool = False,
    interpret: bool = None,
):
    """Full fused fuzzy match: prefilter -> compact -> DP.

    Returns (matched, score, exact, end_col, needs_greedy), each (B,).
    Composable inside a larger jit. The bucket width must be lane-aligned
    (multiple of 128) and <= MAX_HAYSTACK_LEN units.
    """
    B, W = cp.shape
    n = needle_packed.shape[0] // 2
    assert W % 128 == 0 and W <= 1024, W
    assert n <= MAX_KERNEL_NEEDLE
    if interpret is None:
        # Compiled Mosaic on TPU; interpreter everywhere else (CPU tests)
        interpret = jax.default_backend() != "tpu"

    if no_prefilter:
        matched = jnp.ones((B,), jnp.bool_)
        wstart_raw = jnp.zeros((B, 1), jnp.int32)
        if unicode:
            # window end = total bytes; cheap on-device derivation
            blen = (
                1
                + (cp >= 0x80).astype(jnp.int32)
                + (cp >= 0x800).astype(jnp.int32)
                + (cp >= 0x10000).astype(jnp.int32)
            )
            cols = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
            blen = jnp.where(cols < n_units, blen, 0)
            wend = jnp.sum(blen, axis=1, keepdims=True)
        else:
            wend = n_units
        count = jnp.full((1,), B, jnp.int32)
        out = sw_units(
            cp, n_units, wstart_raw, wend, count, needle_packed,
            scoring=scoring, unicode=unicode, interpret=interpret,
        )
        greedy = matched & ((wend[:, 0] - 0) > MAX_HAYSTACK_LEN)
        return (
            matched, out[:, 0], out[:, 1].astype(jnp.bool_), out[:, 2],
            greedy,
        )

    pf = prefilter_units(
        cp, n_units, needle_packed, max_typos=max_typos, unicode=unicode,
        interpret=interpret,
    )
    matched = pf[:, 0].astype(jnp.bool_)
    wstart_raw = pf[:, 1:2]
    wend = pf[:, 2:3]

    # Stable partition: survivors first. pos[i] = compacted slot of row i.
    m32 = matched.astype(jnp.int32)
    cs = jnp.cumsum(m32)
    C = cs[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]
    pos = jnp.where(matched, cs - 1, C + iota - cs)
    perm = jnp.zeros((B,), jnp.int32).at[pos].set(iota)

    cp_c = jnp.take(cp, perm, axis=0)
    nu_c = jnp.take(n_units, perm, axis=0)
    ws_c = jnp.take(wstart_raw, perm, axis=0)
    we_c = jnp.take(wend, perm, axis=0)

    # Capacity branching: the DP kernel's fixed cost (input DMA + grid
    # machinery) scales with the array it streams, not with the compute it
    # skips — so pick among precompiled capacity variants by the survivor
    # count. Typical prefilter pass rates are <=10% (the reference reports
    # ~8% on Chromium), so the small branch usually runs.
    TB = _tile_rows(W)

    def run_cap(cap):
        out = sw_units(
            cp_c[:cap], nu_c[:cap], ws_c[:cap], we_c[:cap],
            jnp.minimum(C, cap)[None], needle_packed,
            scoring=scoring, unicode=unicode, interpret=interpret,
        )
        return jnp.pad(out, ((0, B - cap), (0, 0)))

    caps = []
    for div in (16, 4):
        cap = -(-(B // div) // TB) * TB
        if 0 < cap < B and cap not in caps:
            caps.append(cap)
    if B >= 4 * TB and caps:
        branches = [functools.partial(run_cap, c) for c in caps]
        branches.append(functools.partial(run_cap, B))
        which = jnp.sum(
            jnp.stack([C > c for c in caps]).astype(jnp.int32)
        )
        out_c = jax.lax.switch(which, branches)
    else:
        out_c = run_cap(B)
    out = jnp.take(out_c, pos, axis=0)  # back to original row order
    score = jnp.where(matched, out[:, 0], 0)
    exact = matched & out[:, 1].astype(jnp.bool_)
    end_col = jnp.where(matched, out[:, 2], 0)
    trimmed = jnp.maximum(wstart_raw[:, 0] - 1, 0)
    greedy = matched & ((wend[:, 0] - trimmed) > MAX_HAYSTACK_LEN)
    return matched, score, exact, end_col, greedy


def fuzzy_match_ascii(
    cp, n_units, needle_packed, *,
    max_typos: int = 0, no_prefilter: bool = False,
    scoring: Tuple[int, ...] = DEFAULT_SCORING, interpret: bool = None,
):
    """ASCII compatibility wrapper (greedy can never trigger: bucket width
    <= MAX_HAYSTACK_LEN bytes). Returns (matched, score, exact, end_col)."""
    m, s, e, ec, _g = fuzzy_match_units(
        cp, n_units, needle_packed, max_typos=max_typos,
        no_prefilter=no_prefilter, scoring=scoring, unicode=False,
        interpret=interpret,
    )
    return m, s, e, ec


# Back-compat aliases for the ASCII-only entry points
prefilter_ascii = functools.partial(prefilter_units, unicode=False)
sw_ascii = functools.partial(sw_units, unicode=False)
