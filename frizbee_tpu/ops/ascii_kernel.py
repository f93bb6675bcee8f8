"""Fused Pallas TPU kernel: prefilter + Smith-Waterman for ASCII buckets.

One kernel invocation scores a (TB, W) tile of byte-packed haystacks against
one needle entirely in VMEM: typo-tolerant subsequence prefilter, window
trim, the full affine-gap DP with the bonus schedule, exact-match detection,
and end-column extraction. HBM traffic is one int8 read of the haystack
bytes plus a (TB, 4) int32 result write — the speed-of-light layout for this
workload (it is HBM-bandwidth-bound; arithmetic is a few dozen VPU ops per
byte).

Semantics are identical to ops/fuzzy.py's jnp pipeline (that module is the
differential-testing oracle for this kernel; ops/fuzzy.py in turn mirrors
the host oracle, which mirrors the reference's pinned scoring tests). The
reference's row-parallel SIMD with in-register log-shift gap propagation
(reference: src/smith_waterman/algo/ascii.rs, ascii_gap.rs) becomes
inter-sequence parallelism: lanes are haystack bytes, sublanes are
haystacks, and the left-to-right gap recurrence is an exact max-plus prefix
scan (cummax(c + q) - q with q the exclusive cumsum of per-column gap
costs), done as log2(W) lane shifts.

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

NEG_BIG = -(1 << 30)
# Longest needle the unrolled kernel accepts; longer needles take the jnp
# pipeline (they are vanishingly rare for interactive fuzzy matching)
MAX_KERNEL_NEEDLE = 64


def _tile_rows(width: int) -> int:
    """Rows per grid step; bounds live VMEM to ~ a dozen (TB, W) i32 arrays."""
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


def _make_kernel(width, n, max_typos, scoring, no_prefilter):
    (match_score, mismatch, gap_open, gap_ext, prefix_b, cap_b, case_b,
     exact_b, delim_b) = scoring
    gop_extra = max(gap_open - gap_ext, 0)
    BIG = width + 1
    T = int(max_typos)

    def kernel(needle_ref, cp_ref, nu_ref, out_ref):
        hay = cp_ref[:].astype(jnp.int32) & 0xFF  # bytes as 0..255
        tb = hay.shape[0]
        nu = nu_ref[:]  # (TB, 1) int32
        col = jax.lax.broadcasted_iota(jnp.int32, (tb, width), 1)
        valid = col < nu

        def occ_of(k):
            o = needle_ref[k]
            f = needle_ref[n + k]
            return valid & ((hay == o) | (hay == f))

        # ---- prefilter: minimal-position DP over the typo budget ----
        # (semantics contract: oracle/prefilter.py; jnp twin:
        #  ops/fuzzy.py prefilter_bucket)
        if no_prefilter:
            matched = jnp.ones((tb, 1), jnp.bool_)
            wstart_raw = jnp.zeros((tb, 1), jnp.int32)
            wend = nu
        elif n <= T:
            matched = jnp.ones((tb, 1), jnp.bool_)
            wstart_raw = jnp.zeros((tb, 1), jnp.int32)
            wend = nu
        else:
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
                        jnp.min(jnp.where(occ, col, BIG), axis=1,
                                keepdims=True),
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
                wstart_raw = jnp.clip(start_zero, 0, width - 1)
                wend = jnp.where(e >= 0, e + 1, nu)
            else:
                wstart_raw = jnp.where(
                    first_occ_start <= width,
                    jnp.clip(first_occ_start, 0, width - 1),
                    0,
                )
                occ_tail = jnp.zeros((tb, width), jnp.bool_)
                for k in range(max(n - 1 - T, 0), n):
                    occ_tail = occ_tail | occ_of(k)
                e = jnp.max(jnp.where(occ_tail, col, -1), axis=1,
                            keepdims=True)
                wend = jnp.where(e >= 0, e + 1, nu)
            wstart_raw = jnp.where(matched, wstart_raw, 0)
            wend = jnp.where(matched, wend, nu)

        # ---- window trim (start-1 keeps delimiter context;
        #      reference: src/matcher/algo.rs:332-338) ----
        wstart = jnp.maximum(wstart_raw - 1, 0)
        include_exact = (wstart == 0) & (wend == nu)

        # ---- Smith-Waterman over the window (jnp twin:
        #      ops/fuzzy.py sw_score_bucket) ----
        active = valid & (col >= wstart) & (col < wend)
        first_unit = jnp.min(jnp.where(active, col, BIG), axis=1,
                             keepdims=True)
        is_first = active & (col == first_unit)
        include_prefix = wstart == 0

        prev = _shift_right(hay, 1, -1, col)
        is_upper = (hay >= 0x41) & (hay <= 0x5A)
        prev_lower = (prev >= 0x61) & (prev <= 0x7A)

        def delim(b):
            letter = ((b >= 0x41) & (b <= 0x5A)) | ((b >= 0x61) & (b <= 0x7A))
            digit = (b >= 0x30) & (b <= 0x39)
            return (b >= 0) & (b <= 127) & ~letter & ~digit

        cap_mask = is_upper & prev_lower & ~is_first
        delim_mask = delim(prev) & ~delim(hay) & ~is_first
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
                diag_base + match_score + bonus
                + jnp.where(exactc, case_b, 0)
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

        score = jnp.maximum(
            jnp.max(prev_row, axis=1, keepdims=True), 0
        )
        end_unit = jnp.min(
            jnp.where(prev_row == score, col, BIG), axis=1, keepdims=True
        )
        end_col = jnp.where(score > 0, end_unit, wstart)

        # exact match (byte equality over the whole haystack;
        # reference: src/matcher/algo.rs:245-248)
        if n <= width:
            neq = jnp.zeros((tb, 1), jnp.bool_)
            for k in range(n):
                neq = neq | (hay[:, k:k + 1] != needle_ref[k])
            exact = include_exact & (nu == n) & ~neq
        else:
            exact = jnp.zeros((tb, 1), jnp.bool_)
        score = jnp.where(exact, jnp.minimum(score + exact_b, 0xFFFF), score)

        out_ref[:, 0:1] = matched.astype(jnp.int32)
        out_ref[:, 1:2] = score
        out_ref[:, 2:3] = exact.astype(jnp.int32)
        out_ref[:, 3:4] = end_col

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("max_typos", "no_prefilter", "scoring", "interpret"),
)
def fuzzy_match_ascii_kernel(
    cp: jnp.ndarray,  # (B, W) int8 haystack bytes, zero padded
    n_units: jnp.ndarray,  # (B, 1) int32
    needle_packed: jnp.ndarray,  # (2n,) int32: orig then flip
    *,
    max_typos: int = 0,
    no_prefilter: bool = False,
    scoring: Tuple[int, ...] = (12, 6, 5, 1, 12, 4, 4, 8, 4),
    interpret: bool = False,
):
    """Batched fused fuzzy match of one needle over an ASCII bucket.

    Returns (B, 4) int32: matched, score, exact, end_col. The bucket width
    must be lane-aligned (multiple of 128) and <= MAX_HAYSTACK_LEN so the
    greedy fallback can never trigger.
    """
    B, W = cp.shape
    n = needle_packed.shape[0] // 2
    assert W % 128 == 0 and W <= 1024, W
    assert n <= MAX_KERNEL_NEEDLE

    TB = _tile_rows(W)
    pad = (-B) % TB
    if pad:
        cp = jnp.pad(cp, ((0, pad), (0, 0)))
        n_units = jnp.pad(n_units, ((0, pad), (0, 0)))
    Bp = B + pad

    kernel = _make_kernel(W, n, max_typos, scoring, no_prefilter)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, W), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, 4), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, 4), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=30 * n * Bp * W, bytes_accessed=Bp * W + Bp * 16,
            transcendentals=0,
        ),
    )(needle_packed, cp, n_units)
    return out[:B]
