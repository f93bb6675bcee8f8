"""Column-stream (transposed) fused prefilter + Smith-Waterman kernel.

The row-major kernel (ops/kernels.py) lays lanes = haystack units and pays
~2*log2(W) cross-lane shift ops per needle unit for the gap prefix scan.
This kernel transposes the layout: BOTH vector dimensions are haystacks
(a (SUBL, 128) register tile = SUBL*128 independent rows) and the kernel
iterates sequentially over haystack unit columns, so every DP dependency
(the gap recurrence, the window scan, the byte-context chain) rides the
loop for free — ~1 element-op per DP cell instead of ~log W. Measured on
v5e (benchmarks/probe_transposed*.py): ~20x the row-major kernel on
full-corpus (in-place) passes, the profile of the reference's pure-DP
benchmarks (all_match / all_scores, reference BENCHMARKS.md:64).

This is the layout the reference USES for its CPU SIMD (lanes = different
haystacks, reference README.md:179 "interleaved representation"), rebuilt
for the 8x128 VPU: rows stream through registers in (SUBL, 128) tiles and
the needle loop is unrolled at trace time (needle length is static per
serving group). It complements, not replaces, the row-major kernel: that
one wins when stage-1 compaction gathers survivor rows (gathers need
row-major layout); this one wins on in-place flows where every row runs.

Semantics contract: identical to ops/kernels._match_tile ==
ops/fuzzy.fuzzy_pipeline == the NumPy oracle (differential-tested in
tests/test_colstream.py). Reference semantics carried: positional
prefilter with typo budget (src/prefilter/algo/ascii_typos.rs:363-397
window rules), start-1 window trim (src/matcher/algo.rs:332), the full
bonus schedule and affine gaps (src/smith_waterman/algo/ascii.rs:10-158),
exact-match detection (src/matcher/algo.rs:245-248).

Layout: rows group into tiles of GR = SUBL*128; group ``g``'s unit column
``j`` lives at ``cpT[g*W + j]`` as a (SUBL, 128) tile with row
``g*GR + s*128 + l`` at [s, l] (a pure reshape+transpose at pack time,
see corpus.PackedBucket.device_arrays_colstream). ASCII stores int8
(upcast per column in VMEM); unicode stores int32 codepoints.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MAX_HAYSTACK_LEN

# Rows per sublane tile: SUBL*128 rows stream per grid step. 8 keeps the
# ~2n+12 live state tiles to one vreg each (larger tiles spill on long
# needles); env override for device sweeps.
SUBL = int(os.environ.get("FRIZBEE_TPU_COLSTREAM_SUBL", "8"))

# ctx-plane bit layout — ONE definition shared by the pack-time NumPy
# builder (corpus.device_arrays_colstream), the in-kernel fallback
# (_bonus_bits), and the kernel readers; tests/test_colstream_ctx.py
# pins an independent re-derivation as the third check.
CTX_UPPER_FIRST = 1   # is_upper(first UTF-8 byte)
CTX_DELIM_FIRST = 2   # delim(first byte)
CTX_LOWER_LAST = 4    # lower(last byte)
CTX_DELIM_LAST = 8    # delim(last byte)
CTX_BLEN_SHIFT = 4    # bits 4-6: UTF-8 byte length

# Dispatch bounds: per-needle-unit DP state lives in registers (2 tiles
# per unit), so long needles and large typo budgets take the row-major
# kernel instead.
MAX_COLSTREAM_NEEDLE = 16
MAX_COLSTREAM_TYPOS = 3

GR = None  # computed as SUBL * 128 at call time (SUBL is env-tunable)


def colstream_supported(n: int, max_typos, no_prefilter: bool) -> bool:
    """True when (needle length, typo budget) fits the register budget."""
    if n < 1 or n > MAX_COLSTREAM_NEEDLE:
        return False
    if no_prefilter:
        return True
    return int(max_typos) <= MAX_COLSTREAM_TYPOS


def colstream_literal_supported(n: int) -> bool:
    """Literal (exact/prefix/suffix/substring) colstream support: the
    bitap prefix-alive bitmask needs n bits of one int32 lane and the
    per-prefix score accumulators need n register tiles — the same
    budget as the fuzzy DP states."""
    return 1 <= n <= MAX_COLSTREAM_NEEDLE


def _utf8_ctx(hay, valid):
    """(first_byte, last_byte, byte_len) for one codepoint column.
    Mirrors kernels._unit_context's per-unit formulas."""
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
            jnp.where(
                hay < 0x10000, 0xE0 | (hay >> 12), 0xF0 | (hay >> 18)
            ),
        ),
    )
    first = jnp.where(valid, first, 0)
    last = jnp.where(hay < 0x80, hay, 0x80 | (hay & 0x3F))
    return first, last, blen


def _column(cpT_ref, j, nu, unicode, dt=jnp.int32, ctx_ref=None,
            want_bits=False):
    """Load unit column j: (hay, valid, blen, bits) in ``dt`` lanes
    (dt != int32 only on the ASCII int16 path — unicode codepoints
    don't fit 16 bits). ``nu`` must already be in ``dt``: every i1 mask
    in a 16-bit loop must derive from 16-bit-laid-out operands or Mosaic
    hits an invalid (8,128)->(16,128) mask relayout.

    ``bits`` (only when ``want_bits``) packs the per-unit bonus facts:
    bit0 is_upper(first byte), bit1 delim(first), bit2 lower(last),
    bit3 delim(last). With a pack-time ``ctx_ref`` plane
    (corpus.device_arrays_colstream) the bits and byte length are ONE
    int8 load + two mask ops instead of ~20 element-ops of UTF-8
    lead/last-byte chains and case/delimiter tests re-derived per
    column per pass — the unicode kernels' largest per-column cost."""
    hay = cpT_ref[j].astype(dt)
    if not unicode:
        hay = hay & 0xFF
    valid = nu > jnp.asarray(j, nu.dtype)
    bits = None
    if unicode:
        if ctx_ref is not None:
            ctx = ctx_ref[j].astype(dt)
            blen = jnp.where(
                valid,
                jax.lax.shift_right_logical(
                    ctx, jnp.asarray(CTX_BLEN_SHIFT, dt)
                ) & 7,
                jnp.asarray(0, dt),
            )
            if want_bits:
                bits = ctx & 0xF
        else:
            first, last, blen = _utf8_ctx(hay, valid)
            if want_bits:
                bits = _bonus_bits(first, last, dt)
    else:
        blen = valid.astype(dt)
        if want_bits:
            first = jnp.where(valid, hay, jnp.asarray(0, dt))
            bits = _bonus_bits(first, first, dt)
    return hay, valid, blen, bits


def _bonus_bits(first, last, dt=jnp.int32):
    """Pack the per-unit bonus facts from derived first/last bytes —
    the in-kernel fallback twin of the pack-time ctx plane (identical
    bit layout; differential-pinned in tests/test_colstream_ctx.py)."""
    def delim(b):
        letter = (
            ((b >= 0x41) & (b <= 0x5A)) | ((b >= 0x61) & (b <= 0x7A))
        )
        digit = (b >= 0x30) & (b <= 0x39)
        return (b >= 0) & (b <= 127) & ~letter & ~digit

    bits = (
        ((first >= 0x41) & (first <= 0x5A)).astype(dt) * CTX_UPPER_FIRST
    )
    bits = bits | (delim(first).astype(dt) * CTX_DELIM_FIRST)
    bits = bits | (
        ((last >= 0x61) & (last <= 0x7A)).astype(dt) * CTX_LOWER_LAST
    )
    bits = bits | (delim(last).astype(dt) * CTX_DELIM_LAST)
    return bits


def _match_block(scal_ref, cpT_ref, nu, W, n, T, scoring, unicode,
                 no_prefilter, int16_lanes=False, ctx_ref=None):
    """Full-semantics match over one (W, SUBL, 128)-blocked row group.

    Returns int32 (SUBL, 128) tiles: matched, score, exact, end_col,
    greedy — the per-row contract of kernels._match_tile.
    """
    (match_score, mismatch, gap_open, gap_ext, prefix_b, cap_b, case_b,
     exact_b, delim_b) = scoring
    gop_extra = max(gap_open - gap_ext, 0)
    shape = nu.shape
    z = jnp.zeros(shape, jnp.int32)

    # Dynamic column bound: no row in this block has units past the block
    # max, so every fori_loop runs jmaxu trips instead of W. Pays off
    # when blocks are length-homogeneous — corpus colstream blocks are
    # built from length-sorted rows (corpus.device_arrays_colstream) and
    # compacted survivors arrive length-sorted from the P1b survivor key.
    jmaxu = jnp.minimum(jnp.max(nu), W)

    def orig_k(k):
        return scal_ref[2 + k]

    def flip_k(k):
        return scal_ref[2 + 64 + k]  # MAX_KERNEL_NEEDLE == 64 pad

    # ---- pass 1: byte totals + positional prefilter -----------------------
    # n_bytes always (window defaults need it); prefilter state only when on
    auto = (not no_prefilter) and n <= T
    run_pf = (not no_prefilter) and not auto

    # The window-tracking state packs into ONE int32 carry per lane
    # (bit 30 = start-found, bits 29..16 = start byte, bit 14 = end-found,
    # bits 13..0 = end byte): the TPU backend's register allocator crashes
    # when several distinct loop carries are all live-out of the loop
    # (benchmarks/probe_colstream_bisect*.py), and a packed word also
    # halves the per-column select traffic. Bytes fit 14 bits (widest
    # bucket = 1024 units x 4 bytes; same bound as ops/batch._pack_meta).
    W_FF = 1 << 30
    W_EF = 1 << 14
    W_HI = ~0x7FFF  # keep bits >= 15 (start fields) on an end update

    def track_start(wtrack, hit, boff):
        cond = ((wtrack & W_FF) == 0) & hit
        return wtrack | jnp.where(cond, W_FF | (boff << 16), 0)

    def track_end(wtrack, hit, e_byte):
        return jnp.where(hit, (wtrack & W_HI) | W_EF | e_byte, wtrack)

    def unpack_track(wtrack, matched, nb):
        ffound = (wtrack & W_FF) > 0
        wstart_raw = jnp.where(
            matched & ffound, (wtrack >> 16) & 0x3FFF, 0
        )
        wend = jnp.where(
            matched & ((wtrack & W_EF) > 0), wtrack & 0x3FFF, nb
        )
        return wstart_raw, wend

    if run_pf:
        if T == 0:
            # greedy leftmost embedding: np = needle units consumed;
            # completion/tail tracking per oracle/prefilter.py:47-75.
            # Flag carries ride as int32 lanes (no i1 block args in
            # Mosaic). ASCII elides the boff/nb carries: bytes == units,
            # so boff == j on every valid column.
            def pf_body(j, c):
                if unicode:
                    (np_, wtrack, boff, nb) = c
                else:
                    (np_, wtrack) = c
                hay, valid, blen, _b = _column(
                    cpT_ref, j, nu, unicode, ctx_ref=ctx_ref
                )
                if not unicode:
                    boff = j
                    e_byte = j + 1
                else:
                    e_byte = boff + blen

                occ_np = jnp.zeros(shape, jnp.bool_)
                hit0 = occ_last = None
                for k in range(n):
                    occ_k = valid & (
                        (hay == orig_k(k)) | (hay == flip_k(k))
                    )
                    occ_np = occ_np | ((np_ == k) & occ_k)
                    if k == 0:
                        hit0 = occ_k
                    if k == n - 1:
                        occ_last = occ_k
                # start: first greedy hit of needle[0]
                wtrack = track_start(wtrack, hit0, boff)
                np2 = np_ + occ_np.astype(jnp.int32)
                # end: last occurrence of the final unit at-or-after the
                # greedy completion position (completion column included)
                wtrack = track_end(wtrack, occ_last & (np2 >= n), e_byte)
                if unicode:
                    return (np2, wtrack, boff + blen, nb + blen)
                return (np2, wtrack)

            init = (z, z, z, z) if unicode else (z, z)
            out = jax.lax.fori_loop(0, jmaxu, pf_body, init)
            np_, wtrack = out[0], out[1]
            nb = out[3] if unicode else jnp.minimum(nu, W)
            matched = np_ >= n
            wstart_raw, wend = unpack_track(wtrack, matched, nb)
            # unmatched rows keep the full-row window defaults
            wstart_raw = jnp.where(matched, wstart_raw, 0)
        else:
            # minimal-position DP, j-major form: g[t] = longest needle
            # prefix embeddable with <= t deletions in hay[0..j) (the
            # free-deletion closure g[t] >= g[t-1]+1 applied per column);
            # matched <=> g[T] >= n. Window rules: start = min first
            # occurrence among needle[0..=T]; end = last occurrence of
            # any of the last T+1 units (ascii_typos.rs:363-397).
            def pf_body(j, c):
                if unicode:
                    g, wtrack, boff, nb = c[0], c[1], c[2], c[3]
                else:
                    g, wtrack = c[0], c[1]
                hay, valid, blen, _b = _column(
                    cpT_ref, j, nu, unicode, ctx_ref=ctx_ref
                )
                if not unicode:
                    boff = j
                    e_byte = j + 1
                else:
                    e_byte = boff + blen

                hits = [jnp.zeros(shape, jnp.bool_) for _ in range(T + 1)]
                hit_low = jnp.zeros(shape, jnp.bool_)
                hit_tail = jnp.zeros(shape, jnp.bool_)
                for k in range(n):
                    occ_k = valid & (
                        (hay == orig_k(k)) | (hay == flip_k(k))
                    )
                    for t in range(T + 1):
                        hits[t] = hits[t] | ((g[t] == k) & occ_k)
                    if k <= T:
                        hit_low = hit_low | occ_k
                    if k >= n - 1 - T:
                        hit_tail = hit_tail | occ_k
                g = [
                    g[t] + hits[t].astype(jnp.int32) for t in range(T + 1)
                ]
                # free-deletion closure (ascending t propagates chains)
                for t in range(1, T + 1):
                    g[t] = jnp.maximum(g[t], g[t - 1] + 1)
                wtrack = track_start(wtrack, hit_low, boff)
                wtrack = track_end(wtrack, hit_tail, e_byte)
                if unicode:
                    return (tuple(g), wtrack, boff + blen, nb + blen)
                return (tuple(g), wtrack)

            g0 = tuple(jnp.full(shape, t, jnp.int32) for t in range(T + 1))
            init = (g0, z, z, z) if unicode else (g0, z)
            out = jax.lax.fori_loop(0, jmaxu, pf_body, init)
            g, wtrack = out[0], out[1]
            nb = out[3] if unicode else jnp.minimum(nu, W)
            matched = g[T] >= n
            wstart_raw, wend = unpack_track(wtrack, matched, nb)
    else:
        def nb_body(j, c):
            nb = c
            _hay, _valid, blen, _b = _column(
                cpT_ref, j, nu, unicode, ctx_ref=ctx_ref
            )
            return nb + blen

        if unicode:
            nb = jax.lax.fori_loop(0, jmaxu, nb_body, z)
        else:
            nb = jnp.minimum(nu, W)
        matched = jnp.ones(shape, jnp.bool_)
        wstart_raw = z
        wend = nb

    # ---- pass 2: windowed affine-gap SW (bonus schedule) ------------------
    # start-1 trim keeps delimiter context (ref: src/matcher/algo.rs:332)
    wstart = jnp.maximum(wstart_raw - 1, 0)
    include_exact = (wstart == 0) & (wend == nb)
    include_prefix = wstart == 0

    # Matched-hull bound (ASCII, where byte offsets == unit columns): a
    # row's DP columns past its window end can't contribute, and rows the
    # prefilter rejected contribute nothing — so the SW loop only runs to
    # the furthest window end among MATCHED rows. Unmatched rows' score/
    # exact/end_col become undefined and are masked to 0 below (the
    # serving flow and every consumer already read them only under
    # ``matched``). Unicode window ends are byte offsets (columns don't
    # map statically), so it keeps the jmaxu bound.
    if not unicode:
        sw_bound = jnp.minimum(
            jnp.max(jnp.where(matched, wend, 0)), jmaxu
        )
    else:
        sw_bound = jmaxu

    # Narrow (int16) DP lanes: the whole SW state — scores, offsets,
    # flags — fits int16 whenever the static score bound does
    # (kernels.score_fits_int16). ASCII only: unicode hay codepoints
    # exceed int16. Parity-pinned in interpret mode, but DEAD ON v5e:
    # Mosaic rejects EVERY 16-bit vector comparison ("Target does not
    # support this comparison"), plus int16 max/shifts and bf16
    # compares — and the DP is compare/max-heavy, so no kernel
    # restructuring can dodge it (benchmarks/probe_colstream_int16.py
    # + .jsonl carry the verbatim per-op bisect). Kept for interpret
    # parity and for targets whose VPU packs 16-bit ops.
    dt = jnp.int16 if int16_lanes else jnp.int32
    zd = jnp.zeros(shape, dt)
    wstart_d = wstart.astype(dt)
    wend_d = wend.astype(dt)
    nu_d = nu.astype(dt)
    include_prefix_d = wstart_d == 0

    def sw_body(j, c):
        # flag carries ride as int32 lanes (no i1 block args in Mosaic);
        # the previous column's per-k match flags pack into ONE bitmask
        # carry (mm_bits) instead of n gap-adjusted tiles — the TPU
        # backend's register allocator chokes past ~2n live loop carries.
        # The previous unit's bonus context (was-lowercase / was-delim of
        # its last byte) is carried as one packed int32 (bit0 = lower,
        # bit1 = delim) instead of recomputing delim()/case from a
        # carried prev_last byte. The current unit's four bonus facts
        # arrive as packed ``bits`` (pack-time ctx plane when available,
        # else derived in _column) — see _bonus_bits for the layout.
        (h, mm_bits, boff, pctx, seen_first, best, end_b) = c
        hay, valid, blen, bits = _column(
            cpT_ref, j, nu_d, unicode, dt=dt, ctx_ref=ctx_ref,
            want_bits=True,
        )
        active = valid & (boff >= wstart_d) & (boff + blen <= wend_d)
        is_first = active & (seen_first == 0)
        seen_first = seen_first | active.astype(dt)

        is_upper = (bits & CTX_UPPER_FIRST) > 0
        prev_lower = (pctx & 1) > 0
        prev_delim = (pctx & 2) > 0

        def cd(v):
            return jnp.asarray(v, dt)  # dtype-pinned scalar constant

        cap_mask = is_upper & prev_lower & ~is_first
        delim_first = (bits & CTX_DELIM_FIRST) > 0
        delim_mask = prev_delim & ~delim_first & ~is_first
        bonus = (
            jnp.where(cap_mask, cd(cap_b), cd(0))
            + jnp.where(delim_mask, cd(delim_b), cd(0))
            + jnp.where(is_first & include_prefix_d, cd(prefix_b), cd(0))
        )
        # pctx for the next column: [lower(last), delim(last)] = the
        # ctx bits shifted down two
        pctx_new = jnp.where(
            valid,
            jax.lax.shift_right_logical(bits, jnp.asarray(2, dt)) & 3,
            cd(0),
        )

        diag_in = zd         # H[k-1] at column j-1 (0 for k == 0)
        up_src = zd          # H[k-1] at column j (0 for k == 0)
        mm_prev = jnp.zeros(shape, jnp.bool_)  # match[k-1] at column j
        h_new = []
        mm_new = zd
        for k in range(n):
            ok = orig_k(k).astype(dt)
            fk = flip_k(k).astype(dt)
            occ = active & ((hay == ok) | (hay == fk))
            exactc = active & (hay == ok)
            # left gap: H[k][j-1] - (gap_ext + gop_extra*match[k][j-1]),
            # the previous column's match flag unpacked from mm_bits
            left = h[k] - gap_ext
            if gop_extra:
                left = left - jnp.where(
                    (mm_bits >> k) & 1 > 0, cd(gop_extra), cd(0)
                )
            if k == 0:
                # H[-1] row is all zeros: diag simplifies, up vanishes
                diag = jnp.where(
                    occ,
                    match_score + bonus
                    + jnp.where(exactc, cd(case_b), cd(0)),
                    cd(0),
                )
                cur = jnp.maximum(diag, left)
            else:
                diag = jnp.where(
                    occ,
                    diag_in + match_score + bonus
                    + jnp.where(exactc, cd(case_b), cd(0)),
                    jnp.maximum(diag_in - mismatch, 0),
                )
                up = up_src - gap_ext
                if gop_extra:
                    up = up - jnp.where(mm_prev, cd(gop_extra), cd(0))
                up = jnp.maximum(up, 0)
                cur = jnp.maximum(jnp.maximum(diag, up), left)
            diag_in = h[k]
            up_src = cur
            mm_prev = occ
            h_new.append(cur)
            if gop_extra:
                mm_new = mm_new | (occ.astype(dt) << k)
            if k == n - 1:
                masked = jnp.where(active, cur, cd(0))
                upd = masked > best
                end_b = jnp.where(upd, boff, end_b)
                best = jnp.maximum(best, masked)
        return (tuple(h_new), mm_new, boff + blen, pctx_new,
                seen_first, best, end_b)

    h0 = tuple(zd for _ in range(n))
    init = (h0, zd, zd, zd, zd, zd, zd)
    (_h, _mm, _bo, _pc, _sf, best, end_b) = jax.lax.fori_loop(
        0, sw_bound, sw_body, init
    )

    # exact-equality accumulation: haystack unit j vs needle unit j
    # (case-sensitive; ref src/matcher/algo.rs:245-248) in its OWN tiny
    # n-trip loop instead of per-column work inside the W-trip SW loop.
    # Rows shorter than the needle read padding zeros and set neq — they
    # can never be exact (nu == n gate below) either way.
    def neq_body(j, acc):
        hay_j = cpT_ref[j].astype(jnp.int32)
        if not unicode:
            hay_j = hay_j & 0xFF
        return acc | (hay_j != scal_ref[2 + j]).astype(jnp.int32)

    neq = jax.lax.fori_loop(0, min(n, W), neq_body, z)

    best = best.astype(jnp.int32)
    end_b = end_b.astype(jnp.int32)
    score = jnp.maximum(best, 0)
    end_col = jnp.where(score > 0, end_b, wstart)
    exact = include_exact & (nu == n) & (neq == 0)
    score = jnp.where(exact, jnp.minimum(score + exact_b, 0xFFFF), score)
    if auto:
        matched = jnp.ones(shape, jnp.bool_)
    # the hull-bounded loop leaves unmatched rows' outputs undefined;
    # pin them to 0 so the contract is deterministic
    score = jnp.where(matched, score, 0)
    exact = exact & matched
    end_col = jnp.where(matched, end_col, 0)
    greedy = matched & ((wend - wstart) > MAX_HAYSTACK_LEN)
    return (
        matched.astype(jnp.int32),
        score,
        exact.astype(jnp.int32),
        end_col,
        greedy.astype(jnp.int32),
    )


def _literal_block(scal_ref, cpT_ref, nu, W, n, mode, nbl, scoring,
                   unicode, ctx_ref=None):
    """Literal (exact/prefix/suffix/substring) match over one
    (W, SUBL, 128)-blocked row group: the contiguous-run twin of
    ``_match_block``, same output contract.

    Semantics are pinned to ops/literal.literal_match_ctx (itself pinned
    to the oracle and the reference's src/literal/algo.rs:183-313):
    score = n*match + windowed bonus sum + case bonus per orig-case unit
    + exact bonus for whole-haystack runs, best occurrence preferring
    the earliest on ties, end_col = start byte + needle byte len - 1,
    exact = best at unit 0 covering every byte.

    Instead of the jnp path's n shifted (B, W) occurrence arrays (each a
    full HBM round trip — the cost that made literal serving 10x slower
    than fuzzy), the kernel walks unit columns once carrying a bitap
    prefix-alive bitmask ``D`` (bit k = a run of length k+1 ends here)
    and per-prefix-length accumulators S[k] (bonus+case sum of that
    run) — ~3 element-ops per (column, k). EXACT/PREFIX runs can only
    complete at column n-1, so those modes walk min(n, jmax) columns
    instead of the full width."""
    from .literal import EXACT, PREFIX, SUBSTRING, SUFFIX

    (match_score, _mm, _gop, _gex, prefix_b, cap_b, case_b,
     exact_b, delim_b) = scoring
    shape = nu.shape
    z = jnp.zeros(shape, jnp.int32)
    neg1 = jnp.full(shape, -1, jnp.int32)
    jmaxu = jnp.minimum(jnp.max(nu), W)
    short = mode in (EXACT, PREFIX)  # completion only at column n-1
    bound = jnp.minimum(jmaxu, n) if short else jmaxu

    def orig_k(k):
        return scal_ref[2 + k]

    def flip_k(k):
        return scal_ref[2 + 64 + k]  # MAX_KERNEL_NEEDLE == 64 pad

    def body(j, c):
        (D, S, SB, best, b_sb, b_p0, boff, pctx) = c
        hay, valid, blen, bits = _column(
            cpT_ref, j, nu, unicode, ctx_ref=ctx_ref, want_bits=True
        )
        if not unicode:
            boff = jnp.broadcast_to(jnp.asarray(j, jnp.int32), shape)
        # per-column bonus (needle-independent; literal_context formula):
        # byte offset 0 (== column 0, every row) takes the prefix bonus;
        # later columns take capitalization/delimiter context carried in
        # pctx (bit0 = prev unit's last byte was lowercase, bit1 delim);
        # the current unit's facts arrive as packed ``bits``
        is_upper = (bits & CTX_UPPER_FIRST) > 0
        prev_lower = (pctx & 1) > 0
        prev_delim = (pctx & 2) > 0
        delim_first = (bits & CTX_DELIM_FIRST) > 0
        bonus = jnp.where(
            j == 0,
            jnp.full(shape, prefix_b, jnp.int32),
            jnp.where(is_upper & prev_lower, cap_b, 0)
            + jnp.where(prev_delim & ~delim_first, delim_b, 0),
        )
        pctx_new = jnp.where(
            valid, jax.lax.shift_right_logical(bits, 2) & 3, 0,
        )

        D_new = z
        S_new = []
        SB_new = []
        done = s_done = sb_done = None
        for k in range(n):
            eq_o = valid & (hay == orig_k(k))
            occ_k = eq_o | (valid & (hay == flip_k(k)))
            if k == 0:
                alive = occ_k
                s_k = bonus + jnp.where(eq_o, case_b, 0)
            else:
                alive = occ_k & (((D >> (k - 1)) & 1) > 0)
                s_k = S[k - 1] + bonus + jnp.where(eq_o, case_b, 0)
            s_k = jnp.where(alive, s_k, 0)
            D_new = D_new | (alive.astype(jnp.int32) << k)
            S_new.append(s_k)
            sb_k = None
            if unicode:
                sb_k = jnp.where(alive, boff if k == 0 else SB[k - 1], 0)
                SB_new.append(sb_k)
            if k == n - 1:
                done, s_done, sb_done = alive, s_k, sb_k

        # completion: a run of length n ends at this column; its start
        # unit is j-n+1 (== 0 iff j == n-1)
        at_p0 = j == n - 1
        cand = n * match_score + s_done
        # whole-haystack run bonus (start 0 covering every unit)
        cand = cand + jnp.where(at_p0 & (nu == n), exact_b, 0)
        cand = jnp.minimum(cand, 0xFFFF)
        if mode == EXACT:
            sel = done & at_p0 & (nu == n)
        elif mode == PREFIX:
            sel = done & at_p0
        elif mode == SUFFIX:
            sel = done & (j == nu - 1)
        elif mode == SUBSTRING:
            sel = done
        else:  # pragma: no cover
            raise ValueError(mode)
        # strict > while walking starts in ascending order == highest
        # score preferring the earliest (the reference tie-break)
        upd = sel & (cand > best)
        best = jnp.where(upd, cand, best)
        if unicode:
            start_b = sb_done
        else:
            start_b = jnp.broadcast_to(
                jnp.asarray(j - (n - 1), jnp.int32), shape
            )
        b_sb = jnp.where(upd, start_b, b_sb)
        b_p0 = jnp.where(upd, jnp.where(at_p0, 1, 0), b_p0)
        if not unicode:
            boff = z  # unused carry for ascii (recomputed per column)
        return (D_new, tuple(S_new), tuple(SB_new), best, b_sb, b_p0,
                boff + blen, pctx_new)

    S0 = tuple(z for _ in range(n))
    SB0 = tuple(z for _ in range(n)) if unicode else ()
    init = (z, S0, SB0, neg1, z, z, z, z)
    (_D, _S, _SB, best, b_sb, b_p0, boff, _pc) = jax.lax.fori_loop(
        0, bound, body, init
    )

    # total byte length (for the exact flag): ascii rows have nu bytes;
    # unicode rows accumulate blen — with a residual loop past the
    # short-mode bound (cheap: 4 ops/column, no match state)
    if not unicode:
        nb = jnp.minimum(nu, W)
    else:
        def nb_body(j, acc):
            _h, _v, blen, _b = _column(
                cpT_ref, j, nu, unicode, ctx_ref=ctx_ref
            )
            return acc + blen

        nb = jax.lax.fori_loop(bound, jmaxu, nb_body, boff)

    matched = best >= 0
    score = jnp.where(matched, best, 0)
    end_col = jnp.where(
        matched, jnp.minimum(b_sb + nbl - 1, 0xFFFF), 0
    )
    exact = matched & (b_p0 > 0) & (nb == nbl)
    return (
        matched.astype(jnp.int32),
        score,
        exact.astype(jnp.int32),
        end_col,
        jnp.zeros(shape, jnp.int32),  # literal never needs greedy
    )


def row_gather(data: jnp.ndarray, rows: jnp.ndarray,
               G: int = 8, interpret: bool = False) -> jnp.ndarray:
    """Gather whole rows of ``data`` (R, C) int32 at ``rows`` (M,) int32
    via a trivial Pallas copy kernel (scalar-prefetched row ids drive
    the input index map — each grid step DMAs G row blocks).

    Exists because XLA:TPU's batched block take_along_axis FAULTS the
    TPU worker at some serving shapes (round-4 minimal repro), and a
    dynamic-slice scan pays ~1 ms per step of loop overhead. The data
    operand stays UNBLOCKED (ANY memory space — no operand copy; G
    aliased blocked operands materialized G copies and OOMed HBM at
    Q=32) and each grid step issues G overlapped row DMAs by hand.
    C must be a multiple of 128 (rows view as (C/128, 128) tiles)."""
    M = rows.shape[0]
    R, C = data.shape
    d3 = data.reshape(R, C // 128, 128)
    Mp = -(-M // G) * G
    if Mp != M:
        rows = jnp.concatenate(
            [rows, jnp.zeros((Mp - M,), rows.dtype)]
        )

    def kernel(rows_ref, data_ref, out_ref, scratch, sem):
        # np.int32 index constants: python ints traced under an
        # ambient enable_x64 lower as i64 memref indices Mosaic
        # rejects (callers outside an x64 scope are unaffected)
        i = pl.program_id(0) * np.int32(G)
        copies = []
        for j in range(G):
            c = pltpu.make_async_copy(
                data_ref.at[rows_ref[i + np.int32(j)]],
                scratch.at[np.int32(j)], sem
            )
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()
        out_ref[...] = scratch[...]

    # built under enable_x64(False): an index map traced under an
    # ambient x64 scope emits i64 block indices Mosaic won't legalize
    # (a func.func returning (i32, i64, i64) fails legalization)
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Mp // G,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (G, C // 128, 128), lambda i, r: (i, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((G, C // 128, 128), data.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (Mp, C // 128, 128), data.dtype
            ),
            grid_spec=grid_spec,
            interpret=interpret,
        )(rows.astype(jnp.int32), d3)
    return out[:M].reshape(M, C)


def block_gather(data: jnp.ndarray, rows: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """row_gather at the capped finalize's group-row granularity
    (C a multiple of 1024; identical kernel — the (8, C/8) view it
    used before equals row_gather's (C/128, 128) view there)."""
    return row_gather(data, rows, G=8, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=(
        "W", "n", "max_typos", "scoring", "unicode", "no_prefilter",
        "interpret", "int16_lanes", "idx_bits", "mode", "needle_byte_len",
    ),
)
def match_units_colstream(
    cpT: jnp.ndarray,   # (nG*W, SUBL, 128) int8 (ascii) / int32 (unicode)
    nuT: jnp.ndarray,   # (nG*SUBL, 128) int32 unit counts
    scalars: jnp.ndarray,  # kernels.pack_needle_scalars layout (SMEM)
    flags: jnp.ndarray = None,  # (nG,) int32 per-group alive flags, or None
    idxT: jnp.ndarray = None,  # (nG*SUBL, 128) int32 corpus indices, or None
    ctxT: jnp.ndarray = None,  # (nG*W, SUBL, 128) int8 bonus-ctx plane
    *,
    W: int,
    n: int,
    max_typos: int = 0,
    scoring: Tuple[int, ...],
    unicode: bool = False,
    no_prefilter: bool = False,
    interpret: bool = False,
    int16_lanes: bool = False,
    idx_bits: int = 0,
    mode: str = "fuzzy",
    needle_byte_len: int = 0,
):
    """Transposed fused match over nG groups of SUBL*128 rows.

    Default mode returns (matched, score, exact, end_col, greedy) int32
    columns, each (nG*SUBL*128,), in row order b = g*SUBL*128 + s*128 +
    l (the order device_arrays_colstream packs). Needle length ``n`` and
    the typo budget are static (the serving batch groups queries by
    them).

    ``flags`` (when given) carries per-group stage-1 alive bits: a group
    whose flag is 0 is guaranteed (by the block-OR presence planes —
    corpus.device_arrays_colstream) to contain no stage-1 survivor, so
    the kernel writes zeros without running the DP. With content-
    clustered corpus ordering this skips the large majority of groups
    on real-data workloads.

    KEY-EMIT mode (``idxT`` given, with static ``idx_bits``): instead of
    five result columns the kernel emits the serving sort key SPLIT INTO
    int32 HALVES plus a matched column — (key_hi, key_lo, matched). The
    63-bit key is [0xFFFF - score | corpus index | meta16] (meta16 =
    exact<<15 | greedy<<14 | end_col), ascending order = (matched first,
    score desc, index asc); unmatched rows carry INT64_MAX halves. This
    removes ~10 per-row int64 ops from the serving scan body — on
    skip-heavy workloads the host-graph key packing cost more than the
    whole DP kernel."""
    subl = cpT.shape[1]
    nG = cpT.shape[0] // W
    T = min(int(max_typos), n)
    use_flags = flags is not None
    emit_keys = idxT is not None
    has_ctx = ctxT is not None and unicode
    n_out = 3 if emit_keys else 5

    def pack_keys(cols, idx):
        matched, score, exact, end_col, greedy = cols
        ok = (matched > 0) & (idx >= 0)
        meta16 = (
            (exact << 15) | (greedy << 14)
            | jnp.minimum(jnp.where(ok, end_col, 0), 0x3FFF)
        )
        meta16 = jnp.where(ok, meta16, 0)
        inv = jnp.where(ok, 0xFFFF - score, 0)
        idx_ok = jnp.where(ok, idx, 0)
        # place value v (width bits) at bit position pos of the 64-bit
        # key, across (hi, lo) int32 halves; positions are static
        hi = jnp.zeros_like(idx)
        lo = jnp.zeros_like(idx)

        def put(hi, lo, v, pos):
            if pos < 32:
                lo = lo | (v << pos)
                if pos > 0:
                    hi = hi | jax.lax.shift_right_logical(
                        v, jnp.int32(32 - pos)
                    )
            else:
                hi = hi | (v << (pos - 32))
            return hi, lo

        hi, lo = put(hi, lo, meta16, 0)
        hi, lo = put(hi, lo, idx_ok, 16)
        hi, lo = put(hi, lo, inv, 16 + idx_bits)
        hi = jnp.where(ok, hi, 0x7FFFFFFF)
        lo = jnp.where(ok, lo, -1)
        return hi, lo, ok.astype(jnp.int32)

    def body(scal_ref, cpT_ref, nu_ref, idx_ref, ctx_ref, outs, alive):
        @pl.when(alive)
        def _():
            if mode == "fuzzy":
                cols = _match_block(
                    scal_ref, cpT_ref, nu_ref[...], W, n, T, scoring,
                    unicode, no_prefilter,
                    int16_lanes=int16_lanes and not unicode,
                    ctx_ref=ctx_ref,
                )
            else:
                cols = _literal_block(
                    scal_ref, cpT_ref, nu_ref[...], W, n, mode,
                    needle_byte_len, scoring, unicode, ctx_ref=ctx_ref,
                )
            if emit_keys:
                cols = pack_keys(cols, idx_ref[...])
            for o, c in zip(outs, cols):
                o[...] = c

        @pl.when(jnp.logical_not(alive))
        def _():
            if emit_keys:
                outs[0][...] = jnp.full(
                    (subl, 128), 0x7FFFFFFF, jnp.int32
                )
                outs[1][...] = jnp.full((subl, 128), -1, jnp.int32)
                outs[2][...] = jnp.zeros((subl, 128), jnp.int32)
            else:
                for o in outs:
                    o[...] = jnp.zeros((subl, 128), jnp.int32)

    in_specs = [
        pl.BlockSpec((W, subl, 128), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((subl, 128), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [cpT, nuT]
    if emit_keys:
        in_specs.append(
            pl.BlockSpec((subl, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(idxT)
    if has_ctx:
        in_specs.append(
            pl.BlockSpec((W, subl, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(ctxT)

    # flags (when given) ride as a second scalar-prefetch operand; dead
    # groups skip the DP and write zeros/sentinels. The input index maps
    # stay IDENTITY: remapping dead groups' fetches to a previous live
    # index (to elide their DMAs) was measured SLOWER on interleaved
    # alive/dead patterns — it defeats the DMA double-buffer — and a
    # dead group's block DMA costs only ~1 us (the full corpus is
    # ~0.2 ms/query of HBM reads), so skipping compute is the whole win.
    # Without flags, scalars[0] = live row count: whole blocks past it
    # (compacted survivor tails) skip the DP and write zeros.
    def kernel(*refs):
        k = 1 + (1 if use_flags else 0)
        scal_ref = refs[0]
        flag_ref = refs[1] if use_flags else None
        cpT_ref, nu_ref = refs[k], refs[k + 1]
        k += 2
        idx_ref = None
        if emit_keys:
            idx_ref = refs[k]
            k += 1
        ctx_ref = None
        if has_ctx:
            ctx_ref = refs[k]
            k += 1
        outs = refs[k:]
        g = pl.program_id(0)
        alive = (g * subl * 128) < scal_ref[0]
        if use_flags:
            alive = alive & (flag_ref[g] > 0)
        body(scal_ref, cpT_ref, nu_ref, idx_ref, ctx_ref, outs, alive)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if use_flags else 1,
        grid=(nG,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((subl, 128), lambda i, *_: (i, 0))
            for _ in range(n_out)
        ],
    )
    prefetch = (
        (scalars, flags.astype(jnp.int32)) if use_flags else (scalars,)
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((nG * subl, 128), jnp.int32)
            for _ in range(n_out)
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(*prefetch, *operands)
    return tuple(o.reshape(-1) for o in outs)
