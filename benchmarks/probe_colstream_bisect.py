"""Bisect which colstream kernel feature crashes the TPU compiler.

Stages build up from the known-good simple probe kernel to the full
kernel; each stage compiles + runs a tiny shape and prints ok/fail.
"""

import json
import os
import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import frizbee_tpu  # noqa: F401,E402
from frizbee_tpu.ops import colstream  # noqa: E402
from frizbee_tpu.ops.kernels import pack_needle_scalars  # noqa: E402

SUBL = colstream.SUBL
GR = SUBL * 128
W, n = 64, 8
B = 2 * GR
rng = np.random.default_rng(0)
cp = (rng.integers(97, 103, (B, W)).astype(np.int32))
nu = rng.integers(0, W + 1, B).astype(np.int32)
nG = B // GR
cpT = jnp.asarray(np.ascontiguousarray(
    cp.reshape(nG, SUBL, 128, W).transpose(0, 3, 1, 2)
).reshape(nG * W, SUBL, 128))
nuT = jnp.asarray(nu.reshape(-1, 128))
needle = rng.integers(97, 103, n).astype(np.int32)
scal = pack_needle_scalars(
    jnp.asarray(np.concatenate([needle, needle - 32])), B)


def run(kernel, n_out):
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nG,),
            in_specs=[
                pl.BlockSpec((W, SUBL, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUBL, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((SUBL, 128), lambda i, *_: (i, 0))
                       for _ in range(n_out)],
        ),
        out_shape=[jax.ShapeDtypeStruct((nG * SUBL, 128), jnp.int32)
                   for _ in range(n_out)],
        interpret=False,
    )(scal, cpT, nuT)
    return [np.asarray(o) for o in out]


def stage_a(scal_ref, cpT_ref, nu_ref, *outs):
    """Simple SW recurrence (the known-good probe shape) + nu + 5 outs."""
    nuv = nu_ref[...]
    z = jnp.zeros((SUBL, 128), jnp.int32)

    def jbody(j, c):
        h = list(c[:n])
        best = c[n]
        hay = cpT_ref[j]
        valid = nuv > j
        diag_in = z
        for k in range(n):
            occ = valid & (hay == scal_ref[2 + k])
            diag = jnp.where(occ, diag_in + 12, jnp.maximum(diag_in - 6, 0))
            cur = jnp.maximum(diag, jnp.maximum(h[k] - 1, 0))
            diag_in = h[k]
            h[k] = cur
        best = jnp.maximum(best, h[n - 1])
        return (*h, best)

    out = jax.lax.fori_loop(0, W, jbody, tuple(z for _ in range(n + 1)))
    for i, o in enumerate(outs):
        o[...] = out[n] + i


def stage_b(scal_ref, cpT_ref, nu_ref, *outs):
    """Full SW pass (bonus/window consts trivial) — no prefilter pass."""
    nuv = nu_ref[...]
    z = jnp.zeros((SUBL, 128), jnp.int32)
    wstart = z
    wend = jnp.minimum(nuv, W)
    nb = wend
    include_exact = (wstart == 0) & (wend == nb)
    include_prefix = wstart == 0

    def sw_body(j, c):
        (h_t, mm_bits, boff, prev_last, seen_first, best, end_b, neq) = c
        h = list(h_t)
        hay = cpT_ref[j]
        valid = nuv > j
        first = jnp.where(valid, hay, 0)
        last = first
        blen = valid.astype(jnp.int32)
        active = valid & (boff >= wstart) & (boff + blen <= wend)
        is_first = active & (seen_first == 0)
        seen_first = seen_first | active.astype(jnp.int32)
        pb = jnp.where(valid, prev_last, -1)
        is_upper = (first >= 0x41) & (first <= 0x5A)
        prev_lower = (pb >= 0x61) & (pb <= 0x7A)

        def delim(b):
            letter = (
                ((b >= 0x41) & (b <= 0x5A)) | ((b >= 0x61) & (b <= 0x7A))
            )
            digit = (b >= 0x30) & (b <= 0x39)
            return (b >= 0) & (b <= 127) & ~letter & ~digit

        cap_mask = is_upper & prev_lower & ~is_first
        delim_mask = delim(pb) & ~delim(first) & ~is_first
        bonus = (
            jnp.where(cap_mask, 4, 0)
            + jnp.where(delim_mask, 4, 0)
            + jnp.where(is_first & include_prefix, 12, 0)
        )
        diag_in = z
        up_src = z
        mm_prev = jnp.zeros((SUBL, 128), jnp.bool_)
        mm_new = z
        for k in range(n):
            occ = active & (
                (hay == scal_ref[2 + k]) | (hay == scal_ref[2 + 64 + k])
            )
            exactc = active & (hay == scal_ref[2 + k])
            diag = jnp.where(
                occ, diag_in + 12 + bonus + jnp.where(exactc, 4, 0),
                jnp.maximum(diag_in - 6, 0),
            )
            up = jnp.maximum(
                up_src - 1 - jnp.where(mm_prev, 4, 0), 0)
            left = h[k] - 1 - jnp.where(((mm_bits >> k) & 1) > 0, 4, 0)
            cur = jnp.maximum(jnp.maximum(diag, up), left)
            diag_in = h[k]
            up_src = cur
            mm_prev = occ
            h[k] = cur
            mm_new = mm_new | (occ.astype(jnp.int32) << k)
            if k == n - 1:
                masked = jnp.where(active, cur, 0)
                upd = masked > best
                end_b = jnp.where(upd, boff, end_b)
                best = jnp.maximum(best, masked)
        nv_j = scal_ref[2 + jnp.minimum(j, 63)]
        gate = jnp.where(j < n, 1, 0)
        neq = neq | ((hay != nv_j).astype(jnp.int32) & gate)
        return (tuple(h), mm_new, boff + blen, last, seen_first,
                best, end_b, neq)

    h0 = tuple(z for _ in range(n))
    init = (h0, z, z, jnp.full((SUBL, 128), -1, jnp.int32), z, z, z, z)
    out = jax.lax.fori_loop(0, W, sw_body, init)
    best, end_b, neq = out[5], out[6], out[7]
    score = jnp.maximum(best, 0)
    exact = include_exact & (nuv == n) & (neq == 0)
    cols = (jnp.ones((SUBL, 128), jnp.int32), score,
            exact.astype(jnp.int32),
            jnp.where(score > 0, end_b, wstart), z)
    for o, c in zip(outs, cols):
        o[...] = c


def stage_c(scal_ref, cpT_ref, nu_ref, *outs):
    """Prefilter T=0 pass alone + trivial outputs."""
    nuv = nu_ref[...]
    z = jnp.zeros((SUBL, 128), jnp.int32)

    def pf_body(j, c):
        (np_, nb, boff, fstart, ffound, e_u, e_found) = c
        hay = cpT_ref[j]
        valid = nuv > j
        blen = valid.astype(jnp.int32)
        occ_np = jnp.zeros((SUBL, 128), jnp.bool_)
        hit0 = occ_last = None
        for k in range(n):
            occ_k = valid & (
                (hay == scal_ref[2 + k]) | (hay == scal_ref[2 + 64 + k])
            )
            occ_np = occ_np | ((np_ == k) & occ_k)
            if k == 0:
                hit0 = occ_k
            if k == n - 1:
                occ_last = occ_k
        fstart = jnp.where((ffound > 0) | ~hit0, fstart, boff)
        ffound = ffound | hit0.astype(jnp.int32)
        np2 = np_ + occ_np.astype(jnp.int32)
        done = np2 >= n
        tail = occ_last & done
        e_u = jnp.where(tail, boff + blen, e_u)
        e_found = e_found | tail.astype(jnp.int32)
        return (np2, nb + blen, boff + blen, fstart, ffound, e_u, e_found)

    out = jax.lax.fori_loop(0, W, pf_body, (z, z, z, z, z, z, z))
    cols = ((out[0] >= n).astype(jnp.int32), out[1], out[3], out[5], out[6])
    for o, c in zip(outs, cols):
        o[...] = c


def main():
    for name, kern in (("a_simple+outs", stage_a),
                       ("b_full_sw", stage_b),
                       ("c_pf_t0", stage_c)):
        try:
            run(kern, 5)
            print(json.dumps({"stage": name, "ok": True}), flush=True)
        except Exception as e:  # noqa: BLE001
            msg = repr(e)
            print(json.dumps({"stage": name, "ok": False,
                              "err": msg[:300]}), flush=True)
    # full kernel last
    try:
        colstream.match_units_colstream(
            cpT, nuT, scal, W=W, n=n, max_typos=0,
            scoring=(12, 6, 5, 1, 12, 4, 4, 8, 4), unicode=False,
            no_prefilter=False, interpret=False)
        print(json.dumps({"stage": "full", "ok": True}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"stage": "full", "ok": False,
                          "err": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()


def stage_c1(scal_ref, cpT_ref, nu_ref, *outs):
    """pf without the (np_ == k) advance chain."""
    nuv = nu_ref[...]
    z = jnp.zeros((SUBL, 128), jnp.int32)

    def pf_body(j, c):
        (np_, nb, boff, fstart, ffound, e_u, e_found) = c
        hay = cpT_ref[j]
        valid = nuv > j
        blen = valid.astype(jnp.int32)
        hit0 = occ_last = None
        acc = jnp.zeros((SUBL, 128), jnp.bool_)
        for k in range(n):
            occ_k = valid & (
                (hay == scal_ref[2 + k]) | (hay == scal_ref[2 + 64 + k])
            )
            acc = acc | occ_k
            if k == 0:
                hit0 = occ_k
            if k == n - 1:
                occ_last = occ_k
        fstart = jnp.where((ffound > 0) | ~hit0, fstart, boff)
        ffound = ffound | hit0.astype(jnp.int32)
        np2 = np_ + acc.astype(jnp.int32)
        done = np2 >= n
        tail = occ_last & done
        e_u = jnp.where(tail, boff + blen, e_u)
        e_found = e_found | tail.astype(jnp.int32)
        return (np2, nb + blen, boff + blen, fstart, ffound, e_u, e_found)

    out = jax.lax.fori_loop(0, W, pf_body, (z, z, z, z, z, z, z))
    cols = ((out[0] >= n).astype(jnp.int32), out[1], out[3], out[5], out[6])
    for o, c in zip(outs, cols):
        o[...] = c


def stage_c2(scal_ref, cpT_ref, nu_ref, *outs):
    """pf with ONLY the (np_ == k) advance chain (no window tracking)."""
    nuv = nu_ref[...]
    z = jnp.zeros((SUBL, 128), jnp.int32)

    def pf_body(j, c):
        (np_, nb) = c
        hay = cpT_ref[j]
        valid = nuv > j
        occ_np = jnp.zeros((SUBL, 128), jnp.bool_)
        for k in range(n):
            occ_k = valid & (
                (hay == scal_ref[2 + k]) | (hay == scal_ref[2 + 64 + k])
            )
            occ_np = occ_np | ((np_ == k) & occ_k)
        np2 = np_ + occ_np.astype(jnp.int32)
        return (np2, nb + valid.astype(jnp.int32))

    out = jax.lax.fori_loop(0, W, pf_body, (z, z))
    cols = ((out[0] >= n).astype(jnp.int32), out[1], z, z, z)
    for o, c in zip(outs, cols):
        o[...] = c


def main2():
    for name, kern in (("c1_no_advance", stage_c1),
                       ("c2_only_advance", stage_c2)):
        try:
            run(kern, 5)
            print(json.dumps({"stage": name, "ok": True}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"stage": name, "ok": False,
                              "err": repr(e)[:2000]}), flush=True)


if __name__ == "__main__":
    main2()
