"""Probe: transposed (column-stream) DP layout vs the current kernel.

The current fused kernel (ops/kernels.py) lays lanes = haystack units and
pays ~2 log2(W) cross-lane shift ops per needle unit for the gap scan.
A transposed layout — lanes AND sublanes = haystacks, sequential fori_loop
over haystack units — makes the scan dependency free (it rides the loop)
at ~8 single-vreg ops per (unit, needle-pos) cell over 4096 rows held in
registers.

This probe times simplified inner loops of both layouts on the real
device at matched workloads (same rows x width x needle) to decide
whether the rewrite is worth it. Simplifications: no prefilter, no
window, no bonus context — just the affine-gap recurrence + occ compares,
which dominate the DP rows (all_match / all_scores profiles).

Methodology (CLAUDE.md): K iterations inside one jit with a fold-proof
carry, one fetch, two K values so dispatch/RTT cancels.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import frizbee_tpu  # noqa: F401,E402  (persistent XLA cache)
from frizbee_tpu.ops import kernels  # noqa: E402


def timed(fn, *arrs, k1=2, k2=8, reps=3):
    """fn(carry, *arrs) -> carry. Arrays ride as jit args (closure
    capture would bake them into the HLO and blow the remote-compile
    request limit)."""
    def loop(K):
        @jax.jit
        def f(c, *arrs):
            return jax.lax.fori_loop(0, K, lambda i, c: fn(c, *arrs), c)

        np.asarray(f(jnp.int32(0), *arrs))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(jnp.int32(0), *arrs))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (loop(k2) - loop(k1)) / (k2 - k1)


SUBL = 32  # haystack sublane-tile rows per vector group (4 vregs live)


def make_transposed(W, n, B, interpret=False):
    """cpT blocks: (W, SUBL, 128) int32 — unit-major, SUBL*128 rows/block."""

    def kernel(scal_ref, cpT_ref, out_ref):
        def jbody(j, carry):
            # carry: (prev[k] tuple, srow[k] tuple, best) — all (SUBL, 128)
            prev = carry[:n]
            srow = carry[n:2 * n]
            best = carry[2 * n]
            hay = cpT_ref[j]  # (SUBL, 128)
            diag_in = jnp.zeros((SUBL, 128), jnp.int32)
            new_prev, new_srow = [], []
            for k in range(n):
                nv = scal_ref[2 + k]
                occ = hay == nv
                diag = jnp.where(
                    occ, diag_in + 12, jnp.maximum(diag_in - 6, 0)
                )
                up = jnp.maximum(prev[k] - 1, 0)
                cur = jnp.maximum(diag, up)
                left = jnp.maximum(srow[k] - 1, cur)
                best = jnp.maximum(best, cur)
                diag_in = prev[k]
                new_prev.append(cur)
                new_srow.append(left)
            return (*new_prev, *new_srow, best)

        z = jnp.zeros((SUBL, 128), jnp.int32)
        init = tuple(z for _ in range(2 * n + 1))
        out = jax.lax.fori_loop(0, W, jbody, init)
        out_ref[...] = out[2 * n]

    grid = B // (SUBL * 128)

    def run(cpT, scal, carry):
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((W, SUBL, 128), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((SUBL, 128), lambda i, *_: (i, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((grid * SUBL, 128), jnp.int32),
            interpret=interpret,
        )(scal + (carry & 1), cpT)
        return jnp.sum(out, dtype=jnp.int32) & 0x7FFFFFFF

    return run


def main():
    rng = np.random.default_rng(0)
    n = 8
    needle = rng.integers(97, 123, n, dtype=np.int32)
    needle_packed = jnp.asarray(np.concatenate([needle, needle]))
    for W, B in ((64, 262144), (128, 131072), (128, 1048576)):
        hay = rng.integers(97, 123, (B, W), dtype=np.int8)
        cp = jnp.asarray(hay)
        nu = jnp.full((B, 1), W, jnp.int32)
        scal = kernels.pack_needle_scalars(needle_packed, B)

        def run_current(carry, cp, nu):
            out = kernels.match_units(
                cp, nu,
                kernels.pack_needle_scalars(
                    needle_packed + (carry & 1), cp.shape[0]),
                max_typos=0, no_prefilter=True, interpret=False,
            )
            return jnp.sum(out[:, 1], dtype=jnp.int32) & 0x7FFFFFFF

        cur_s = timed(run_current, cp, nu)

        # unit-major blocks: row-group g's unit j at cpT[g*W + j]
        cpT = jnp.asarray(
            np.ascontiguousarray(
                hay.astype(np.int32)
                .reshape(B // (SUBL * 128), SUBL, 128, W)
                .transpose(0, 3, 1, 2)
            ).reshape(-1, SUBL, 128)
        )
        run_t = make_transposed(W, n, B)
        tr_s = timed(lambda c, cpT, scal: run_t(cpT, scal, c), cpT, scal)

        print(json.dumps({
            "W": W, "B": B, "n": n,
            "current_ms": cur_s * 1e3,
            "transposed_ms": tr_s * 1e3,
            "speedup": cur_s / tr_s,
            "current_rows_per_s": B / cur_s,
            "transposed_rows_per_s": B / tr_s,
        }), flush=True)


if __name__ == "__main__":
    main()
