"""Sanity-check probe_transposed: correctness vs a NumPy DP and timing
linearity in K (to catch folded/hoisted work masquerading as speed)."""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import frizbee_tpu  # noqa: F401,E402
from frizbee_tpu.ops import kernels  # noqa: E402
from probe_transposed import SUBL, make_transposed  # noqa: E402


def numpy_ref(hay, needle):
    """Same simplified recurrence as the probe kernel, scalar NumPy."""
    B, W = hay.shape
    n = len(needle)
    best = np.zeros(B, np.int64)
    for b in range(B):
        prev = np.zeros(n, np.int64)   # prev column, per k
        srow = np.zeros(n, np.int64)
        for j in range(W):
            diag_in = 0
            new_prev = np.zeros(n, np.int64)
            new_srow = np.zeros(n, np.int64)
            for k in range(n):
                occ = hay[b, j] == needle[k]
                diag = diag_in + 12 if occ else max(diag_in - 6, 0)
                up = max(prev[k] - 1, 0)
                cur = max(diag, up)
                left = max(srow[k] - 1, cur)
                best[b] = max(best[b], cur)
                diag_in = prev[k]
                new_prev[k] = cur
                new_srow[k] = left
            prev, srow = new_prev, new_srow
    return best


def main():
    rng = np.random.default_rng(0)
    n = 8
    needle = rng.integers(97, 123, n, dtype=np.int32)
    needle_packed = jnp.asarray(np.concatenate([needle, needle]))

    # correctness at small B
    W, B = 64, SUBL * 128 * 2
    hay = rng.integers(97, 123, (B, W), dtype=np.int8)
    cpT = jnp.asarray(
        np.ascontiguousarray(
            hay.astype(np.int32)
            .reshape(B // (SUBL * 128), SUBL, 128, W)
            .transpose(0, 3, 1, 2)
        ).reshape(-1, SUBL, 128)
    )
    scal = kernels.pack_needle_scalars(needle_packed, B)
    run_t = make_transposed(W, n, B)

    # run the kernel once, pull the per-row best (patch: expose raw out)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel_raw(scal_ref, cpT_ref, out_ref):
        def jbody(j, carry):
            prev = carry[:n]
            srow = carry[n:2 * n]
            best = carry[2 * n]
            hayv = cpT_ref[j]
            diag_in = jnp.zeros((SUBL, 128), jnp.int32)
            new_prev, new_srow = [], []
            for k in range(n):
                nv = scal_ref[2 + k]
                occ = hayv == nv
                diag = jnp.where(
                    occ, diag_in + 12, jnp.maximum(diag_in - 6, 0))
                up = jnp.maximum(prev[k] - 1, 0)
                cur = jnp.maximum(diag, up)
                left = jnp.maximum(srow[k] - 1, cur)
                best = jnp.maximum(best, cur)
                diag_in = prev[k]
                new_prev.append(cur)
                new_srow.append(left)
            return (*new_prev, *new_srow, best)

        z = jnp.zeros((SUBL, 128), jnp.int32)
        out = jax.lax.fori_loop(0, W, jbody, tuple(z for _ in range(2 * n + 1)))
        out_ref[...] = out[2 * n]

    grid = B // (SUBL * 128)
    out = pl.pallas_call(
        kernel_raw,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec((W, SUBL, 128), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((SUBL, 128), lambda i, *_: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((grid * SUBL, 128), jnp.int32),
    )(scal, cpT)
    got = np.asarray(out).reshape(B)
    want = numpy_ref(hay, needle)
    ok = bool(np.array_equal(got.astype(np.int64), want))
    print(json.dumps({"correct": ok,
                      "mismatches": int(np.sum(got != want))}), flush=True)

    # timing linearity at W=128, B=131072
    W, B = 128, 131072
    hay = rng.integers(97, 123, (B, W), dtype=np.int8)
    cpT = jnp.asarray(
        np.ascontiguousarray(
            hay.astype(np.int32)
            .reshape(B // (SUBL * 128), SUBL, 128, W)
            .transpose(0, 3, 1, 2)
        ).reshape(-1, SUBL, 128)
    )
    run_t = make_transposed(W, n, B)
    scal = kernels.pack_needle_scalars(needle_packed, B)

    for K in (4, 16, 64):
        @jax.jit
        def f(c, cpT, scal, K=K):
            return jax.lax.fori_loop(
                0, K, lambda i, c: run_t(cpT, scal + i, c), c)

        np.asarray(f(jnp.int32(0), cpT, scal))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(jnp.int32(0), cpT, scal))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        print(json.dumps({"K": K, "total_ms": t * 1e3,
                          "per_iter_ms": t * 1e3 / K}), flush=True)


if __name__ == "__main__":
    main()
