"""Does Mosaic lower the int16-lane colstream kernel, and is it faster?

VERDICT r3 #5: the row-major kernel's int16 path is blocked by Mosaic
(cross-lane rotates/reductions); the colstream kernel's element-wise
column loop may dodge those gaps. This probe compiles both lane widths
on the real TPU and times them with K-iteration marginal timing (a
fold-proof cpT perturbation carries the dependency, per CLAUDE.md).

Appends results to benchmarks/probe_colstream_int16.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = __file__.replace(".py", ".jsonl")


def rec(name, **kw):
    line = json.dumps({"probe": name, **kw})
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    import jax
    import jax.numpy as jnp

    from frizbee_tpu.ops import colstream
    from frizbee_tpu.ops.kernels import DEFAULT_SCORING, pack_needle_scalars

    GR = colstream.SUBL * 128
    W = 128
    B = 512 * 1024  # half a chromium-scale bucket
    rng = np.random.default_rng(5)
    cp = rng.integers(97, 123, (B, W)).astype(np.int32)
    nu = rng.integers(64, W + 1, B).astype(np.int32)
    cp = np.where(np.arange(W)[None, :] < nu[:, None], cp, 0)
    nG = B // GR
    cpT = jnp.asarray(
        np.ascontiguousarray(
            cp.reshape(nG, colstream.SUBL, 128, W).transpose(0, 3, 1, 2)
        ).reshape(nG * W, colstream.SUBL, 128).astype(np.int8)
    )
    nuT = jnp.asarray(nu.reshape(nG * colstream.SUBL, 128))
    needle = np.array([ord(c) for c in "linux"], np.int32)
    npk = jnp.asarray(np.concatenate([needle, needle - 32]))
    scal = pack_needle_scalars(npk, B)

    def timed(int16_lanes, K):
        @jax.jit
        def f(cpT_in):
            acc = jnp.int32(0)
            cur = cpT_in
            for _ in range(K):
                m, s, e, ec, g = colstream.match_units_colstream(
                    cur, nuT, scal, W=W, n=len(needle), max_typos=0,
                    scoring=DEFAULT_SCORING, unicode=False,
                    no_prefilter=False, int16_lanes=int16_lanes,
                )
                acc = acc ^ s[0]
                # fold-proof dependency: next iteration's corpus depends
                # on this iteration's result
                cur = cur.at[0, 0, 0].set((acc & 1).astype(cur.dtype))
            return acc

        np.asarray(f(cpT))  # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(cpT))
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))

    for name, flag in (("int32", False), ("int16", True)):
        try:
            t1 = timed(flag, 1)
            t9 = timed(flag, 9)
            per = (t9 - t1) / 8
            rec("colstream_lanes", lanes=name, rows=B, width=W,
                seconds_per_pass=per,
                rows_per_sec=round(B / per) if per > 0 else None)
        except Exception as e:  # noqa: BLE001 — lowering failure is the result
            msg = [ln for ln in str(e).splitlines() if "Mosaic" in ln]
            rec("colstream_lanes", lanes=name, rows=B, width=W,
                error=(msg[0][-300:] if msg else repr(e)[:300]))

    # Per-op bisect: which 16-bit vector ops does this target lower at
    # all? (The DP kernel is compare/max-heavy — if those fail, 16-bit
    # lanes are off the table regardless of kernel structure.)
    from jax.experimental import pallas as pl

    for dtype, dname in ((jnp.int16, "i16"), (jnp.bfloat16, "bf16")):
        x = jnp.asarray(np.arange(8 * 128).reshape(8, 128) % 251, dtype)
        y = jnp.asarray(
            (np.arange(8 * 128).reshape(8, 128) * 7) % 251, dtype
        )
        ops = {
            "eq_select": lambda a, b: jnp.where(a == b, a, b),
            "gt_select": lambda a, b: jnp.where(a > b, a, b),
            "add": lambda a, b: a + b,
            "max": lambda a, b: jnp.maximum(a, b),
        }
        if dtype == jnp.int16:
            ops["shl"] = lambda a, b: a << 1
        for opname, fn in ops.items():
            def kern(xr, yr, o, fn=fn):
                o[...] = fn(xr[...], yr[...]).astype(dtype)

            try:
                out = pl.pallas_call(
                    kern, out_shape=jax.ShapeDtypeStruct((8, 128), dtype)
                )(x, y)
                jax.block_until_ready(out)
                rec("lane16_op", dtype=dname, op=opname, ok=True)
            except Exception as e:  # noqa: BLE001
                msg = [ln for ln in str(e).splitlines() if "Mosaic" in ln]
                rec("lane16_op", dtype=dname, op=opname, ok=False,
                    error=(msg[0][-160:] if msg else repr(e)[:160]))


if __name__ == "__main__":
    main()
