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
            rec("colstream_lanes", lanes=name, rows=B, width=W,
                error=repr(e)[:500])


if __name__ == "__main__":
    main()
