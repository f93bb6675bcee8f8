"""TPU probe round 3: batched sorts (the Q-amortized floors) and extended
-row gathers. Appends to benchmarks/probe_xla3.jsonl."""

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


def guard(fn):
    try:
        fn()
    except Exception as e:  # noqa: BLE001
        rec(fn.__name__, error=repr(e)[:300])


def main():
    import jax
    import jax.numpy as jnp
    import frizbee_tpu  # noqa: F401

    rng = np.random.default_rng(0)

    def timed_loop(make_step, x0, K=8, reps=3):
        @jax.jit
        def f(x):
            return jax.lax.fori_loop(0, K, lambda i, x: make_step(x, i), x)

        r = f(x0)
        jax.block_until_ready(r)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / K

    def batched_sorts():
        for q, size, ops in ((32, 1 << 20, 1), (32, 131072, 2),
                             (8, 1 << 20, 1), (32, 114688, 2)):
            key = jnp.asarray(
                rng.integers(0, 1 << 30, (q, size), dtype=np.int32)
            )
            if ops == 2:
                payload = key ^ 7

                def step(x, i, payload=payload):
                    k, _p = jax.lax.sort(
                        (x ^ (i * 1000003), payload), num_keys=1,
                        dimension=1,
                    )
                    return k
            else:
                def step(x, i):
                    return jax.lax.sort(x ^ (i * 1000003), dimension=1)

            dt = timed_loop(step, key)
            rec("batched_sort", q=q, size=size, operands=ops,
                seconds=dt, per_query=dt / q)

    guard(batched_sorts)

    def gathers():
        B = 1 << 20
        cpx = jnp.asarray(
            rng.integers(0, 127, (B, 136), dtype=np.int8)
        )
        for cap in (32768, 65536, 131072):
            idx = jnp.asarray(
                np.sort(rng.permutation(B)[:cap]).astype(np.int32)
            )

            def step(ix, i, cpx=cpx):
                g = jnp.take(cpx, ix, axis=0, indices_are_sorted=True)
                return ix + (g[0, 0].astype(jnp.int32) & 1)

            rec("take_ext136", rows=cap, seconds=timed_loop(step, idx))

    guard(gathers)

    def stage1_kernelish():
        # stage-1 presence via single fused formula, with packed key build
        B = 1 << 20
        mask = jnp.asarray(
            rng.integers(0, 1 << 31, (B, 4), dtype=np.int64).astype(np.int32)
        )
        needle = jnp.arange(16, dtype=jnp.int32) % 128

        def step(x, i):
            iota = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]
            miss = jnp.zeros((B,), jnp.int32)
            for k in range(8):
                v = (needle[k] + i) & 127
                w = v >> 5
                sel = jnp.zeros((B,), jnp.int32)
                for wi in range(4):
                    sel = jnp.where(w == wi, x[:, wi], sel)
                p1 = jax.lax.shift_right_logical(sel, v & 31) & 1
                v2 = (needle[k + 8] + i) & 127
                w2 = v2 >> 5
                sel2 = jnp.zeros((B,), jnp.int32)
                for wi in range(4):
                    sel2 = jnp.where(w2 == wi, x[:, wi], sel2)
                p2 = jax.lax.shift_right_logical(sel2, v2 & 31) & 1
                miss = miss + 1 - (p1 | p2)
            key = jnp.where(miss <= 0, iota, iota + (1 << 20))
            return x.at[0, 0].set(key[123] & 1)

        rec("stage1_key_1m_n8", seconds=timed_loop(step, mask))

    guard(stage1_kernelish)


if __name__ == "__main__":
    main()
