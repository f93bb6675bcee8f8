"""TPU probes (XLA only, no Mosaic): host link bandwidth, device sort cost
at candidate capacities, gather/compaction cost, cumsum cost.

Informs the round-2 redesign (capacity-branched sort of matched rows,
fetch-row packing, stage-1 compaction). Appends JSON lines to
benchmarks/probe_xla.jsonl. Each probe is wrapped so a flaky backend error
(see CLAUDE.md) skips one probe, not the run.
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


def guard(fn):
    try:
        fn()
    except Exception as e:  # noqa: BLE001
        rec(fn.__name__, error=repr(e)[:300])


def main():
    import jax
    import jax.numpy as jnp
    import frizbee_tpu  # noqa: F401  (enables the persistent XLA cache)

    rec("env", backend=jax.default_backend(), jax=jax.__version__)

    # --- host link: fetch bandwidth at several sizes -----------------------
    def link():
        for mb in (0.25, 1.0, 4.0, 16.0):
            n = int(mb * (1 << 20) // 4)
            x = jnp.arange(n, dtype=jnp.int32)
            x.block_until_ready()
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                np.asarray(x)
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            rec("fetch", mb=mb, seconds=dt, mb_per_s=mb / dt)

    guard(link)

    def link_async():
        # Four 1MB arrays fetched via copy_to_host_async: do transfers
        # pipeline?
        xs = [jnp.arange((1 << 18), dtype=jnp.int32) + i for i in range(4)]
        for x in xs:
            x.block_until_ready()
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            for x in xs:
                x.copy_to_host_async()
            outs = [np.asarray(x) for x in xs]
            ts.append(time.perf_counter() - t0)
        del outs
        dt = float(np.median(ts))
        rec("fetch_async4x1mb", seconds=dt, mb_per_s=4.0 / dt)

    guard(link_async)

    # --- device timing helper: K reps inside one jit, fold-proof dep ------
    def timed_loop(make_step, x0, K=32, reps=3):
        @jax.jit
        def f(x):
            def body(i, x):
                return make_step(x, i)

            return jax.lax.fori_loop(0, K, body, x)

        r = f(x0)
        jax.block_until_ready(r)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / K

    # --- device sort at candidate capacities -------------------------------
    def sorts():
        for size in (8192, 65536, 262144, 1048576):
            key = jnp.asarray(
                np.random.default_rng(0).integers(
                    0, 1 << 30, size, dtype=np.int32
                )
            )
            payload = key ^ 7

            def step(x, i, payload=payload):
                k, p = jax.lax.sort((x ^ (i * 2654435761), payload),
                                    num_keys=1)
                return k

            dt = timed_loop(step, key)
            rec("sort1key", size=size, seconds_per_sort=dt)

    guard(sorts)

    # --- row gather (compaction) at 1M x 128 int8 --------------------------
    def gathers():
        rng = np.random.default_rng(0)
        cp = jnp.asarray(
            rng.integers(0, 127, (1 << 20, 128), dtype=np.int8)
        )
        for cap in (32768, 131072, 524288):
            perm = jnp.asarray(
                rng.permutation(1 << 20)[:cap].astype(np.int32)
            )

            def step(x, i, cp=cp, cap=cap):
                g = jnp.take(cp, (x + i) % (1 << 20), axis=0)
                return x + g[0, 0].astype(jnp.int32)

            dt = timed_loop(step, perm)
            rec("gather_rows", rows=cap, width=128, seconds=dt)

    guard(gathers)

    # --- cumsum + scatter (stable partition) over 1M -----------------------
    def partition():
        m = jnp.asarray(
            (np.random.default_rng(0).random(1 << 20) < 0.1).astype(np.int32)
        )

        def step(x, i):
            mm = x ^ (i & 1)
            cs = jnp.cumsum(mm)
            iota = jnp.arange(1 << 20, dtype=jnp.int32)
            pos = jnp.where(mm > 0, cs - 1, cs[-1] + iota - cs)
            perm = jnp.zeros((1 << 20,), jnp.int32).at[pos].set(iota)
            return x + (perm[0] & 1)

        dt = timed_loop(step, m)
        rec("partition_1m", seconds=dt)

    guard(partition)

    # --- stage-1 presence op over 1M x 4 mask words -------------------------
    def stage1():
        mask = jnp.asarray(
            np.random.default_rng(0).integers(
                0, 1 << 31, (1 << 20, 4), dtype=np.int64
            ).astype(np.int32)
        )
        needle = jnp.arange(8, dtype=jnp.int32) + 97

        def step(x, i):
            miss = jnp.zeros((1 << 20,), jnp.int32)
            for k in range(8):
                v = (needle[k] + i) & 127
                w = v >> 5
                sel = jnp.zeros((1 << 20,), jnp.int32)
                for wi in range(4):
                    sel = jnp.where(w == wi, x[:, wi], sel)
                present = (sel >> (v & 31)) & 1
                miss = miss + 1 - present
            s1 = miss <= 0
            return x.at[0, 0].set(jnp.sum(s1.astype(jnp.int32)) & 1)

        dt = timed_loop(step, mask)
        rec("stage1_presence_1m_n8", seconds=dt)

    guard(stage1)


if __name__ == "__main__":
    main()
