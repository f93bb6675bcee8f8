"""TPU probe round 2: fixed fetch-bandwidth probe, sort costs, scan/scatter
variants for the compaction path, gather variants (dtype view + sortedness
hints). Appends to benchmarks/probe_xla2.jsonl."""

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

    rec("env", backend=jax.default_backend())

    # --- host link, fresh array each fetch ---------------------------------
    def link():
        bump = jax.jit(lambda x, i: x + i)
        for mb in (0.0625, 0.25, 1.0, 4.0):
            n = int(mb * (1 << 20) // 4)
            x = jnp.arange(n, dtype=jnp.int32)
            x.block_until_ready()
            ts = []
            for i in range(5):
                y = bump(x, i)
                y.block_until_ready()
                t0 = time.perf_counter()
                np.asarray(y)
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            rec("fetch_fresh", mb=mb, seconds=dt, mb_per_s=mb / dt)

    guard(link)

    def timed_loop(make_step, x0, K=16, reps=3):
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

    rng = np.random.default_rng(0)

    # --- sorts --------------------------------------------------------------
    def sorts():
        for size in (8192, 65536, 131072, 262144, 1048576):
            key = jnp.asarray(
                rng.integers(0, 1 << 30, size, dtype=np.int32)
            )
            payload = key ^ 7

            def step(x, i, payload=payload):
                k, _p = jax.lax.sort((x ^ (i * 1000003), payload),
                                     num_keys=1)
                return k

            dt = timed_loop(step, key)
            rec("sort1key", size=size, seconds=dt)

    guard(sorts)

    # --- cumsum variants at 1M ----------------------------------------------
    def scans():
        x = jnp.asarray(rng.integers(0, 2, 1 << 20, dtype=np.int32))

        def step_cumsum(v, i):
            return jnp.cumsum(v ^ (i & 1))

        rec("cumsum_1m", seconds=timed_loop(step_cumsum, x))

        def step_assoc(v, i):
            return jax.lax.associative_scan(jnp.add, v ^ (i & 1))

        rec("assoc_scan_1m", seconds=timed_loop(step_assoc, x))

    guard(scans)

    # --- scatter (.at[].set) ------------------------------------------------
    def scatters():
        for size in (131072, 1 << 20):
            perm = jnp.asarray(
                rng.permutation(size).astype(np.int32)
            )
            iota = jnp.arange(size, dtype=jnp.int32)

            def step(p, i, iota=iota, size=size):
                out = jnp.zeros((size,), jnp.int32).at[p].set(iota)
                return p + (out[0] & 1)

            rec("scatter_set", size=size, seconds=timed_loop(step, perm))

    guard(scatters)

    # --- sort-based perm (stable two-key trick) ------------------------------
    def sort_perm():
        for size in (131072, 1 << 20):
            m = jnp.asarray(
                (rng.random(size) < 0.1).astype(np.int32)
            )
            iota = jnp.arange(size, dtype=jnp.int32)

            def step(x, i, iota=iota):
                k, perm = jax.lax.sort((1 - (x ^ (i & 1)), iota),
                                       num_keys=1, is_stable=True)
                return x + (perm[0] & 1)

            rec("sort_perm", size=size, seconds=timed_loop(step, m))

    guard(sort_perm)

    # --- gather variants ------------------------------------------------------
    def gathers():
        B = 1 << 20
        cp8 = jnp.asarray(rng.integers(0, 127, (B, 128), dtype=np.int8))
        cp32 = jnp.asarray(np.asarray(cp8).view(np.int32))  # (B, 32)
        cap = 131072
        idx_sorted = jnp.asarray(
            np.sort(rng.permutation(B)[:cap]).astype(np.int32)
        )

        def mk(src, sorted_flag):
            def step(ix, i, src=src, sorted_flag=sorted_flag):
                g = jnp.take(src, ix, axis=0,
                             indices_are_sorted=sorted_flag)
                return ix + (g[0, 0].astype(jnp.int32) & 1)

            return step

        rec("take_int8_sorted", rows=cap,
            seconds=timed_loop(mk(cp8, True), idx_sorted))
        rec("take_int32view_sorted", rows=cap,
            seconds=timed_loop(mk(cp32, True), idx_sorted))
        rec("take_int32view_unsorted_hintless", rows=cap,
            seconds=timed_loop(mk(cp32, False), idx_sorted))

        # gather of narrow arrays (results scatter-back scale)
        out8 = jnp.asarray(rng.integers(0, 9, (B, 8), dtype=np.int32))
        rec("take_b8_int32", rows=cap,
            seconds=timed_loop(mk(out8, True), idx_sorted))

    guard(gathers)


if __name__ == "__main__":
    main()
