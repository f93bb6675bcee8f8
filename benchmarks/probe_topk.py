"""Probe: lax.top_k vs full lax.sort for the P3 result-selection stage.

Serving fetches only the best `fetch_rows` (~2k) rows per query out of
B up to 10M candidates; today P3 pays a full (Q, total) sort. This probe
times, on the real device:

  sort2    — two-operand (key, payload) full sort over (Q, T)
  sort1    — single-operand key sort over (Q, T)
  topk     — lax.top_k(key, k) + payload gather over (Q, T)
  sortT/topkT — single (T,) one-shot variants (device_sort row shape)

Methodology (CLAUDE.md): K iterations inside one jitted fori_loop with a
fold-proof carry (output checksum written back into the input), ONE fetch,
and two K values so the host-link RTT cancels:
t = (T(K2) - T(K1)) / (K2 - K1).
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import frizbee_tpu  # noqa: F401,E402  (persistent XLA cache)


def timed(make_step, x0, k1=2, k2=10, reps=3):
    def loop(K):
        @jax.jit
        def f(x):
            return jax.lax.fori_loop(
                0, K, lambda i, x: make_step(x, i), x)

        np.asarray(f(x0))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(x0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (loop(k2) - loop(k1)) / (k2 - k1)


def chk(a):
    return jnp.sum(a[..., ::509].astype(jnp.int32), dtype=jnp.int32)


def main():
    rng = np.random.default_rng(0)
    Q, K = 32, 2049
    for T in (65_536, 1_048_576):
        key = jnp.asarray(
            rng.integers(-(1 << 30), 1 << 30, (Q, T), dtype=np.int32))
        pay = jnp.asarray(rng.integers(0, 1 << 30, (Q, T), dtype=np.int32))

        def sort2(x, i, pay=pay):
            kk, pp = jax.lax.sort((x, pay), dimension=1, num_keys=1,
                                  is_stable=False)
            return x.at[0, 0].set(chk(kk) ^ chk(pp))

        def sort1(x, i):
            kk = jax.lax.sort(x, dimension=1, is_stable=False)
            return x.at[0, 0].set(chk(kk))

        def topk(x, i, pay=pay):
            vals, idx = jax.lax.top_k(-x, K)
            pv = jnp.take_along_axis(pay, idx, axis=1)
            return x.at[0, 0].set(chk(vals) ^ chk(pv))

        row = {"shape": [Q, T],
               "sort2_ms": timed(sort2, key) * 1e3,
               "sort1_ms": timed(sort1, key) * 1e3,
               "topk_ms": timed(topk, key) * 1e3}
        print(json.dumps(row), flush=True)

    for T in (100_000, 1_000_000):
        key1 = jnp.asarray(
            rng.integers(-(1 << 30), 1 << 30, T, dtype=np.int32))
        pay1 = jnp.asarray(rng.integers(0, 1 << 30, T, dtype=np.int32))

        def sortT(x, i, pay=pay1):
            kk, pp = jax.lax.sort((x, pay), num_keys=1, is_stable=False)
            return x.at[0].set(chk(kk) ^ chk(pp))

        def topkT(x, i, pay=pay1):
            vals, idx = jax.lax.top_k(-x, 2048)
            pv = jnp.take(pay, idx)
            return x.at[0].set(chk(vals) ^ chk(pv))

        row = {"shape": [T],
               "sortT_ms": timed(sortT, key1) * 1e3,
               "topkT_ms": timed(topkT, key1) * 1e3}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
