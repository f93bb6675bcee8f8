"""Probe: single-operand int64 sort vs int32 variants for the P3 stage.

probe_topk.py showed two-operand (key, payload) sorts are ~8-25x slower
than single-operand key sorts on this backend. If a single int64 key
(score | index | meta packed into 63 bits) sorts anywhere near the int32
single-op rate, the whole P3 stage (and _select_sorted) can become one
single-operand sort with a free decode — no payload operand, no position
maps. This probe measures:

  i32_1op   — single-operand int32 sort (the floor)
  i64_1op   — single-operand int64 sort (the candidate)
  i32_2op   — (key, payload) int32 sort (what P3 does today)
  i32_1op_gather — int32 single-op sort + take_along_axis payload gather
                   (the pos-map alternative; needs idx-decode + 2 gathers
                   in real use, modeled here as one)

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

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import frizbee_tpu  # noqa: F401,E402  (persistent XLA cache)

FETCH = 6145


def timed(fn, *arrs, k1=2, k2=8, reps=3):
    """fn(carry, *arrs) -> carry; arrays ride as jit args (closure capture
    bakes them into the HLO and blows the remote-compile request size)."""
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


def chk(a):
    return jnp.sum(a[..., ::509].astype(jnp.int32), dtype=jnp.int32)


def main():
    rng = np.random.default_rng(0)
    for Q, T in ((32, 131072), (32, 1048576), (1, 131072)):
        key = jnp.asarray(
            rng.integers(-(1 << 30), 1 << 30, (Q, T), dtype=np.int32))
        pay = jnp.asarray(
            rng.integers(0, 1 << 30, (Q, T), dtype=np.int32))
        key64 = (key.astype(jnp.int64) << 20) | pay.astype(jnp.int64)
        assert key64.dtype == jnp.int64, (
            f"int64 unavailable ({key64.dtype}); run with JAX_ENABLE_X64=1"
        )

        def i32_1op(c, key):
            kk = jax.lax.sort(key ^ c, dimension=1, is_stable=False)
            return chk(kk)

        def i64_1op(c, key64):
            kk = jax.lax.sort(key64 ^ c.astype(jnp.int64), dimension=1,
                              is_stable=False)
            return chk(kk)

        def i32_2op(c, key, pay):
            kk, pp = jax.lax.sort((key ^ c, pay), dimension=1,
                                  num_keys=1, is_stable=False)
            return chk(kk) ^ chk(pp)

        def i32_1op_gather(c, key, pay):
            kk = jax.lax.sort(key ^ c, dimension=1, is_stable=False)
            f = min(FETCH, T)
            idx = (kk[:, :f] & 0xFFFFF) % T
            pv = jnp.take_along_axis(pay, idx, axis=1)
            return chk(kk) ^ chk(pv)

        row = {"shape": [Q, T],
               "i32_1op_ms": timed(i32_1op, key) * 1e3,
               "i64_1op_ms": timed(i64_1op, key64) * 1e3,
               "i32_2op_ms": timed(i32_2op, key, pay) * 1e3,
               "i32_1op_gather_ms": timed(i32_1op_gather, key, pay) * 1e3}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
