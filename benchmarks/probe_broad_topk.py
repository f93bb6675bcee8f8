"""Probe: EXACT block-min tournament selection for the broad-needle
result sort (the arabic bottleneck: a full (Q, T) int64 sort at
1.7 ms/q vs a 0.5 ns/row kernel; exact lax.top_k is slower than the
sort and approx_max_k measured slower still / unverifiable —
probe_topk.jsonl, probe_approx_topk.out).

The tournament (fully exact, no fallback):

  1. block-min: reduce the (Q, T) int64 keys over R-slot blocks
     -> (Q, T/R) minima. Each minimum IS some row's key (unique —
     keys embed the row index), so the S-th smallest block-min is >=
     the S-th smallest row key for any S. Hence the top-S rows (by
     full key) all live in the S blocks with smallest minima: a row r
     of the true top-S has key(r) <= r_S <= bm_S, so its block's min
     is <= bm_S, putting that block in the first S of the block-min
     order. Uniqueness of minima makes the selection unambiguous.
  2. a tiny 2-op sort of (block_min, block_pos) picks those S = fetch
     block positions per query.
  3. ONE Pallas row-DMA gather (narrow-tile variant of
     colstream.block_gather — XLA's own batched block gather faults
     the TPU worker, round-4 repro) pulls the S blocks' int64 keys,
     laid out as bitcast int32 pairs so one gather moves hi+lo.
  4. exact sort of (Q, S*R) gathered keys -> first fetch rows.

This probe measures full-sort vs tournament at R in {64, 128} on
(16, 1M) int64 keys, checks numerical equality row-for-row, and
times the narrow-tile gather alone.

Methodology per CLAUDE.md: K iterations inside one jit with a
fold-proof carry, one fetch, two K values so the link RTT cancels.
"""

import functools
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


def row_gather(data, rows, G=8, interpret=False):
    """Gather whole rows of ``data`` (N, C) int32 at ``rows`` (M,);
    narrow-tile variant of colstream.block_gather: C a multiple of
    128 (not 1024)."""
    M = rows.shape[0]
    N, C = data.shape
    d3 = data.reshape(N, C // 128, 128)
    Mp = -(-M // G) * G
    if Mp != M:
        rows = jnp.concatenate(
            [rows, jnp.zeros((Mp - M,), rows.dtype)])

    def kernel(rows_ref, data_ref, out_ref, scratch, sem):
        # np.int32 constants everywhere: python ints traced under an
        # ambient enable_x64 lower as i64, which Mosaic's memref_slice
        # rejects (the same pitfall block_gather sidesteps by building
        # outside the x64 scope)
        i = pl.program_id(0) * np.int32(G)
        copies = []
        for j in range(G):
            c = pltpu.make_async_copy(
                data_ref.at[rows_ref[i + np.int32(j)]],
                scratch.at[np.int32(j)], sem)
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()
        out_ref[...] = scratch[...]

    # built under enable_x64(False): an index map traced under an
    # ambient x64 scope emits i64 block indices Mosaic won't legalize
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Mp // G,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (G, C // 128, 128), lambda i, r: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((G, C // 128, 128), data.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (Mp, C // 128, 128), data.dtype),
            grid_spec=grid_spec,
            interpret=interpret,
        )(rows.astype(jnp.int32), d3)
    return out[:M].reshape(M, C)


def tournament_topk(k64, fetch, R, G=8, interpret=False):
    """(Q, T) int64 keys -> (Q, fetch) smallest, exactly."""
    Q, T = k64.shape
    NB = T // R
    S = min(fetch, NB)
    with jax.enable_x64(True):
        bm = jnp.min(k64.reshape(Q, NB, R), axis=2)
        pos = jax.lax.broadcasted_iota(jnp.int32, (Q, NB), 1)
        _, spos = jax.lax.sort(
            (bm, pos), dimension=1, num_keys=1, is_stable=False)
        # int64 -> int32 pairs so ONE DMA moves both halves of a block
        pairs = jax.lax.bitcast_convert_type(k64, jnp.int32)
    sel = spos[:, :S].astype(jnp.int32)  # (Q, S) block positions
    flat = pairs.reshape(Q * NB, R * 2)
    qbase = jax.lax.broadcasted_iota(jnp.int32, (Q, S), 0) * NB
    g = row_gather(flat, (qbase + sel).reshape(-1), G=G,
                   interpret=interpret)  # (Q*S, R*2)
    with jax.enable_x64(True):
        gk = jax.lax.bitcast_convert_type(
            g.reshape(Q, S * R, 2), jnp.int64)
        ks = jax.lax.sort(gk, dimension=1, is_stable=False)
        return ks[:, :fetch]


def timed(make_step, x0, k1=2, k2=10, reps=3):
    def loop(K):
        @jax.jit
        def f(x):
            return jax.lax.fori_loop(
                0, K, lambda i, x: make_step(x, i), x)

        np.asarray(f(x0))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(x0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (loop(k2) - loop(k1)) / (k2 - k1)


def chk(a):
    return jnp.sum(
        a[..., ::509].astype(jnp.int32), dtype=jnp.int32)


def main():
    rng = np.random.default_rng(0)
    Q, T, FETCH = 16, 1_048_576, 2048
    SENT = np.int64(0x7FFFFFFFFFFFFFFF)

    with jax.enable_x64(True):
        # realistic keys: ~35% matched rows with coarse scores +
        # unique idx bits; the rest sentinels
        idx = np.arange(T, dtype=np.int64)
        score = rng.integers(0, 520, (Q, T)).astype(np.int64)
        matched = rng.random((Q, T)) < 0.35
        keys_np = np.where(
            matched,
            ((0xFFFF - score) << 36) | (idx << 16)[None, :],
            SENT)
        k64 = jnp.asarray(keys_np)

        # correctness first (device, small K): tournament == full sort
        full = np.sort(keys_np, axis=1)[:, :FETCH]
        for R in (64, 128):
            got = np.asarray(jax.jit(
                functools.partial(tournament_topk, fetch=FETCH, R=R)
            )(k64))
            ok = bool((got == full).all())
            print(json.dumps({"R": R, "exact_equal": ok}), flush=True)
            assert ok

        def full_step(x, i):
            s = jax.lax.sort(x, dimension=1, is_stable=False)
            return x.at[0, 0].set(chk(s).astype(jnp.int64))

        print(json.dumps(
            {"full_sort_ms": timed(full_step, k64) * 1e3}), flush=True)

        for R in (64, 128):
            for G in (8, 16):
                def t_step(x, i, R=R, G=G):
                    s = tournament_topk(x, FETCH, R, G=G)
                    return x.at[0, 0].set(chk(s).astype(jnp.int64))

                print(json.dumps({
                    "R": R, "G": G,
                    "tournament_ms": timed(t_step, k64) * 1e3,
                }), flush=True)

        # stage costs: blockmin+2-op sort alone; gather alone
        def bm_step(x, i):
            NB = T // 128
            bm = jnp.min(x.reshape(Q, NB, 128), axis=2)
            pos = jax.lax.broadcasted_iota(jnp.int32, (Q, NB), 1)
            _, spos = jax.lax.sort(
                (bm, pos), dimension=1, num_keys=1, is_stable=False)
            return x.at[0, 0].set(
                chk(spos[:, :FETCH]).astype(jnp.int64))

        print(json.dumps(
            {"blockmin_sort_ms": timed(bm_step, k64) * 1e3}),
            flush=True)

        rows0 = jnp.asarray(
            rng.integers(0, Q * T // 128, Q * FETCH, dtype=np.int32))
        pairs = jax.lax.bitcast_convert_type(k64, jnp.int32)
        flat = jnp.asarray(np.ascontiguousarray(
            np.asarray(pairs).reshape(Q * (T // 128), 256)))

        def g_step(x, i, flat=flat):
            g = row_gather(flat, x, G=8)
            return x.at[0].set(chk(g) & 0x7FFFFFFF)

        print(json.dumps(
            {"gather_only_ms_R128": timed(g_step, rows0) * 1e3}),
            flush=True)


if __name__ == "__main__":
    main()
