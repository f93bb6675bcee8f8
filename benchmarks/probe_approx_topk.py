"""Probe: lax.approx_max_k (TPU PartialReduce) as the broad-needle
result-selection stage.

STATUS round-5 names the per-query full int64 result sort as the broad
unicode bottleneck (1.7 ms/q at 1M rows vs a 0.5 ns/row kernel), and
exact lax.top_k measured SLOWER than the sort (probe_topk.jsonl).
approx_max_k lowers to the TPU's ApproxTopK custom call — a different
machine than either. The exact-serving plan it would slot into:

  coarse f32 key (score<<8 | idx>>12 — 24 bits, exact in f32)
  -> approx_max_k(coarse, C)          candidate indices, C ~ 2-4x fetch
  -> take_along_axis true int64 keys  (C-element gather per query)
  -> exact sort of C candidates
  -> device verification: count(coarse >= cmin) == C
     (if it holds, candidates == ALL rows at-or-above the floor, so the
      full-key top-fetch_rows is provably inside them; host re-dispatches
      the full-sort program on the rare failure — same pattern as the
      Q=1 window overflow)

This probe measures, on the real device:
  approx_ms    — approx_max_k(f32 (Q,T), C) alone
  gather_ms    — per-query C-element take_along_axis on int64 keys
  smallsort_ms — (Q, C) int64 sort
  sort_ms      — the incumbent full (Q, T) int64 single-operand sort
and, numerically (no timing), the verification PASS RATE on three key
distributions: uniform-random, and two tie-heavy "broad needle" shapes
(few distinct scores; equal-coarse runs contiguous in position — the
adversarial layout for shard-local reduction).

Methodology per CLAUDE.md: K iterations inside one jit with a fold-proof
carry, one fetch, two K values so the link RTT cancels.
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


def coarse_keys(rng, Q, T, kind):
    """f32 coarse keys = score*256 + (idx>>12 complement), max=better."""
    idx = np.arange(T, dtype=np.int64)
    if kind == "uniform":
        score = rng.integers(0, 1 << 16, (Q, T), dtype=np.int64)
    elif kind == "broad":
        # ~35% matched, 24 distinct scores, zipf-skewed: the arabic
        # common-particle profile. Scores i.i.d. over position.
        probs = 1.0 / np.arange(2, 26) ** 1.3
        probs /= probs.sum()
        sc = rng.choice(
            np.linspace(40, 520, 24).astype(np.int64), (Q, T), p=probs)
        matched = rng.random((Q, T)) < 0.35
        score = np.where(matched, sc, 0)
    elif kind == "runs":
        # same marginals but equal scores in CONTIGUOUS position runs
        # of ~4096 (content-clustered corpora put similar rows
        # adjacent) — worst case for shard-local reduction.
        R = 4096
        probs = 1.0 / np.arange(2, 26) ** 1.3
        probs /= probs.sum()
        sc = rng.choice(
            np.linspace(40, 520, 24).astype(np.int64),
            (Q, (T + R - 1) // R), p=probs)
        matched = rng.random((Q, (T + R - 1) // R)) < 0.35
        sc = np.where(matched, sc, 0)
        score = np.repeat(sc, R, axis=1)[:, :T]
    hi8 = (~idx >> 12) & 0xFF
    c = (score << 8) | hi8[None, :]
    return c.astype(np.float32), score


def verify_rate(cand_coarse, all_coarse, C):
    """Fraction of queries where count(coarse >= cmin) == C."""
    cmin = cand_coarse.min(axis=1)  # (Q,)
    cnt = (all_coarse >= cmin[:, None]).sum(axis=1)
    return float((cnt == C).mean()), [int(x) for x in cnt]


def main():
    rng = np.random.default_rng(0)
    Q, T = 16, 1_048_576
    FETCH = 2048

    # --- numeric verification pass rates (CPU-checkable semantics,
    # but run the real custom call on device) ---
    for kind in ("uniform", "broad", "runs"):
        c_np, _ = coarse_keys(rng, Q, T, kind)
        c = jnp.asarray(c_np)
        for C in (4096, 8192):
            for rt in (0.95, 0.99):
                vals, idxs = jax.jit(
                    lambda x: jax.lax.approx_max_k(
                        x, C, recall_target=rt),
                    static_argnums=(),
                )(c)
                vals = np.asarray(vals)
                rate, cnts = verify_rate(vals, c_np, C)
                # true recall of the exact top-C set (ties counted
                # generously: by value)
                kth = np.partition(c_np, T - C, axis=1)[:, T - C]
                print(json.dumps({
                    "kind": kind, "C": C, "recall_target": rt,
                    "verify_pass_rate": rate,
                    "count_ge_cmin_minmax": [min(cnts), max(cnts)],
                    "kth_exact_val_minmax": [
                        float(kth.min()), float(kth.max())],
                }), flush=True)

    # --- timings ---
    c_np, _ = coarse_keys(rng, Q, T, "broad")
    c = jnp.asarray(c_np)
    key64_np = rng.integers(-(1 << 62), 1 << 62, (Q, T), dtype=np.int64)
    C = 8192

    def approx_step(x, i):
        vals, idxs = jax.lax.approx_max_k(x, C, recall_target=0.95)
        return x.at[0, 0].set(chk(vals).astype(x.dtype))

    print(json.dumps(
        {"approx_ms_C8192": timed(approx_step, c) * 1e3}), flush=True)

    def approx_step4(x, i):
        vals, idxs = jax.lax.approx_max_k(x, 4096, recall_target=0.95)
        return x.at[0, 0].set(chk(vals).astype(x.dtype))

    print(json.dumps(
        {"approx_ms_C4096": timed(approx_step4, c) * 1e3}), flush=True)

    with jax.enable_x64(True):
        k64 = jnp.asarray(key64_np)
        idxs0 = jnp.asarray(
            rng.integers(0, T, (Q, C), dtype=np.int32))

        def gather_sort_step(x, i, k64=k64):
            g = jnp.take_along_axis(k64, x, axis=1)
            s = jax.lax.sort(g, dimension=1, is_stable=False)
            return x.at[0, 0].set(
                (chk(s) & 0x7FFFFFF).astype(jnp.int32))

        print(json.dumps({
            "gather_sort_ms_C8192":
                timed(gather_sort_step, idxs0) * 1e3}), flush=True)

        def full_sort_step(x, i):
            s = jax.lax.sort(x, dimension=1, is_stable=False)
            return x.at[0, 0].set(chk(s))

        print(json.dumps({
            "full_sort_ms": timed(full_sort_step, k64) * 1e3},
        ), flush=True)

    # fused: approx on coarse + gather true keys + small sort + verify
    # count, all in one program (the would-be production shape)
    with jax.enable_x64(True):
        def fused_step(x, i, k64=k64):
            vals, idxs = jax.lax.approx_max_k(x, C, recall_target=0.95)
            g = jnp.take_along_axis(k64, idxs, axis=1)
            s = jax.lax.sort(g, dimension=1, is_stable=False)
            cmin = vals.min(axis=1, keepdims=True)
            cnt = jnp.sum((x >= cmin).astype(jnp.int32), axis=1)
            return x.at[0, 0].set(
                (chk(s).astype(jnp.int32) ^ chk(cnt)
                 ).astype(jnp.float32))

        print(json.dumps(
            {"fused_ms_C8192": timed(fused_step, c) * 1e3}), flush=True)


if __name__ == "__main__":
    main()
