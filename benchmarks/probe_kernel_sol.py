"""Speed-of-light probe for the fused prefilter+SW kernel (match_units).

Times K kernel invocations inside ONE jit with a carried data dependency
(the only timing methodology that works over the async tunnel — see
CLAUDE.md), at the serving-relevant survivor shapes, and compares against
a VPU-op lower bound:

    per-needle-unit cost ~ prefilter (T+1 masked mins) + SW
    (cumsum + cummax networks, ~2*log2(S) shift-ops) over (rows/8, 128)
    vector tiles at ~1 op/cycle, 940 MHz (v5e).

Usage: python benchmarks/probe_kernel_sol.py [W ...]   (default 64 128)
Appends to benchmarks/probe_kernel_sol.jsonl.
"""

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = __file__.replace(".py", ".jsonl")

K_ITERS = int(os.environ.get("PROBE_K", "32"))
# the 1/16-tier survivor capacity at 1M rows
B_LOGICAL = int(os.environ.get("PROBE_B", "65536"))
NEEDLE = "deadbeef"


def rec(name, **kw):
    line = json.dumps({"probe": name, **kw})
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def vpu_lower_bound_us(rows_vec, width, n, T):
    """Very rough lower bound: per needle unit, prefilter does (T+2)
    cross-lane min-reductions and SW does ~2 log-shift networks; count
    each as ~log2(S) vector ops over (rows_vec/8, 128) tiles."""
    S = min(width, 128)
    ops_per_k = (T + 2 + 2) * math.log2(S) + 12  # + elementwise slack
    tiles = rows_vec / 8
    total_ops = n * ops_per_k * tiles
    return total_ops / 940e3  # 940 MHz, 1 vector op/cycle -> us


def probe(width: int, max_typos: int):
    import jax
    import jax.numpy as jnp

    from frizbee_tpu.ops.kernels import (
        match_units,
        pack_needle_scalars,
        pack_rows_for_kernel,
    )

    rng = np.random.default_rng(7)
    dt = np.int8
    cp = rng.integers(97, 123, (B_LOGICAL, width), dtype=dt)
    # ~1/2 rows contain the needle as a subsequence spread across lanes
    pos = np.sort(
        rng.integers(0, width, (B_LOGICAL // 2, len(NEEDLE))), axis=1
    )
    for j, ch in enumerate(NEEDLE):
        cp[np.arange(B_LOGICAL // 2), pos[:, j]] = ord(ch)
    nu = rng.integers(width // 2, width + 1, (B_LOGICAL, 1)).astype(np.int32)

    cp_k, nu_k, seg, g = pack_rows_for_kernel(
        jnp.asarray(cp), jnp.asarray(nu)
    )
    rows_vec = cp_k.shape[0]
    needle = np.frombuffer(NEEDLE.encode(), dtype=np.uint8).astype(np.int32)
    packed = jnp.asarray(np.concatenate([needle, needle]))
    count_vec = rows_vec

    @jax.jit
    def timed(cp_in):
        def body(i, carry):
            cp_c, acc = carry
            out = match_units(
                cp_c, nu_k, pack_needle_scalars(packed, count_vec),
                max_typos=max_typos, unicode=False, seg=seg,
                interpret=jax.default_backend() != "tpu",
            )
            s = out[:, 1].sum()
            # fold-proof dependency: the next iteration's input depends on
            # the previous result, so iterations serialize
            cp_c = cp_c.at[0, 0].set((s & 1).astype(cp_c.dtype))
            return cp_c, acc + s

        cp_f, acc = jax.lax.fori_loop(0, K_ITERS, body, (cp_in, jnp.int32(0)))
        return acc

    r = timed(cp_k)
    r.block_until_ready()  # warm/compile
    t0 = time.perf_counter()
    r = timed(cp_k)
    _ = int(r)  # one fetch ends the timing
    dt_s = time.perf_counter() - t0
    per_call_ms = dt_s * 1e3 / K_ITERS
    n = len(NEEDLE)
    bound_us = vpu_lower_bound_us(rows_vec, width, n, max_typos)
    rec(
        "kernel_sol",
        width=width,
        seg=int(seg),
        pack_g=int(g),
        rows_logical=B_LOGICAL,
        rows_vector=int(rows_vec),
        max_typos=max_typos,
        needle_len=n,
        per_call_ms=round(per_call_ms, 3),
        ns_per_logical_row=round(per_call_ms * 1e6 / B_LOGICAL, 2),
        vpu_bound_ms=round(bound_us / 1e3, 3),
        x_off_bound=round(per_call_ms / (bound_us / 1e3), 2),
    )


def main():
    widths = [int(w) for w in sys.argv[1:]] or [64, 128]
    for w in widths:
        for t in (0, 1, 2):
            probe(w, t)


if __name__ == "__main__":
    main()
