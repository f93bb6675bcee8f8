"""In-window serving A/B: block-min tournament finalize vs the full
(Q, total) result sort, on the arabic 1M broad-needle profile (the row
VERDICT r4 #2 named: the full per-row sort was the bottleneck for
common-particle needles keeping ~85% of groups stage-1-alive).

Runs the exact matrix serving shape (Q=16 two-char particles, k=2048,
pipelined depth 3 + blocking floor) twice per arm, ABAB-interleaved in
ONE process so tenant-phase drift shows up as pair spread rather than
a silent bias. Arm B monkeypatches ops.batch._broad_topk_ok to False
(the full-sort graph is then bit-identical to the round-5 one, so its
program comes from the persistent cache); jax.clear_caches() between
arms forces each arm to trace its own program.
"""

import json
import os
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

import frizbee_tpu  # noqa: F401,E402
import frizbee_tpu.ops.batch as batch_mod  # noqa: E402
from frizbee_tpu.config import Config  # noqa: E402
from frizbee_tpu.corpus import pack_corpus  # noqa: E402
from frizbee_tpu.datagen import unicode_corpus  # noqa: E402
from frizbee_tpu.matcher import (  # noqa: E402
    Matcher,
    match_topk_batch,
    match_topk_batch_async,
)

VARIANTS = ["إن", "لا", "ما", "في", "من", "هل", "ان", "نم",
            "إذ", "لم", "لن", "كي", "قد", "بل", "أو", "ثم"]


def measure(qs, corpus, k=2048, depth=3, runs=8):
    cfg = Config()
    match_topk_batch(qs, corpus, cfg, k=k)  # warm/compile
    bt = []
    for _ in range(3):
        t0 = time.perf_counter()
        match_topk_batch(qs, corpus, cfg, k=k)
        bt.append(time.perf_counter() - t0)
    blocking = float(np.median(bt)) / len(qs)
    futs = deque(
        match_topk_batch_async(qs, corpus, cfg, k=k)
        for _ in range(depth)
    )
    t0 = time.perf_counter()
    for _ in range(runs):
        futs.append(match_topk_batch_async(qs, corpus, cfg, k=k))
        futs.popleft().result()
    serving = (time.perf_counter() - t0) / runs / len(qs)
    while futs:
        futs.popleft().result()
    return blocking, serving


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    hay = unicode_corpus("arabic", needle="إن", num_samples=n)
    corpus = pack_corpus(hay, unicode=True)
    qs = [Matcher(v) for v in VARIANTS]
    real_gate = batch_mod._broad_topk_ok

    results = {}
    for rep in range(2):
        for arm, gate in (("tournament", real_gate),
                          ("full_sort", lambda *a: False)):
            batch_mod._broad_topk_ok = gate
            jax.clear_caches()
            t0 = time.perf_counter()
            if rep == 0:
                # cross-arm ground truth at the REAL serving shape:
                # both arms must produce bit-identical results
                results[arm] = match_topk_batch(
                    qs, corpus, Config(), k=2048)
            blocking, serving = measure(qs, corpus)
            print(json.dumps({
                "arm": arm, "rep": rep, "rows": n,
                "serving_ms_per_query": round(serving * 1e3, 3),
                "blocking_ms_per_query": round(blocking * 1e3, 3),
                "haystacks_per_sec_serving": round(n / serving),
                "wall_s": round(time.perf_counter() - t0, 1),
                "measured_at": time.strftime("%Y-%m-%d %H:%M"),
            }), flush=True)
    batch_mod._broad_topk_ok = real_gate
    eq = True
    for ra, rb in zip(results["tournament"], results["full_sort"]):
        eq &= ra[0] == rb[0]
        for a, b in zip(ra[1:], rb[1:]):
            eq &= bool(np.array_equal(a, b))
    print(json.dumps({"arms_bit_equal": bool(eq)}), flush=True)
    assert eq


if __name__ == "__main__":
    main()
