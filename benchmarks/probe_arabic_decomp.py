"""Decompose the arabic_1m serving cost (~3.9 ms/q, the one row still
under the reference x8 anchor).

probe_broad_ab falsified the round-5 diagnosis: replacing the full
(Q, 1M) result sort with the block-min tournament (or not) moves
NOTHING (blocking floors bit-equal to the millisecond) — the result
sort is NOT the bottleneck. This probe isolates what is, on one
resident 1M-row arabic corpus in one window:

  k sweep (2048 / 256 / 64)    transport + finalize width
  broad vs selective needles   stage-1 alive fraction (kernel time)
  Q=16 vs Q=8                  per-batch fixed costs

All cells share the pipelined methodology of run_all.bench_config.
"""

import json
import os
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import frizbee_tpu  # noqa: F401,E402
from frizbee_tpu.config import Config  # noqa: E402
from frizbee_tpu.corpus import pack_corpus  # noqa: E402
from frizbee_tpu.datagen import unicode_corpus  # noqa: E402
from frizbee_tpu.matcher import (  # noqa: E402
    Matcher,
    match_topk_batch,
    match_topk_batch_async,
)

BROAD = ["إن", "لا", "ما", "في", "من", "هل", "ان", "نم",
         "إذ", "لم", "لن", "كي", "قد", "بل", "أو", "ثم"]
# rare 2-char combos over the same alphabet: stage-1 rejects nearly
# every group, so these measure the skip-path floor
SELECTIVE = ["ظظ", "ذظ", "ضظ", "غظ", "ظذ", "ظض", "ظغ", "ذذ",
             "ضض", "غغ", "ذض", "ذغ", "ضذ", "ضغ", "غذ", "غض"]


def measure(qs, corpus, k, depth=3, runs=8):
    cfg = Config()
    match_topk_batch(qs, corpus, cfg, k=k)  # warm
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
    n = 1_000_000
    hay = unicode_corpus("arabic", needle="إن", num_samples=n)
    corpus = pack_corpus(hay, unicode=True)
    cells = [
        ("broad_k2048", BROAD, 2048),
        ("broad_k256", BROAD, 256),
        ("broad_k64", BROAD, 64),
        ("selective_k2048", SELECTIVE, 2048),
        ("broad_q8_k2048", BROAD[:8], 2048),
    ]
    for name, variants, k in cells:
        qs = [Matcher(v) for v in variants]
        t0 = time.perf_counter()
        blocking, serving = measure(qs, corpus, k)
        print(json.dumps({
            "cell": name, "Q": len(qs), "k": k,
            "serving_ms_per_query": round(serving * 1e3, 3),
            "blocking_ms_per_query": round(blocking * 1e3, 3),
            "wall_s": round(time.perf_counter() - t0, 1),
            "measured_at": time.strftime("%Y-%m-%d %H:%M"),
        }), flush=True)


if __name__ == "__main__":
    main()
