"""Pipelined-serving throughput vs queries-per-batch (Q).

The headline bench (bench.py) uses Q=32. Per-query device cost has a
fixed per-batch component (dispatch, fetch, batched sorts' floors) and a
marginal per-query component (gather + kernel); this probe measures the
pipelined steady state at Q in {16, 32, 64} on the 1M-row partial-match
profile to pick the best serving batch size. Appends JSONL to
benchmarks/probe_qscale.jsonl.
"""

import json
import os
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = __file__.replace(".py", ".jsonl")
N = 1_000_000
TOP_K = 2048
DEPTH, RUNS = 3, 8


def rec(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def queries(q):
    rng = np.random.default_rng(99)
    base = "deadbeef"
    out = [base]
    while len(out) < q:
        s = "".join(rng.permutation(list(base)))
        if s not in out:
            out.append(s)
    return out[:q]


def main():
    from frizbee_tpu.config import Config
    from frizbee_tpu.corpus import pack_corpus
    from frizbee_tpu.datagen import partial_match_corpus
    from frizbee_tpu.matcher import Matcher, match_topk_batch_async

    qs = [int(x) for x in (sys.argv[1:] or ["16", "32", "64"])]
    corpus = pack_corpus(
        partial_match_corpus(median_length=64, num_samples=N), unicode=False
    )
    cfg = Config()
    all_m = [Matcher.from_query(s, cfg) for s in queries(max(qs))]

    for q in qs:
        ms = all_m[:q]
        # warmup (compile at this Q)
        match_topk_batch_async(ms, corpus, cfg, k=TOP_K).result()
        futs = deque(
            match_topk_batch_async(ms, corpus, cfg, k=TOP_K)
            for _ in range(DEPTH)
        )
        t0 = time.perf_counter()
        for _ in range(RUNS):
            futs.append(match_topk_batch_async(ms, corpus, cfg, k=TOP_K))
            futs.popleft().result()
        dt = (time.perf_counter() - t0) / RUNS
        while futs:
            futs.popleft().result()
        rec(probe="qscale", q=q, batch_seconds=dt,
            per_query_ms=dt / q * 1e3, haystacks_per_sec=q * N / dt)


if __name__ == "__main__":
    main()
