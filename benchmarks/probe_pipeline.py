"""Steady-state pipelined serving vs blocking calls, real TPU.

Usage: python benchmarks/probe_pipeline.py [no_match|partial] [Q]
"""

import json
import sys
import time
from collections import deque

sys.path.insert(0, ".")

import numpy as np

from frizbee_tpu.config import Config
from frizbee_tpu.corpus import pack_corpus
from frizbee_tpu.datagen import no_match_corpus, partial_match_corpus
from frizbee_tpu.matcher import (
    Matcher, match_topk_batch, match_topk_batch_async,
)

profile = sys.argv[1] if len(sys.argv) > 1 else "partial"
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N = 1_000_000
K = 2048

if profile == "no_match":
    hay = no_match_corpus(median_length=16, num_samples=N, seed=31)
else:
    hay = partial_match_corpus(median_length=64, num_samples=N)
corpus = pack_corpus(hay, unicode=False)

rng = np.random.default_rng(99)
queries = ["deadbeef"]
while len(queries) < Q:
    s = "".join(rng.permutation(list("deadbeef")))
    if s not in queries:
        queries.append(s)
ms = [Matcher.from_query(q, Config()) for q in queries]

match_topk_batch(ms, corpus, Config(), k=K)  # warm

# blocking
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    match_topk_batch(ms, corpus, Config(), k=K)
    ts.append(time.perf_counter() - t0)
blk = float(np.median(ts))

# pipelined, depth 3
RUNS = 10
for depth in (2, 3):
    futs = deque()
    # prime
    for _ in range(depth):
        futs.append(match_topk_batch_async(ms, corpus, Config(), k=K))
    t0 = time.perf_counter()
    for _ in range(RUNS):
        futs.append(match_topk_batch_async(ms, corpus, Config(), k=K))
        futs.popleft().result()
    dt = (time.perf_counter() - t0) / RUNS
    while futs:
        futs.popleft().result()
    print(json.dumps({
        "profile": profile, "Q": Q, "depth": depth,
        "blocking_ms_per_query": round(blk * 1e3 / Q, 3),
        "pipelined_ms_per_query": round(dt * 1e3 / Q, 3),
        "pipelined_hay_per_s": round(Q * N / dt),
    }), flush=True)
