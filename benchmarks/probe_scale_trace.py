"""Root-cause the 10M-row serving cliff: build-or-load a cached packed
corpus, run one pipelined window, optionally capture a profiler trace,
and time Q=8 vs Q=32 to separate per-query from per-batch costs.

Usage: python benchmarks/probe_scale_trace.py [M] [--trace]
"""

import json
import os
import sys
import time
from collections import deque

sys.path.insert(0, ".")

import numpy as np

from frizbee_tpu.config import Config
from frizbee_tpu.corpus import Corpus, pack_corpus
from frizbee_tpu.datagen import partial_match_corpus
from frizbee_tpu.matcher import (
    Matcher, match_topk_batch, match_topk_batch_async,
)

_nums = [a for a in sys.argv[1:] if a.isdigit()]
M = int(_nums[0]) if _nums else 10
TRACE = "--trace" in sys.argv
N = M * 1_000_000
K = 2048
CACHE = f"/tmp/corpus_{M}m.npz"

if os.path.exists(CACHE):
    t0 = time.time()
    corpus = Corpus.load(CACHE)
    print(f"loaded {CACHE} in {time.time() - t0:.1f}s", flush=True)
else:
    t0 = time.time()
    hay = partial_match_corpus(median_length=64, num_samples=N)
    print(f"gen {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    corpus = pack_corpus(hay, unicode=False)
    print(f"pack {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    corpus.save(CACHE)
    print(f"save {time.time() - t0:.1f}s", flush=True)
print("buckets:", [(b.width, int(b.cp.shape[0])) for b in corpus.buckets],
      flush=True)

rng = np.random.default_rng(99)
queries = ["deadbeef"]
while len(queries) < 32:
    s = "".join(rng.permutation(list("deadbeef")))
    if s not in queries:
        queries.append(s)

for Q in (32, 8):
    ms = [Matcher.from_query(q, Config()) for q in queries[:Q]]
    t0 = time.time()
    res = match_topk_batch(ms, corpus, Config(), k=K)
    print(f"Q={Q} warmup {time.time() - t0:.1f}s "
          f"(count q0 = {res[0][0]})", flush=True)
    futs = deque(
        match_topk_batch_async(ms, corpus, Config(), k=K)
        for _ in range(2)
    )
    t0 = time.perf_counter()
    for _ in range(4):
        futs.append(match_topk_batch_async(ms, corpus, Config(), k=K))
        futs.popleft().result()
    dt = (time.perf_counter() - t0) / 4
    while futs:
        futs.popleft().result()
    print(json.dumps({
        "M": M, "Q": Q, "batch_ms": round(dt * 1e3, 1),
        "ms_per_query": round(dt * 1e3 / Q, 2),
    }), flush=True)

if TRACE:
    import jax

    ms = [Matcher.from_query(q, Config()) for q in queries[:32]]
    with jax.profiler.trace("/tmp/jax_trace_10m"):
        match_topk_batch(ms, corpus, Config(), k=K)
    print("trace written to /tmp/jax_trace_10m", flush=True)
