"""Production-scale check: 10M-row corpus (10x the reference's largest
dataset), pipelined top-k serving. Buckets chain at max_bucket_rows, so
this also exercises the multi-chunk path at scale.

Usage: python benchmarks/probe_scale_10m.py [rows_millions]
"""

import json
import sys
import time
from collections import deque

sys.path.insert(0, ".")

import numpy as np

from frizbee_tpu.config import Config
from frizbee_tpu.corpus import pack_corpus
from frizbee_tpu.datagen import partial_match_corpus
from frizbee_tpu.matcher import (
    Matcher, match_topk_batch, match_topk_batch_async,
)

M = int(sys.argv[1]) if len(sys.argv) > 1 else 10
N = M * 1_000_000
Q = 32
K = 2048

t0 = time.time()
hay = partial_match_corpus(median_length=64, num_samples=N)
t_gen = time.time() - t0
t0 = time.time()
corpus = pack_corpus(hay, unicode=False)
t_pack = time.time() - t0
print(json.dumps({
    "rows": N, "gen_s": round(t_gen, 1), "pack_s": round(t_pack, 1),
    "buckets": [(b.width, int(b.cp.shape[0])) for b in corpus.buckets],
}), flush=True)

rng = np.random.default_rng(99)
queries = ["deadbeef"]
while len(queries) < Q:
    s = "".join(rng.permutation(list("deadbeef")))
    if s not in queries:
        queries.append(s)
ms = [Matcher.from_query(q, Config()) for q in queries]

t0 = time.time()
res = match_topk_batch(ms, corpus, Config(), k=K)
print(f"warmup (compile+upload) {time.time() - t0:.1f}s", flush=True)
assert res[0][0] > 0

DEPTH, RUNS = 3, 6
futs = deque(
    match_topk_batch_async(ms, corpus, Config(), k=K) for _ in range(DEPTH)
)
t0 = time.perf_counter()
for _ in range(RUNS):
    futs.append(match_topk_batch_async(ms, corpus, Config(), k=K))
    futs.popleft().result()
dt = (time.perf_counter() - t0) / RUNS
while futs:
    futs.popleft().result()

print(json.dumps({
    "metric": f"partial_match_{M}m_len64_topk_serving",
    "rows": N, "batch_queries": Q,
    "pipelined_ms_per_query": round(dt * 1e3 / Q, 3),
    "haystacks_per_sec": round(Q * N / dt),
    "matches_q0": int(res[0][0]),
}), flush=True)
