"""Diagnose the no_match_16 serving cost: narrow vs wide packing, and
where the time goes (stage-1 empty flow is the whole device job here).

Usage: python benchmarks/probe_no_match.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from frizbee_tpu.config import Config
from frizbee_tpu.corpus import pack_corpus
from frizbee_tpu.datagen import no_match_corpus
from frizbee_tpu.matcher import Matcher, match_topk_batch

N = 1_000_000
Q = 16
K = 2048

hay = no_match_corpus(median_length=16, num_samples=N, seed=31)
# same-length queries: one jit group, one device program, one fetch
# (mixed lengths split the batch into per-length programs)
rng = np.random.default_rng(99)
queries = ["deadbeef"]
while len(queries) < Q:
    s = "".join(rng.permutation(list("deadbeef")))
    if s not in queries:
        queries.append(s)

for label, widths in (
    ("narrow_default", None),
    ("wide_128plus", (128, 256, 512, 1024)),
):
    corpus = pack_corpus(hay, unicode=False, bucket_widths=widths)
    print(label, "buckets:",
          [(b.width, b.cp.shape[0]) for b in corpus.buckets], flush=True)
    ms = [Matcher.from_query(q, Config()) for q in queries]
    t0 = time.time()
    match_topk_batch(ms, corpus, Config(), k=K)
    print(f"  warmup {time.time() - t0:.1f}s", flush=True)
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        res = match_topk_batch(ms, corpus, Config(), k=K)
        times.append(time.perf_counter() - t0)
    assert all(r[0] == 0 for r in res)
    dt = float(np.median(times))
    print(json.dumps({
        "label": label, "total_ms": round(dt * 1e3, 3),
        "per_query_ms": round(dt * 1e3 / Q, 3),
        "min_ms": round(min(times) * 1e3, 3),
        "all_ms": [round(t * 1e3, 1) for t in times],
    }), flush=True)
