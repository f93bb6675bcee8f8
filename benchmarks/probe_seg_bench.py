"""A/B the headline serving bench with narrow (sub-lane packed) buckets.

Usage: python benchmarks/probe_seg_bench.py [widths...]
Default widths: 16 32 64 128 256 512 1024 (the candidate new default);
compare against bench.py's current (128 256 512 1024) packing.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from frizbee_tpu.config import Config
from frizbee_tpu.corpus import pack_corpus
from frizbee_tpu.datagen import partial_match_corpus
from frizbee_tpu.matcher import Matcher, match_topk_batch

N = 1_000_000
Q = 32
TOP_K = 2048
WIDTHS = tuple(int(w) for w in sys.argv[1:]) or (16, 32, 64, 128, 256,
                                                 512, 1024)

hay = partial_match_corpus(median_length=64, num_samples=N)
corpus = pack_corpus(hay, unicode=False, bucket_widths=WIDTHS)
print("buckets:", [(b.width, b.cp.shape[0]) for b in corpus.buckets],
      "xl:", len(corpus.xl_indices), flush=True)

queries = [Matcher.from_query(s, Config()) for s in ["deadbeef"]]
rng = np.random.default_rng(99)
while len(queries) < Q:
    s = "".join(rng.permutation(list("deadbeef")))
    queries.append(Matcher.from_query(s, Config()))
queries = queries[:Q]

t0 = time.time()
match_topk_batch(queries, corpus, Config(), k=TOP_K)
print(f"warmup (compile) {time.time() - t0:.1f}s", flush=True)

times = []
for _ in range(5):
    t0 = time.perf_counter()
    res = match_topk_batch(queries, corpus, Config(), k=TOP_K)
    times.append(time.perf_counter() - t0)
dt = float(np.median(times))
print(json.dumps({
    "widths": list(WIDTHS),
    "batch_seconds": dt,
    "haystacks_per_sec": round(Q * N / dt),
    "vs_reference": round(Q * N / dt / (100_000 / 1.24e-3), 4),
    "matches_q0": int(res[0][0]),
}))
