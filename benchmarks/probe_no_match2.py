"""Breakdown of the no_match batch: host prep vs dispatch vs fetch, and
amortized device time from K pipelined dispatches + one fetch."""

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

hay = no_match_corpus(median_length=16, num_samples=N, seed=31)
corpus = pack_corpus(hay, unicode=False)
rng = np.random.default_rng(99)
queries = ["deadbeef"]
while len(queries) < Q:
    s = "".join(rng.permutation(list("deadbeef")))
    if s not in queries:
        queries.append(s)
ms = [Matcher.from_query(q, Config()) for q in queries]
match_topk_batch(ms, corpus, Config(), k=2048)  # warm

# manual replica of _run_batch_groups' single group
import jax.numpy as jnp

from frizbee_tpu.ops.batch import fused_match_sorted_batch

m0 = ms[0]
t0 = time.perf_counter()
prepared = [m._fused_device_args(corpus) for m in ms]
buckets, _p, statics, use_kernel, bst = prepared[0]
stacked = tuple(
    tuple(jnp.stack([p[1][pi][a] for p in prepared]) for a in range(3))
    for pi in range(1)
)
t_prep = time.perf_counter() - t0


def dispatch():
    return fused_match_sorted_batch(
        buckets, stacked, corpus.device_xl_mask(), n=len(corpus),
        pattern_statics=statics, sort_by_score=True,
        use_kernel=use_kernel, unicode=False,
        score_bound=m0._score_bound(), fetch_rows=2048,
        bucket_statics=bst,
    )


out = dispatch()
_ = np.asarray(out)

for trial in range(3):
    t0 = time.perf_counter()
    out = dispatch()
    t_disp = time.perf_counter() - t0
    t0 = time.perf_counter()
    arr = np.asarray(out)
    t_fetch = time.perf_counter() - t0
    print(f"prep {t_prep*1e3:.1f} ms  dispatch {t_disp*1e3:.1f} ms  "
          f"fetch {t_fetch*1e3:.1f} ms  bytes {arr.nbytes}", flush=True)

# amortized device time: K pipelined dispatches, fetch only the last
for K in (4, 16):
    outs = [dispatch() for _ in range(2)]
    np.asarray(outs[-1])  # drain
    t0 = time.perf_counter()
    outs = [dispatch() for _ in range(K)]
    np.asarray(outs[-1])
    dt = time.perf_counter() - t0
    print(f"K={K} pipelined: {dt*1e3:.1f} ms total, "
          f"{dt*1e3/K:.2f} ms/batch, {dt*1e3/K/Q:.3f} ms/query", flush=True)
