import time, sys, json
import numpy as np
sys.path.insert(0, ".")
import jax
from frizbee_tpu.config import Config
from frizbee_tpu.corpus import pack_corpus
from frizbee_tpu.datagen import partial_match_corpus
from frizbee_tpu.matcher import Matcher

hay = partial_match_corpus(median_length=64, num_samples=1_000_000)
corpus = pack_corpus(hay, unicode=False)
m = Matcher("deadbeef", Config())

def timed(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
    return min(ts)

# full dispatch, device only (no host fetch)
def disp():
    pending = m._fused_dispatch(corpus)
    pending[1].block_until_ready()
print(json.dumps({"stage": "Q1 dispatch+device (fetch_rows=N)", "ms": round(timed(disp)*1e3,2)}), flush=True)

# same program family at smaller fetch windows, called directly
from frizbee_tpu.matcher import _colstream_blocks_and_cap
import jax.numpy as jnp
from frizbee_tpu.ops.batch import fused_match_sorted_batch
buckets, patterns, statics, use_kernel, bst = m._fused_device_args(corpus)
pats_host = [cp.engine._host_needle() for cp in m._compiled]
stacked = tuple(tuple(jnp.asarray(a[None]) for a in p) for p in pats_host)
for fr in (2048, 65536, len(corpus)):
    bT, fc, _p = _colstream_blocks_and_cap(
        corpus, statics, [p[0].shape[0] for p in pats_host],
        [np.concatenate(p[:2])[None, :] for p in pats_host], fr, True)
    def call():
        out = fused_match_sorted_batch(
            buckets, stacked, corpus.device_xl_mask(), n=len(corpus),
            pattern_statics=statics, sort_by_score=True, use_kernel=True,
            unicode=False, score_bound=m._score_bound(), fetch_rows=fr,
            bucket_statics=bst, buckets_T=bT, finalize_cap=fc)
        out.block_until_ready()
    print(json.dumps({"stage": f"Q1 program fetch_rows={fr} fin_cap={fc}", "ms": round(timed(call)*1e3,2)}), flush=True)
