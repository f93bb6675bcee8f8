import time, sys, json
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from frizbee_tpu.config import Config
from frizbee_tpu.corpus import pack_corpus
from frizbee_tpu.datagen import unicode_corpus
from frizbee_tpu.ops.colstream import match_units_colstream
from frizbee_tpu.ops.kernels import pack_needle_scalars
from frizbee_tpu.ops.fuzzy import SCORING_FIELDS

hay = unicode_corpus("arabic", needle="إن", num_samples=1_000_000)
corpus = pack_corpus(hay, unicode=True)
scoring = tuple(int(getattr(Config().scoring, f)) for f in SCORING_FIELDS)
b = corpus.buckets[0]
cpT, nuT, idxT, _bb, _ctx = b.device_arrays_colstream()
W = b.cp.shape[1]; B = b.cp.shape[0]
print("bucket", B, W, "buckets:", [(bb.cp.shape) for bb in corpus.buckets], flush=True)
needle = "لا"
orig = np.array([ord(c) for c in needle], np.int32); flip = orig.copy()
npk = jnp.asarray(np.concatenate([orig, flip])); n = 2
scal = pack_needle_scalars(npk, B)

def loop(K, no_pre):
    @jax.jit
    def f(acc):
        def it(i, a):
            s = scal.at[2].set(scal[2] ^ (a & 1))
            outs = match_units_colstream(cpT, nuT, s, W=W, n=n, max_typos=0,
                scoring=scoring, unicode=True, no_prefilter=no_pre)
            return a ^ outs[1][0]
        return jax.lax.fori_loop(0, K, it, acc)
    np.asarray(f(jnp.int32(0))); ts=[]
    for _ in range(5):
        t0=time.perf_counter(); np.asarray(f(jnp.int32(0))); ts.append(time.perf_counter()-t0)
    return min(ts)

for no_pre, label in ((False, "pf+sw"), (True, "sw-only")):
    dt = (loop(9, no_pre) - loop(1, no_pre)) / 8
    nu = b.n_units.astype(np.int64); cols = int(nu.sum())
    print(json.dumps({"label": label, "kernel_ms": round(dt*1e3,3),
        "rows_per_s_M": round(B/dt/1e6), "ns_per_row": round(dt/B*1e9,2),
        "cols_per_s_G": round(cols/dt/1e9,2)}), flush=True)
