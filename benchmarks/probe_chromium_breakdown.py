"""Per-stage breakdown of chromium_like serving (VERDICT r3 #2).

Questions: which capacity tier does needle "linux" take on the 1.4M-row
chromium corpus (stage-1 survivor fraction per bucket), and where do the
~9 ms/q go (stage-1 | compact gather | kernel | result sort | fetch)?

Method: K-iteration marginal timing inside one jit for each stage in
isolation, plus tier census from the actual survivor counts.
Appends to benchmarks/probe_chromium_breakdown.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = __file__.replace(".py", ".jsonl")


def rec(name, **kw):
    line = json.dumps({"probe": name, **kw})
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    # census is pure arithmetic -> NumPy on host (no remote compiles)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from frizbee_tpu.config import Config
    from frizbee_tpu.corpus import pack_corpus
    from frizbee_tpu.datagen import chromium_like_corpus
    from frizbee_tpu.matcher import Matcher
    from frizbee_tpu.ops.presence import needle_need_matrix
    from frizbee_tpu.ops.batch import _bucket_cap

    cfg = Config()
    hay = chromium_like_corpus()
    corpus = pack_corpus(hay, unicode=False)
    names = ["linux", "winux", "lunix", "xinul", "nilux", "uxlin",
             "inlux", "xunil"] * 2
    qs = [Matcher(v, cfg) for v in names[:16]]

    # --- tier census: stage-1 survivors per bucket per query ---
    needles = []
    for m in qs:
        o, f, _sc = m._compiled[0].engine._device_needle()
        needles.append(np.concatenate([np.asarray(o), np.asarray(f)]))
    needles_q = jnp.asarray(np.stack(needles), jnp.int32)
    need, tot = np.asarray(needle_need_matrix(needles_q)[0]), None
    need_j, tot_j = needle_need_matrix(needles_q)
    need = np.asarray(need_j, np.int32)
    thresh = np.asarray(tot_j, np.int32)  # T = 0

    census = []
    for bi, b in enumerate(corpus.buckets):
        cp, nu, idx, mask4, bits8 = b.device_arrays_ascii()
        bits8 = np.asarray(bits8, np.int32)
        B, W = cp.shape
        hits = bits8 @ need  # (B, Q)
        s1 = (hits >= thresh[None, :]).sum(axis=0)
        caps = {d: _bucket_cap(B, W, d) for d in (4, 8, 16)}
        census.append({
            "bucket": bi, "rows": B, "width": W,
            "survivors_min": int(s1.min()), "survivors_max": int(s1.max()),
            "frac_max": round(float(s1.max()) / B, 4),
            "caps": caps,
            "tier_16_fits": bool(s1.max() <= caps[16]),
            "tier_8_fits": bool(s1.max() <= caps[8]),
            "tier_4_fits": bool(s1.max() <= caps[4]),
        })
    rec("tier_census", buckets=census)


if __name__ == "__main__":
    main()
