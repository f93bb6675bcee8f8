"""Compute-roofline for the DP-bound colstream rows (VERDICT round-4 #7).

all_match / all_scores sit at 0.8-3.3% of the HBM roofline because they
are VPU-bound, not bandwidth-bound. This probe times the column-stream
kernel ALONE (K-iteration marginal with a fold-proof needle dependency,
per CLAUDE.md) on the all_match_128 profile and compares:

  - DP cell rate (cells/s, cells = sum(row units) x needle len)
  - element-op rate under a counted op model (ops/cell from the kernel
    source: ~18 VPU element-ops per (column, needle-unit) DP cell in
    the k>0 ASCII path + ~25 per-column fixed ops for load/context/
    bonus/window tracking)
  - a stated VPU ceiling: 8x128 lanes x ~1.67 GHz x 2 ops/cycle
    ~= 3.4e12 int32 element-ops/s on v5e (model, +-2x — the point is
    naming the binding resource, not a 3-digit percentage)
  - the HBM rate of the same pass (corpus block bytes / time)

    python benchmarks/probe_vpu_roofline.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from frizbee_tpu.config import Config  # noqa: E402
from frizbee_tpu.corpus import pack_corpus  # noqa: E402
from frizbee_tpu.datagen import all_match_corpus  # noqa: E402
from frizbee_tpu.ops.colstream import match_units_colstream  # noqa: E402
from frizbee_tpu.ops.kernels import pack_needle_scalars  # noqa: E402
from frizbee_tpu.ops.fuzzy import SCORING_FIELDS  # noqa: E402

OUT = "benchmarks/probe_vpu_roofline.jsonl"
VPU_OPS = 1024 * 1.67e9 * 2  # stated model ceiling (see module doc)
OPS_PER_CELL = 18.0
OPS_PER_COL = 25.0
HBM_BW = 819e9


def main():
    N = 1_000_000
    L = 128
    needle = "deadbeef"
    hay = all_match_corpus(median_length=L, num_samples=N)
    corpus = pack_corpus(hay, unicode=False)
    scoring = tuple(
        int(getattr(Config().scoring, f)) for f in SCORING_FIELDS
    )
    rows = []
    for name, no_pre in (("all_match_128", False),
                         ("all_scores_128", True)):
        b = corpus.buckets[0]
        cpT, nuT, idxT, _bb, _ctx = b.device_arrays_colstream()
        W = b.cp.shape[1]
        B = b.cp.shape[0]
        n = len(needle)
        orig = np.frombuffer(needle.encode(), np.uint8).astype(np.int32)
        flip = np.where(
            (orig >= 97) & (orig <= 122), orig - 32, orig
        )
        npk = jnp.asarray(np.concatenate([orig, flip]))
        scal = pack_needle_scalars(npk, B)

        def loop(K):
            @jax.jit
            def f(acc):
                def it(i, a):
                    s = scal.at[2].set(scal[2] ^ (a & 1))
                    outs = match_units_colstream(
                        cpT, nuT, s,
                        W=W, n=n, max_typos=0, scoring=scoring,
                        unicode=False, no_prefilter=no_pre,
                    )
                    return a ^ outs[1][0]

                return jax.lax.fori_loop(0, K, it, acc)

            np.asarray(f(jnp.int32(0)))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(f(jnp.int32(0)))
                ts.append(time.perf_counter() - t0)
            return float(np.min(ts))

        dt = (loop(9) - loop(1)) / 8
        nu = b.n_units.astype(np.int64)
        cells = int(nu.sum()) * n
        cols = int(nu.sum())
        # all_scores skips prefilter pass 1; all_match runs prefilter +
        # SW (2 passes over the columns)
        passes = 1 if no_pre else 2
        ops = cells * OPS_PER_CELL + cols * OPS_PER_COL * passes
        hbm_bytes = B * W * passes  # int8 block reads per pass
        row = {
            "probe": name,
            "kernel_ms": round(dt * 1e3, 3),
            "rows_per_s": round(B / dt),
            "cells_per_s": round(cells / dt / 1e9, 2),
            "cells_unit": "G DP cells/s",
            "model_ops_per_s": round(ops / dt / 1e12, 3),
            "model_ops_unit": "T element-ops/s",
            "pct_vpu_ceiling": round(100 * ops / dt / VPU_OPS, 1),
            "pct_hbm": round(100 * hbm_bytes / dt / HBM_BW, 1),
            "model": (
                f"{OPS_PER_CELL} ops/cell + {OPS_PER_COL} ops/col x "
                f"{passes} passes; ceiling 3.4e12 op/s (+-2x)"
            ),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(OUT, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
