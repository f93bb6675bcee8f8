"""TPU smoke for the round-5 serving paths: literal colstream kernel,
multi-pattern combine, mixed finalize — small corpus so Mosaic compiles
are cheap, correctness vs the host oracle.

    python benchmarks/tpu_smoke_literal.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from frizbee_tpu.config import Config, Matching  # noqa: E402
from frizbee_tpu.corpus import pack_corpus  # noqa: E402
from frizbee_tpu.datagen import partial_match_corpus  # noqa: E402
from frizbee_tpu.matcher import Matcher, match_arrays_batch  # noqa: E402


def check(queries, corpus, cfg, label, query_syntax=False):
    t0 = time.perf_counter()
    res = match_arrays_batch(
        [
            Matcher.from_query(q, cfg) if query_syntax else Matcher(q, cfg)
            for q in queries
        ],
        corpus, cfg,
    )
    dt = time.perf_counter() - t0
    for q, r in zip(queries, res):
        m = (
            Matcher.from_query(q, cfg, use_device=False)
            if query_syntax
            else Matcher(q, cfg, use_device=False)
        )
        ref = m.match_arrays(corpus)
        for a, b, name in zip(r, ref, ("index", "score", "exact", "end")):
            np.testing.assert_array_equal(
                a, b, err_msg=f"{label} q={q!r} col={name}"
            )
    print(f"OK {label}  ({dt:.1f}s incl. compile)", flush=True)


def main():
    hay = partial_match_corpus(median_length=24, num_samples=20000, seed=5)
    corpus = pack_corpus(hay, unicode=False)
    print("backend:", end=" ", flush=True)
    import jax

    print(jax.devices()[0].platform, flush=True)

    check(["dead", "beef"], corpus, Config(), "fuzzy (regression)")
    for mode in (Matching.SUBSTRING, Matching.PREFIX, Matching.SUFFIX,
                 Matching.EXACT):
        check(["dead", "beef"], corpus, Config(matching=mode),
              f"literal {mode.value}")
    check(["dead beef", "dead !beef", "'dead beef"], corpus, Config(),
          "multi-pattern", query_syntax=True)

    # mixed finalize shape (selective + broad in one batch)
    rng = np.random.default_rng(21)
    c1 = ["".join(rng.choice(list("abcdef"), 20)) + "0123"
          for _ in range(4000)]
    c2 = ["".join(rng.choice(list("uvwxyz"), 20)) + "0123"
          for _ in range(12000)]
    corpus2 = pack_corpus(c1 + c2, unicode=False)
    from frizbee_tpu.matcher import match_topk_batch

    t0 = time.perf_counter()
    res = match_topk_batch(["beef", "0123"], corpus2, Config(), k=40)
    dt = time.perf_counter() - t0
    for q, r in zip(["beef", "0123"], res):
        ref = Matcher(q, Config(), use_device=False).match_arrays(corpus2)
        assert r[0] == len(ref[0]), (q, r[0], len(ref[0]))
        for a, b in zip(r[1:], tuple(x[:40] for x in ref)):
            np.testing.assert_array_equal(a, b, err_msg=f"mixed q={q!r}")
    print(f"OK mixed finalize  ({dt:.1f}s incl. compile)", flush=True)
    print("ALL SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
