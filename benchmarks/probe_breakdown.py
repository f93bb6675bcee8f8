"""Decompose the 1M serving batch cost on TPU by differencing workloads:

- partial vs no_match (same shapes): kernel compute on survivors
- Q scaling: fixed (RTT/fetch/host) vs marginal per-query device cost
Appends to benchmarks/probe_breakdown.jsonl."""

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


def time_batch(qs, corpus, cfg, k=2048, reps=4):
    from frizbee_tpu.matcher import match_topk_batch

    match_topk_batch(qs, corpus, cfg, k=k)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        match_topk_batch(qs, corpus, cfg, k=k)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from frizbee_tpu.config import Config
    from frizbee_tpu.corpus import pack_corpus
    from frizbee_tpu.datagen import no_match_corpus, partial_match_corpus
    from frizbee_tpu.matcher import Matcher

    which = sys.argv[1:] or ["qscale", "nomatch"]
    N = 1_000_000
    cfg = Config()
    rng = np.random.default_rng(99)
    base = "deadbeef"
    names = [base]
    while len(names) < 64:
        s = "".join(rng.permutation(list(base)))
        if s not in names:
            names.append(s)

    pm = pack_corpus(
        partial_match_corpus(median_length=64, num_samples=N), unicode=False
    )
    qs_all = [Matcher.from_query(s, cfg) for s in names]

    if "qscale" in which:
        for q in (8, 32, 64):
            dt = time_batch(qs_all[:q], pm, cfg)
            rec("partial_q", q=q, seconds=dt, per_query_ms=dt / q * 1e3)

    if "nomatch" in which:
        nm = pack_corpus(
            no_match_corpus(median_length=64, num_samples=N), unicode=False
        )
        dt = time_batch(qs_all[:32], nm, cfg)
        rec("no_match_q32", seconds=dt, per_query_ms=dt / 32 * 1e3)

    if "allscores" in which:
        cfg2 = Config(max_typos=None)
        qs2 = [Matcher.from_query(s, cfg2) for s in names[:8]]
        dt = time_batch(qs2, pm, cfg2)
        rec("all_scores_q8", seconds=dt, per_query_ms=dt / 8 * 1e3)


if __name__ == "__main__":
    main()
