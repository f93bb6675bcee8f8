"""Full benchmark matrix, replicating the reference's dataset grid
(reference: benches/match_list/mod.rs, BENCHMARKS.md).

Writes one JSON line per configuration to stdout and a markdown table to
benchmarks/RESULTS.md. Run on the target accelerator:

    python benchmarks/run_all.py [--quick]

Configurations (all 100k haystacks, needle "deadbeef" unless noted):
  partial_match_{16,32,64,128}   5% full / 20% partial, default config
  all_match_{16,64,128}          everything matches, default config
  all_scores_128                 max_typos=None (pure DP, no prefilter)
  no_match_{16,128}              nothing matches (prefilter-bound)
  typo_{1,2,3}_64                typo budgets on the partial corpus
  unicode_arabic / unicode_korean  synthetic script corpora, 2-char needle
Single-query latency and amortized serving throughput (batch of 8
distinct queries) are both reported.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from frizbee_tpu.config import Config  # noqa: E402
from frizbee_tpu.corpus import pack_corpus  # noqa: E402
from frizbee_tpu.datagen import (  # noqa: E402
    all_match_corpus,
    no_match_corpus,
    partial_match_corpus,
    unicode_corpus,
)
from frizbee_tpu.matcher import Matcher, match_arrays_batch  # noqa: E402

# reference single-thread milliseconds (BENCHMARKS.md; Ryzen 9950x3D)
REFERENCE_MS = {
    "partial_match_16": 0.879, "partial_match_32": 0.868,
    "partial_match_64": 1.24, "partial_match_128": 1.78,
    "all_match_16": 8.57, "all_match_64": 10.65, "all_match_128": 18.15,
    "all_scores_128": 18.27,
    "no_match_16": 0.140, "no_match_128": 0.462,
    "typo_1_64": 1.85, "typo_2_64": 2.36, "typo_3_64": 3.80,
    "unicode_arabic": 2.60 * 100 / 286,   # scaled to 100k rows
    "unicode_korean": 2.53 * 100 / 281,
}

VARIANTS = [
    "deadbeef", "deafbeed", "beefdead", "feedbead",
    "abadcafe", "cafebabe", "dabbadoo", "beadfeed",
]
UNICODE_VARIANTS = {
    "إن": ["إن", "لا", "ما", "في", "من", "هل", "ان", "نم"],
    "니다": ["니다", "하다", "있다", "없다", "보다", "가다", "오다", "주다"],
}


def bench_config(name, haystacks, needle, config, n_queries=8):
    unicode = config.unicode.respects_unicode_for(needle)
    corpus = pack_corpus(haystacks, unicode=unicode)
    matcher = Matcher(needle, config)
    matcher.match_arrays(corpus)  # warm single
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = matcher.match_arrays(corpus)
        lat.append(time.perf_counter() - t0)
    latency = float(np.median(lat))

    serving = None
    if n_queries > 1:
        # fetch capacity >= result set (quantized so programs cache);
        # otherwise every query overflows into the per-query fallback
        count = int(len(out[0]))
        fetch = 6144
        while fetch <= count:
            fetch *= 2
        variants = UNICODE_VARIANTS.get(needle, VARIANTS)
        qs = [Matcher(v, config) for v in variants[:n_queries]]
        match_arrays_batch(qs, corpus, config, fetch_rows=fetch)  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            match_arrays_batch(qs, corpus, config, fetch_rows=fetch)
            ts.append(time.perf_counter() - t0)
        serving = float(np.median(ts)) / n_queries

    n = len(haystacks)
    ref_s = REFERENCE_MS.get(name, 0) / 1e3
    row = {
        "config": name,
        "haystacks": n,
        "matches": int(len(out[0])),
        "latency_ms": round(latency * 1e3, 3),
        "serving_ms_per_query": (
            round(serving * 1e3, 3) if serving else None
        ),
        "haystacks_per_sec_serving": (
            round(n / serving) if serving else round(n / latency)
        ),
        "reference_ms": round(ref_s * 1e3, 3) if ref_s else None,
        "vs_reference": (
            round(ref_s / (serving or latency), 3) if ref_s else None
        ),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fewer configs, 8 queries -> 4")
    ap.add_argument("--n", type=int, default=100_000)
    args = ap.parse_args()
    N = args.n
    nq = 4 if args.quick else 8
    rows = []

    lengths = [64] if args.quick else [16, 32, 64, 128]
    for L in lengths:
        rows.append(bench_config(
            f"partial_match_{L}",
            partial_match_corpus(median_length=L, num_samples=N),
            "deadbeef", Config(), nq))
    for L in ([64] if args.quick else [16, 64, 128]):
        rows.append(bench_config(
            f"all_match_{L}",
            all_match_corpus(median_length=L, num_samples=N),
            "deadbeef", Config(), nq))
    if not args.quick:
        rows.append(bench_config(
            "all_scores_128",
            all_match_corpus(median_length=128, num_samples=N),
            "deadbeef", Config(max_typos=None), nq))
        for L in (16, 128):
            rows.append(bench_config(
                f"no_match_{L}",
                no_match_corpus(median_length=L, num_samples=N),
                "deadbeef", Config(), nq))
    pm64 = partial_match_corpus(median_length=64, num_samples=N)
    for t in ([1] if args.quick else [1, 2, 3]):
        rows.append(bench_config(
            f"typo_{t}_64", pm64, "deadbeef", Config(max_typos=t), nq))
    for script, needle in (("arabic", "إن"), ("korean", "니다")):
        if args.quick and script == "korean":
            continue
        rows.append(bench_config(
            f"unicode_{script}",
            unicode_corpus(script, num_samples=N, needle=needle,
                           needle_every=20),
            needle, Config(), nq))

    with open("benchmarks/RESULTS.md", "w") as f:
        f.write("# Benchmark results\n\n")
        f.write("| config | haystacks | matches | latency ms | "
                "serving ms/q | hay/s | ref ms | vs ref |\n")
        f.write("|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(
                f"| {r['config']} | {r['haystacks']} | {r['matches']} | "
                f"{r['latency_ms']} | {r['serving_ms_per_query']} | "
                f"{r['haystacks_per_sec_serving']} | {r['reference_ms']} | "
                f"{r['vs_reference']} |\n"
            )
    print("wrote benchmarks/RESULTS.md", file=sys.stderr)


if __name__ == "__main__":
    main()
