"""Headline benchmark: reference 'Partial Match' dataset, default config.

Reproduces the reference's bench configuration (benches/match_list/mod.rs,
BENCHMARKS.md:107-125): 100k synthetic haystacks, needle "deadbeef", 5% full
/ 20% partial match, median length 64 (std dev 16), Config::default()
(max_typos=0). The reference measures `match_list` over a resident &[&str];
we measure `match_arrays` over a resident packed corpus — the same work
(prefilter + SW + sort) ending in a sorted match list, column-oriented.

Prints one JSON line: haystacks/sec vs the reference's 1.24 ms (80.6M
haystacks/s single-thread Ryzen 9950x3D, BENCHMARKS.md:122-124).
"""

import json
import time

import numpy as np


REF_SECONDS = 1.24e-3  # reference: Partial Match, len 64, default config
N = 100_000
MEDIAN_LEN = 64


def main():
    from frizbee_tpu.config import Config
    from frizbee_tpu.corpus import pack_corpus
    from frizbee_tpu.datagen import partial_match_corpus
    from frizbee_tpu.matcher import Matcher

    haystacks = partial_match_corpus(median_length=MEDIAN_LEN, num_samples=N)
    corpus = pack_corpus(haystacks, unicode=False)
    matcher = Matcher("deadbeef", Config())

    # Warmup: compile + device upload
    for _ in range(2):
        matcher.match_arrays(corpus)

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = matcher.match_arrays(corpus)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    n_matches = int(len(out[0]))

    hps = N / dt
    ref_hps = N / REF_SECONDS
    print(json.dumps({
        "metric": "partial_match_100k_len64_haystacks_per_sec",
        "value": round(hps),
        "unit": "haystacks/s",
        "vs_baseline": round(hps / ref_hps, 4),
        "extra": {
            "median_seconds": dt,
            "matches": n_matches,
            "reference_seconds": REF_SECONDS,
        },
    }))


if __name__ == "__main__":
    main()
