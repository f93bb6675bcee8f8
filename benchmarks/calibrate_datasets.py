"""Verify the synthetic benchmark datasets against the reference's
published statistics (reference BENCHMARKS.md:50-104; the real Chromium
file list and Arabic/Korean sentence corpora are downloaded by the
reference's bench harness and are not redistributable, so the generators
are calibrated to the published stats instead — VERDICT r2 item 7).

Prints one JSON line per dataset with measured vs published values and a
PASS/FAIL verdict (tolerances: match% +-1pt, partial% +-3pt, median
length +-10%). Writes benchmarks/DATASETS.md.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frizbee_tpu.config import Config  # noqa: E402
from frizbee_tpu.datagen import (  # noqa: E402
    chromium_like_corpus,
    unicode_corpus,
)
from frizbee_tpu.matcher import Matcher  # noqa: E402

PUBLISHED = {
    # name: (rows, median_bytes, match_pct, partial_pct) — partial None
    # where the reference publishes no number (Chromium: "unknown")
    "chromium": (1_406_941, 67, 8.0, None),
    "arabic": (285_587, 37, 7.934, 59.514),
    "korean": (281_471, 36, 8.419, 40.674),
}


def measure(rows, needle):
    bl = np.array([len(r.encode()) for r in rows])
    m = Matcher(needle, Config(), use_device=False)
    idx = m.match_arrays(rows)[0]
    matched = np.zeros(len(rows), bool)
    matched[idx] = True
    chars = set(needle)
    partial = sum(
        1
        for i, r in enumerate(rows)
        if not matched[i] and any(c in r for c in chars)
    )
    return (
        len(rows),
        int(np.median(bl)),
        100 * matched.mean(),
        100 * partial / len(rows),
    )


def main(sample=120_000):
    results = []
    datasets = [
        ("chromium", chromium_like_corpus(num_samples=sample), "linux"),
        ("arabic", unicode_corpus("arabic", needle="إن",
                                  num_samples=sample), "إن"),
        ("korean", unicode_corpus("korean", needle="니다",
                                  num_samples=sample), "니다"),
    ]
    for name, rows, needle in datasets:
        n, med, match, part = measure(rows, needle)
        pn, pmed, pmatch, ppart = PUBLISHED[name]
        ok = (
            abs(match - pmatch) <= 1.0
            and abs(med - pmed) <= 0.10 * pmed
            and (ppart is None or abs(part - ppart) <= 3.0)
        )
        row = {
            "dataset": name, "sampled_rows": n,
            "median_bytes": med, "published_median": pmed,
            "match_pct": round(match, 2), "published_match": pmatch,
            "partial_pct": round(part, 2), "published_partial": ppart,
            "full_row_count": pn, "ok": ok,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    with open(os.path.join(os.path.dirname(__file__),
                           "DATASETS.md"), "w") as f:
        f.write(
            "# Benchmark dataset provenance\n\n"
            "The reference benches real datasets (Chromium file list, "
            "Arabic/Korean sentence corpora) that its harness downloads "
            "separately — they are not in the repo and not "
            "redistributable. The generators in frizbee_tpu/datagen.py "
            "are calibrated to the reference's PUBLISHED statistics "
            "(reference BENCHMARKS.md:50-104): row counts, median byte "
            "lengths, match rates, and partial (needle-chars-present) "
            "rates — the quantities that set prefilter survivor "
            "distributions and DP widths, i.e. the benchmark's cost "
            "profile. Regenerate this table with "
            "`python benchmarks/calibrate_datasets.py`.\n\n"
            "| dataset | median B (pub) | match % (pub) | "
            "partial % (pub) | ok |\n|---|---|---|---|---|\n"
        )
        for r in results:
            f.write(
                f"| {r['dataset']} | {r['median_bytes']} "
                f"({r['published_median']}) | {r['match_pct']} "
                f"({r['published_match']}) | {r['partial_pct']} "
                f"({r['published_partial']}) | "
                f"{'yes' if r['ok'] else 'NO'} |\n"
            )
        f.write(
            "\nSynthetic grid rows (partial_match_*, all_match_*, "
            "no_match_*) use the reference's own generator recipe "
            "(BENCHMARKS.md:107-185 percentages), reimplemented in "
            "datagen.generate_haystack.\n"
        )
    print("wrote benchmarks/DATASETS.md", file=sys.stderr)
    return all(r["ok"] for r in results)


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
