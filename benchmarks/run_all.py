"""Full benchmark matrix, replicating the reference's dataset grid
(reference: benches/match_list/mod.rs, BENCHMARKS.md) plus the
Chromium-profile headline and micro rows.

Writes one JSON line per configuration to stdout and a markdown table to
benchmarks/RESULTS.md. Run on the target accelerator:

    python benchmarks/run_all.py [--quick] [--n N]

Configurations (needle "deadbeef" unless noted):
  partial_match_{16,32,64,128}   5% full / 20% partial, default config
  all_match_{16,64,128}          everything matches, default config
  all_scores_128                 max_typos=None (pure DP, no prefilter)
  no_match_{16,128}              nothing matches (prefilter-bound)
  typo_{1,2,3}_64                typo budgets on the partial corpus
  unicode_arabic / unicode_korean  synthetic script corpora, 2-char needle
  chromium_like                  1.4M path-shaped rows, needle "linux"
                                 (the reference's headline profile,
                                 BENCHMARKS.md:50-65)
  copy_path / device_sort        micro rows (BENCHMARKS.md:187-215)

Metrics per row: single-query latency (RTT-bound on a tunneled link),
amortized top-k serving ms/query (Q distinct queries, one device program,
one fetch, exact counts + top-2048 rows), and haystacks/s. vs_reference
compares haystacks/s against the reference's single-thread rate for the
same profile (its cost is linear in corpus size, so rates compare across
N).
"""

import argparse
import json
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, ".")

from frizbee_tpu.config import Config  # noqa: E402
from frizbee_tpu.corpus import pack_corpus  # noqa: E402
from frizbee_tpu.datagen import (  # noqa: E402
    all_match_corpus,
    chromium_like_corpus,
    no_match_corpus,
    partial_match_corpus,
    unicode_corpus,
    xl_heavy_corpus,
)
from frizbee_tpu.matcher import (  # noqa: E402
    Matcher,
    match_topk_batch,
    match_topk_batch_async,
)

# reference single-thread milliseconds per 100k rows
# (BENCHMARKS.md; Ryzen 9950x3D)
REFERENCE_MS_100K = {
    "partial_match_16": 0.879, "partial_match_32": 0.868,
    "partial_match_64": 1.24, "partial_match_128": 1.78,
    "all_match_16": 8.57, "all_match_64": 10.65, "all_match_128": 18.15,
    "all_scores_128": 18.27,
    "no_match_16": 0.140, "no_match_128": 0.462,
    # No Match with Partial (0% match / 15% partial), BENCHMARKS.md:147-165
    "no_match_partial_16": 0.25439, "no_match_partial_128": 0.69258,
    "typo_1_64": 1.85, "typo_2_64": 2.36, "typo_3_64": 3.80,
    "unicode_arabic": 2.60 * 100 / 286,   # per-100k-row scaling
    "unicode_korean": 2.53 * 100 / 281,
    # 1M-row twins: same profile, same per-100k anchor (reference cost
    # is linear in rows)
    "unicode_arabic_1m": 2.60 * 100 / 286,
    "unicode_korean_1m": 2.53 * 100 / 281,
    # Chromium: 22.36 ms / 1.407M rows (BENCHMARKS.md:50-64); the typo /
    # All Scores / iterator sequential variants are BENCHMARKS.md:64
    "chromium_like": 22.36 * 100 / 1407,
    "chromium_like_typo_1": 60.76 * 100 / 1407,
    "chromium_like_typo_2": 99.15 * 100 / 1407,
    "chromium_like_all_scores": 84.64 * 100 / 1407,
    "chromium_like_iter": 24.68 * 100 / 1407,
    # xl_heavy anchor (DERIVED — no reference dataset covers >1024-byte
    # rows): the reference's cost on the same 5%/20% Partial Match
    # structure is linear in row bytes (SIMD prefilter scan over every
    # byte + scoring on survivors), so scale its measured Partial Match
    # len-64 rate by the byte ratio 2048/64 = 32x. Favorable to the
    # reference: its >1024-byte rows take the LINEAR greedy scorer
    # (src/smith_waterman/greedy.rs) instead of the n x m SW its len-64
    # row pays, so the true reference rate is at or below this anchor.
    "xl_heavy": 1.24 * (2048 / 64),
    # 10M-row scaling row: the reference's cost is linear in rows, so
    # its Partial Match len-64 per-100k rate anchors any N
    "partial_match_10m": 1.24,
    # Literal + multi-pattern anchors (DERIVED — the reference publishes
    # no literal benchmark; these bound it from its own published rows,
    # favorably to the reference):
    #   substring: its literal path is a memmem-class rare-byte-seeded
    #   SIMD scan over every row byte (src/literal/algo.rs:262-313 +
    #   rank.rs), so it cannot beat the pure reject scan of its No
    #   Match prefilter rows on the same bytes. Anchor = No Match
    #   interpolated to len 64 (0.140 + 48/112*(0.462-0.140) =
    #   0.278 ms/100k), charging NOTHING for seed verification or
    #   scoring the ~5% matching rows.
    "literal_substring_64": 0.140 + (64 - 16) / (128 - 16) * (0.462 - 0.140),
    #   prefix: a <=8-byte head compare per row; anchor = its cheapest
    #   published per-row scan (No Match len 16, 0.140 ms/100k), again
    #   charging nothing for scoring.
    "literal_prefix_64": 0.140,
    #   multi-pattern "dead !cafe": the reference matches pattern 1 over
    #   all rows, then re-matches ONLY its survivors with each further
    #   pattern (src/matcher/multi.rs:84-152). Partial Match has 25% of
    #   rows containing "dead" (5% full + 20% partial), so cost ~=
    #   Partial Match len-64 x (1 + 0.25) = 1.55 ms/100k — favorable:
    #   pattern 1 here is 4 chars (cheaper DP than the anchored 8-char
    #   row) but the prefilter scan, not the DP, dominates its cost.
    "multi_pattern_64": 1.24 * 1.25,
}

VARIANTS = [
    "deadbeef", "deafbeed", "beefdead", "feedbead",
    "abadcafe", "cafebabe", "dabbadoo", "beadfeed",
    "defaced0", "baddeed1", "eadbeefd", "adbeefde",
    "dbeefdea", "ebdaefde", "faceb00c", "deedbeaf",
]
UNICODE_VARIANTS = {
    # 16 two-char variants per script so the unicode rows serve the same
    # Q=16 batch as every other row (8 left the per-batch fixed costs —
    # sorts, scan machinery, dispatch — half-amortized: measured 2.1 ->
    # 1.2 ms/q going 8 -> 16 on the arabic profile)
    "إن": ["إن", "لا", "ما", "في", "من", "هل", "ان", "نم",
           "إذ", "لم", "لن", "كي", "قد", "بل", "أو", "ثم"],
    "니다": ["니다", "하다", "있다", "없다", "보다", "가다", "오다", "주다",
           "사다", "살다", "쓰다", "자다", "차다", "타다", "크다", "따다"],
}
PATH_VARIANTS = ["linux", "winux", "lunix", "xinul", "nilux", "uxlin",
                 "inlux", "xunil"]


def bench_config(name, haystacks, needle, config, n_queries=8, k=2048,
                 query_syntax=False, query_variants=None):
    """One matrix row. ``query_syntax`` routes ``needle`` (and the
    serving variants) through Matcher.from_query — the literal and
    multi-pattern rows exercise the full query parser + combiner."""
    mk = (
        (lambda q: Matcher.from_query(q, config))
        if query_syntax
        else (lambda q: Matcher(q, config))
    )
    unicode = config.unicode.respects_unicode_for(needle)
    corpus = pack_corpus(haystacks, unicode=unicode)
    matcher = mk(needle)
    matcher.match_arrays(corpus)  # warm single
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = matcher.match_arrays(corpus)
        lat.append(time.perf_counter() - t0)
    latency = float(np.median(lat))

    serving = blocking = None
    if n_queries > 1:
        variants = query_variants or UNICODE_VARIANTS.get(
            needle, PATH_VARIANTS if needle == "linux" else VARIANTS
        )
        qs = [mk(v) for v in variants[:n_queries]]
        match_topk_batch(qs, corpus, config, k=k)  # warm
        # blocking-loop floor first: one batch in flight, full host-link
        # round trip per batch — the defensible rate on a shared device
        # whose pipelined throughput swings with tenant phases
        bt = []
        for _ in range(3):
            t0 = time.perf_counter()
            match_topk_batch(qs, corpus, config, k=k)
            bt.append(time.perf_counter() - t0)
        blocking = float(np.median(bt)) / n_queries
        # steady-state pipelined serving, 3 batches in flight (the
        # production shape; overlaps the host-link RTT with execution)
        DEPTH, RUNS = 3, 8
        futs = deque(
            match_topk_batch_async(qs, corpus, config, k=k)
            for _ in range(DEPTH)
        )
        t0 = time.perf_counter()
        for _ in range(RUNS):
            futs.append(match_topk_batch_async(qs, corpus, config, k=k))
            futs.popleft().result()
        serving = (time.perf_counter() - t0) / RUNS / n_queries
        while futs:
            futs.popleft().result()

    n = len(haystacks)
    ref_s_100k = REFERENCE_MS_100K.get(name, 0) / 1e3
    ref_hps = 100_000 / ref_s_100k if ref_s_100k else None
    hps = round(n / (serving or latency))
    # HBM roofline (BASELINE.md): a serving query's floor is one read of
    # the resident packed units — roofline_hps = HBM_BW / packed bytes
    # per row (v5e: 819 GB/s). pct > 100% is possible when stage-1 block
    # flags skip most of the corpus (the roofline denominator charges a
    # full pass).
    HBM_BW = 819e9
    unit_b = 4 if corpus.unicode else 1
    dev_bytes = sum(
        b.cp.shape[0] * b.cp.shape[1] * unit_b for b in corpus.buckets
    )
    pct_roofline = (
        round(100 * hps * dev_bytes / n / HBM_BW, 2)
        if serving and dev_bytes
        else None
    )
    row = {
        "config": name,
        "haystacks": n,
        "matches": int(len(out[0])),
        "latency_ms": round(latency * 1e3, 3),
        "serving_ms_per_query": (
            round(serving * 1e3, 3) if serving else None
        ),
        "haystacks_per_sec_serving": hps,
        "blocking_ms_per_query": (
            round(blocking * 1e3, 3) if blocking else None
        ),
        "haystacks_per_sec_blocking": (
            round(n / blocking) if blocking else None
        ),
        "reference_haystacks_per_sec": round(ref_hps) if ref_hps else None,
        "vs_reference": round(hps / ref_hps, 3) if ref_hps else None,
        "pct_hbm_roofline": pct_roofline,
        # tenant-phase provenance: the shared device's sustained rate
        # swings ~2-3x on hour scales; compare rows within one window
        "measured_at": time.strftime("%Y-%m-%d %H:%M"),
    }
    print(json.dumps(row), flush=True)
    return row


def bench_micro(rows):
    """Micro rows: the empty-needle copy path and the device select+sort
    stage (reference: BENCHMARKS.md:187-215 copy / radix)."""
    hay = partial_match_corpus(median_length=64, num_samples=100_000)
    m = Matcher("", Config())
    m.match_list(hay[:1])  # warm object paths
    t0 = time.perf_counter()
    out = m.match_list(hay)
    copy_s = time.perf_counter() - t0
    rows.append({
        "config": "copy_path_100k", "haystacks": len(hay),
        "matches": len(out),
        "latency_ms": round(copy_s * 1e3, 3),
        "serving_ms_per_query": None,
        "haystacks_per_sec_serving": round(len(hay) / copy_s),
        "reference_haystacks_per_sec": None,
        # reference copies 100k matches in ~15.9 us (pure memcpy; ours
        # builds Python Match objects — reported for the row's existence,
        # not parity)
        "vs_reference": None,
    })
    print(json.dumps(rows[-1]), flush=True)

    # device result-selection micro: the serving P3 op — pack 100k
    # (score, index, meta) rows into int64 keys, ONE single-operand sort,
    # decode [index, meta] (ops/batch.keys_from/_select_sorted) — vs the
    # reference's 131.9 us radix over the same row count. Timed as the
    # marginal cost of K extra iterations inside one jit (a dispatch loop
    # on this ~26 ms-RTT link measures the link, not the op).
    import jax
    import jax.numpy as jnp

    score = jnp.asarray(np.random.default_rng(0).integers(
        0, 1 << 15, 100_000, dtype=np.int32))
    index = jnp.asarray(np.arange(100_000, dtype=np.int32))
    idx_bits = 17

    def selection(i, s):
        with jax.enable_x64(True):
            comp = (((score ^ i) & 0x7FFF).astype(jnp.int64) << idx_bits
                    ) | index.astype(jnp.int64)
            k64 = jax.lax.sort(((-comp) << 16) | 7, is_stable=False)
            comp2 = -jax.lax.shift_right_arithmetic(k64, 16)
            out = (comp2 & ((1 << idx_bits) - 1)).astype(jnp.int32)
        return s ^ out[0]

    def loop(K):
        @jax.jit
        def f(c):
            return jax.lax.fori_loop(0, K, selection, c)

        np.asarray(f(jnp.int32(0)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(jnp.int32(0)))
            ts.append(time.perf_counter() - t0)
        # min rejects one-sided link jitter (the tunnel only adds delay)
        return float(np.min(ts))

    # the K spread must dwarf the ~26 ms RTT jitter: 480 extra sorts at
    # ~0.1 ms each is ~50 ms of marginal device time. A non-positive
    # differential means the measurement is jitter-dominated — retry once
    # with a wider spread, then publish nulls rather than a clamped value.
    sort_s = (loop(512) - loop(32)) / 480
    if sort_s <= 0:
        sort_s = (loop(2048) - loop(32)) / 2016
    if sort_s > 0:
        rows.append({
            "config": "device_sort_100k", "haystacks": 100_000, "matches": 0,
            "latency_ms": round(sort_s * 1e3, 3),
            "serving_ms_per_query": None,
            "haystacks_per_sec_serving": round(100_000 / sort_s),
            "reference_haystacks_per_sec": round(100_000 / 131.9e-6),
            "vs_reference": round((131.9e-6) / sort_s, 3),
        })
    else:
        rows.append({
            "config": "device_sort_100k", "haystacks": 100_000, "matches": 0,
            "latency_ms": None, "serving_ms_per_query": None,
            "haystacks_per_sec_serving": None,
            "reference_haystacks_per_sec": round(100_000 / 131.9e-6),
            "vs_reference": None,
            "error": "non-positive K-differential (link jitter dominated "
                     "the marginal device time); no valid measurement",
        })
    print(json.dumps(rows[-1]), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fewer configs, 16 queries -> 8")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--skip-chromium", action="store_true")
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated config-name substrings to run "
                         "(rows append to benchmarks/results.jsonl; the "
                         "markdown table regenerates from that file)")
    args = ap.parse_args()
    N = args.n
    nq = 8 if args.quick else 16
    only = [s for s in args.only.split(",") if s]
    rows = []

    def want(name):
        return not only or any(s in name for s in only)

    def run(name, *a, **kw):
        if not want(name):
            return
        try:
            rows.append(bench_config(name, *a, **kw))
            _persist(rows)  # crash-proof: every finished row lands
        except Exception as e:  # noqa: BLE001 — flaky backend errors
            print(json.dumps({"config": name, "error": repr(e)[:200]}),
                  flush=True)

    lengths = [64] if args.quick else [16, 32, 64, 128]
    for L in lengths:
        if want(f"partial_match_{L}"):
            run(f"partial_match_{L}",
                partial_match_corpus(median_length=L, num_samples=N),
                "deadbeef", Config(), nq)
    for L in ([64] if args.quick else [16, 64, 128]):
        if want(f"all_match_{L}"):
            run(f"all_match_{L}",
                all_match_corpus(median_length=L, num_samples=N),
                "deadbeef", Config(), nq)
    if not args.quick:
        if want("all_scores_128"):
            run("all_scores_128",
                all_match_corpus(median_length=128, num_samples=N),
                "deadbeef", Config(max_typos=None), nq)
        for L in (16, 128):
            if want(f"no_match_{L}"):
                run(f"no_match_{L}",
                    no_match_corpus(median_length=L, num_samples=N),
                    "deadbeef", Config(), nq)
        for L in (16, 128):
            if want(f"no_match_partial_{L}"):
                run(f"no_match_partial_{L}",
                    no_match_corpus(median_length=L, num_samples=N,
                                    partial=0.15),
                    "deadbeef", Config(), nq)
    if any(want(f"typo_{t}_64") for t in (1, 2, 3)):
        pm64 = partial_match_corpus(median_length=64, num_samples=N)
        for t in ([1] if args.quick else [1, 2, 3]):
            run(f"typo_{t}_64", pm64, "deadbeef", Config(max_typos=t), nq)
    for script, needle in (("arabic", "إن"), ("korean", "니다")):
        if args.quick and script == "korean":
            continue
        if want(f"unicode_{script}"):
            # calibrated defaults: published row counts / match / partial
            # rates (datagen._SCRIPT_CALIBRATION); tiny --n runs downscale
            run(f"unicode_{script}",
                unicode_corpus(
                    script, needle=needle,
                    num_samples=N if N < 280_000 else None,
                ),
                needle, Config(), nq)
        if want(f"unicode_{script}_1m") and not args.quick:
            # 1M-row scaling twin (same calibrated match/partial rates;
            # per-row reference cost is linear in rows so the per-100k
            # anchor carries): the published-count corpora are small
            # enough that per-query fixed costs and the k=2048 result
            # transport (~0.5 ms/q on this tunnel) dominate — at 1M
            # rows they amortize and the engine rate shows through
            run(f"unicode_{script}_1m",
                unicode_corpus(script, needle=needle,
                               num_samples=1_000_000),
                needle, Config(), nq)
    if not args.skip_chromium and any(
        want(n) for n in ("chromium_like", "chromium_like_typo_1",
                          "chromium_like_typo_2", "chromium_like_all_scores",
                          "chromium_like_iter")
    ):
        chromium = chromium_like_corpus()
        if want("chromium_like"):
            run("chromium_like", chromium, "linux", Config(), nq)
        for t in (1, 2):
            if want(f"chromium_like_typo_{t}"):
                run(f"chromium_like_typo_{t}", chromium, "linux",
                    Config(max_typos=t), nq)
        if want("chromium_like_all_scores"):
            run("chromium_like_all_scores", chromium, "linux",
                Config(max_typos=None), nq)
        if want("chromium_like_iter"):
            # sequential iterator API over the resident corpus (the
            # reference's match_iter row iterates in-memory strings; the
            # accelerator equivalent of "already in memory" is packed +
            # resident). Bounded below by Python's object-yield rate
            # (~1-2M Match objects/s) — a platform floor, not an engine
            # one. Raw-string input additionally pays per-chunk packing
            # + corpus upload (link-bound on a tunneled device).
            try:
                m = Matcher("linux", Config())
                corpus_ch = pack_corpus(chromium, unicode=False)
                sum(1 for _ in m.match_iter(corpus_ch))  # warm compiles
                best = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    n_m = sum(1 for _ in m.match_iter(corpus_ch))
                    d = time.perf_counter() - t0
                    best = d if best is None else min(best, d)
                dt = best
                # link budget: the row is bound by shipping every match
                # row over the tunnel (probe_latency_budget.py measures
                # rtt/bw); engine_side_hps removes that transport to
                # estimate the PCIe-deployment rate
                import jax.numpy as jnp

                small = jnp.zeros((1,), jnp.int32) + 1
                np.asarray(small)
                t0 = time.perf_counter()
                for _ in range(3):
                    np.asarray(small + 1)
                rtt = (time.perf_counter() - t0) / 3
                big = jnp.zeros((1 << 20,), jnp.int32) + 1
                np.asarray(big)
                t0 = time.perf_counter()
                np.asarray(big + 1)
                bw = (4 << 20) / max(time.perf_counter() - t0 - rtt, 1e-6)
                link_s = 2 * rtt + (n_m + 8193) * 8 / bw
                ref = 100_000 / (REFERENCE_MS_100K["chromium_like_iter"]
                                 / 1e3)
                hps = round(len(chromium) / dt)
                eng = round(len(chromium) / max(dt - link_s, 1e-9))
                rows.append({
                    "config": "chromium_like_iter",
                    "haystacks": len(chromium), "matches": n_m,
                    "latency_ms": round(dt * 1e3, 3),
                    "serving_ms_per_query": None,
                    "haystacks_per_sec_serving": hps,
                    "reference_haystacks_per_sec": round(ref),
                    "vs_reference": round(hps / ref, 3),
                    "link_ms_est": round(link_s * 1e3, 1),
                    "engine_side_hps_est": eng,
                    "engine_side_vs_reference": round(eng / ref, 3),
                })
                print(json.dumps(rows[-1]), flush=True)
                _persist(rows)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"config": "chromium_like_iter",
                                  "error": repr(e)[:200]}), flush=True)
    # Literal + multi-pattern serving rows: the full query syntax at 1M
    # rows (correctness is pinned by the property suites; these pin the
    # perf). No reference row exists for these modes in isolation
    # (frizbee benches only the fuzzy path), so vs_reference stays blank
    # and the absolute hay/s is the record.
    if any(want(n) for n in ("literal_substring_64", "literal_prefix_64",
                             "multi_pattern_64")):
        pm64 = partial_match_corpus(median_length=64, num_samples=N)
        lit_variants = ["'" + v for v in VARIANTS]
        if want("literal_substring_64"):
            run("literal_substring_64", pm64, "'deadbeef", Config(), nq,
                query_syntax=True, query_variants=lit_variants)
        if want("literal_prefix_64"):
            run("literal_prefix_64", pm64, "^deadbeef", Config(), nq,
                query_syntax=True,
                query_variants=["^" + v for v in VARIANTS])
        if want("multi_pattern_64"):
            run("multi_pattern_64", pm64, "dead !cafe", Config(), nq,
                query_syntax=True,
                query_variants=[v[:4] + " !" + v[4:] for v in VARIANTS])
    if want("xl_heavy"):
        # long-context shape: every row beyond the widest device bucket
        # runs the batched native host pipeline. vs_reference uses the
        # derived byte-scaled anchor (see REFERENCE_MS_100K["xl_heavy"])
        run("xl_heavy", xl_heavy_corpus(num_samples=min(N, 100_000)),
            "deadbeef", Config(), nq)
    if want("partial_match_10m") and not args.quick:
        # 10x the reference's largest corpus: per-row serving rate must
        # hold (wide result keys + bounded result sorts keep the fast
        # path at any size)
        run("partial_match_10m",
            partial_match_corpus(median_length=64, num_samples=10_000_000),
            "deadbeef", Config(), 8)
    if want("copy_path") or want("device_sort"):
        try:
            bench_micro(rows)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"config": "micro", "error": repr(e)[:200]}),
                  flush=True)

    _persist(rows)
    print("wrote benchmarks/RESULTS.md", file=sys.stderr)


def _persist(rows):
    """Merge ``rows`` into results.jsonl and regenerate RESULTS.md.
    Called after EVERY completed row (a mid-run device fault must not
    lose the rows that finished)."""
    seen = {}
    try:
        with open("benchmarks/results.jsonl") as f:
            for line in f:
                r = json.loads(line)
                seen[r["config"]] = r
    except FileNotFoundError:
        pass
    for r in rows:
        seen[r["config"]] = r
    with open("benchmarks/results.jsonl", "w") as f:
        for r in seen.values():
            f.write(json.dumps(r) + "\n")

    with open("benchmarks/RESULTS.md", "w") as f:
        f.write("# Benchmark results\n\n")
        f.write("| config | haystacks | matches | latency ms | "
                "serving ms/q | hay/s (pipelined) | hay/s (blocking) | "
                "ref hay/s | vs ref | % HBM roofline |\n")
        f.write("|---|---|---|---|---|---|---|---|---|---|\n")
        for r in seen.values():
            f.write(
                f"| {r['config']} | {r['haystacks']} | {r['matches']} | "
                f"{r['latency_ms']} | {r['serving_ms_per_query']} | "
                f"{r['haystacks_per_sec_serving']} | "
                f"{r.get('haystacks_per_sec_blocking')} | "
                f"{r['reference_haystacks_per_sec']} | "
                f"{r['vs_reference']} | "
                f"{r.get('pct_hbm_roofline')} |\n"
            )
        f.write(
            "\nServing = steady-state pipelined top-k batches "
            "(match_topk_batch_async, depth 3, 16 queries/batch, k=2048); "
            "hay/s (blocking) = the same batches with ONE batch in "
            "flight — a full host-link round trip per batch, the "
            "defensible floor on a shared device whose pipelined rate "
            "swings with tenant phases; latency = one blocking "
            "single-query round trip on a ~26 ms RTT host link "
            "(dominated by shipping the FULL result set — see the "
            "latency budget in probe_latency_budget.jsonl). copy_path "
            "measures the array-backed lazy "
            "MatchList return (per-element Match construction is deferred "
            "to access; the reference's row is a memcpy). device_sort is "
            "the marginal per-sort device time of the int64 single-operand "
            "result sort (K-iteration differential) vs the reference's "
            "131 us radix; in serving, sorts batch across the Q axis. "
            "% HBM roofline = serving hay/s vs one full 819 GB/s read of "
            "the packed corpus per query (>100% means stage-1 block "
            "flags skipped most of the pass); the DP-bound all_match / "
            "all_scores rows are COMPUTE-bound, not HBM-bound — "
            "probe_vpu_roofline.jsonl pins the kernel alone at ~60% of "
            "a stated VPU op ceiling (84-99 G DP cells/s) with HBM at "
            "2-3%. The unicode_arabic rows sit at a ~3.2 ms/q per-query "
            "floor that is INDEPENDENT of needle selectivity, Q, and "
            "(minus ~0.8 ms/q of transport) of k: replacing their "
            "result sort outright with the exact block-min tournament "
            "moved nothing (probe_broad_ab, bit-equal arms), and the "
            "root cause is stage-1 presence SATURATION — the arabic "
            "alphabet is small enough that 94.9% of 1024-row groups "
            "stay alive for ANY needle (korean: 8-33%, which is why "
            "korean_1m reaches ~0.95x of x8 on identical machinery) — "
            "see probe_arabic_decomp and STATUS.md. "
            "DERIVED anchors (all "
            "favorable to the reference, from its own published rows): "
            "xl_heavy = Partial Match len-64 byte-scaled x32 (its "
            ">1024 B rows take the linear greedy scorer); "
            "literal_substring_64 = its No Match reject-scan rate "
            "interpolated to len 64 (a rare-byte memmem scan over the "
            "same bytes, charging nothing for verification/scoring, "
            "src/literal/algo.rs:262-313); literal_prefix_64 = its "
            "cheapest per-row scan (No Match len 16) though a prefix "
            "compare touches <=8 bytes/row; multi_pattern_64 = Partial "
            "Match len-64 x 1.25 (pattern 1 over all rows + survivor "
            "re-match over the 25% containing it, "
            "src/matcher/multi.rs:84-152). chromium_like_iter iterates "
            "a resident Corpus; on this harness it is link-bound "
            "(every match row ships over the ~26 ms RTT / ~30 MB/s "
            "tunnel) — link_ms_est and engine_side_hps_est in "
            "results.jsonl carry the measured link subtraction, the "
            "PCIe-deployment estimate. Every row carries measured_at "
            "(results.jsonl): the shared device's sustained rate swings "
            "~2-3x between tenant phases, so only rows from one window "
            "compare at better than ~2x.\n\nVs the reference's "
            "PUBLISHED 8-THREAD rows (its real deployment mode; "
            "BENCHMARKS.md:65/85/105 — Chromium 404M, Arabic 594M, "
            "Korean 589M haystacks/s), this single chip serves "
        )
        x8 = {"chromium_like": 404e6, "unicode_arabic": 594e6,
              "unicode_korean": 589e6, "unicode_arabic_1m": 594e6,
              "unicode_korean_1m": 589e6}
        parts = []
        for cfg_name, anchor in x8.items():
            r = seen.get(cfg_name)
            if r and r.get("haystacks_per_sec_serving"):
                ratio = r["haystacks_per_sec_serving"] / anchor
                parts.append(f"{cfg_name} at {ratio:.2f}x")
        f.write(", ".join(parts) + ".\n")
        f.write(
            ""
        )


if __name__ == "__main__":
    main()
