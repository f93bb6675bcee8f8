"""Headline benchmark: reference 'Partial Match' profile at Chromium scale.

Dataset: the reference's Partial Match generator (benches/match_list/mod.rs,
BENCHMARKS.md:107-125 — needle "deadbeef", 5% full / 20% partial match,
median length 64, Config::default()) scaled to 1M haystacks, the reference's
own headline corpus scale (Chromium, 1.41M paths, BENCHMARKS.md:50-65).

Headline metric: sustained haystacks/sec in pipelined top-k serving — a
batch of distinct queries against one resident packed corpus, one device
program, one result fetch per batch, with 3 batches in flight
(`match_topk_batch_async`: exact total match count + the best k=2048 rows
per query; the full sorted match list stays device-resident; pipelining
overlaps the host-link round trip with device execution). That is the deployment shape for an accelerator: the
host link here is a tunnel with ~26 ms RTT and ~30 MB/s, so single-query
latency measures the link, not the engine (reported in extra anyway), and
shipping every match row of a 1M-row corpus over it would measure the
tunnel too.

Prints one JSON line; vs_baseline is against the reference's published
single-thread rate on this dataset profile: 1.24 ms / 100k haystacks =
80.6M haystacks/s (Ryzen 9950x3D, BENCHMARKS.md:122-124; the reference's
cost is linear in corpus size — 63M hay/s on 1.4M-row Chromium).
"""

import json
import time
from collections import deque

import numpy as np


REF_HAYSTACKS_PER_SEC = 100_000 / 1.24e-3  # reference Partial Match len 64
N = 1_000_000
MEDIAN_LEN = 64
Q = 32  # queries per serving batch
TOP_K = 2048


def _queries(q):
    """Distinct 8-char needles with the bench trace shape."""
    rng = np.random.default_rng(99)
    base = "deadbeef"
    out = [base]
    while len(out) < q:
        s = "".join(rng.permutation(list(base)))
        if s not in out:
            out.append(s)
    return out[:q]


METRIC = "partial_match_1m_len64_topk_serving_haystacks_per_sec"

# The tunneled device can drop mid-run, and jax.devices() HANGS (not
# errors) while the relay is down — so the probe retries over a window
# and the measurement runs under a deadline with staged partial results,
# so a flaky tunnel yields the best measurement taken instead of nothing
# (round-2 bench was lost to exactly this).
PROBE_ATTEMPTS = 4
PROBE_TIMEOUT_S = 150.0
PROBE_RETRY_SLEEP_S = 30.0
MEASURE_DEADLINE_S = 1800.0  # covers cold Mosaic compiles on a slow link


def _device_reachable(timeout_s: float = PROBE_TIMEOUT_S) -> bool:
    """Bounded backend probe (a daemon thread bounds the hang)."""
    import threading

    ok = threading.Event()

    def probe():
        import jax

        jax.devices()
        ok.set()

    threading.Thread(target=probe, daemon=True).start()
    return ok.wait(timeout_s)


def _emit(value, vs_baseline, extra=None, error=None):
    line = {
        "metric": METRIC,
        "value": value,
        "unit": "haystacks/s",
        "vs_baseline": vs_baseline,
    }
    if extra:
        line["extra"] = extra
    if error:
        line["error"] = error
    print(json.dumps(line))


def main():
    import threading

    for attempt in range(PROBE_ATTEMPTS):
        if _device_reachable():
            break
        if attempt + 1 < PROBE_ATTEMPTS:
            time.sleep(PROBE_RETRY_SLEEP_S)
    else:
        _emit(None, None, error=(
            f"device backend unreachable in {PROBE_ATTEMPTS} probes over "
            f"~{PROBE_ATTEMPTS * (PROBE_TIMEOUT_S + PROBE_RETRY_SLEEP_S):.0f}s "
            "(axon tunnel down); no measurement taken"
        ))
        return

    partial = {"stage": "start"}
    worker = threading.Thread(
        target=_measure, args=(partial,), daemon=True
    )
    worker.start()
    worker.join(MEASURE_DEADLINE_S)

    if "result" in partial:
        print(json.dumps(partial["result"]))
        return
    # The pipelined headline didn't complete (tunnel drop or deadline):
    # fall back to the blocking-loop rate if that stage finished.
    reason = partial.get(
        "error",
        f"measurement incomplete after {MEASURE_DEADLINE_S:.0f}s "
        f"(last stage: {partial.get('stage')})",
    )
    hps = partial.get("blocking_hps")
    _emit(
        round(hps) if hps else None,
        round(hps / REF_HAYSTACKS_PER_SEC, 4) if hps else None,
        extra={k: v for k, v in partial.items()
               if k not in ("result", "error")},
        error=f"partial result ({reason}); value is the blocking-loop "
              "rate" if hps else reason,
    )


def _measure(partial):
  try:

    from frizbee_tpu.config import Config
    from frizbee_tpu.corpus import pack_corpus
    from frizbee_tpu.datagen import partial_match_corpus
    from frizbee_tpu.matcher import (
        Matcher,
        match_topk_batch,
        match_topk_batch_async,
    )

    partial["stage"] = "pack"
    haystacks = partial_match_corpus(median_length=MEDIAN_LEN, num_samples=N)
    corpus = pack_corpus(haystacks, unicode=False)

    queries = [Matcher.from_query(s, Config()) for s in _queries(Q)]

    # Warmup: compile + device upload (single-query + batch traces)
    partial["stage"] = "warmup"
    matcher = Matcher("deadbeef", Config())
    matcher.match_arrays(corpus)
    match_topk_batch(queries, corpus, Config(), k=TOP_K)

    # Single-query latency (RTT-bound on this host link)
    partial["stage"] = "latency"
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = matcher.match_arrays(corpus)
        lat.append(time.perf_counter() - t0)
    latency = float(np.median(lat))
    n_matches = int(len(out[0]))
    partial["single_query_latency_seconds"] = latency

    # Blocking round-trip serving (one batch in flight at a time)
    partial["stage"] = "blocking"
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = match_topk_batch(queries, corpus, Config(), k=TOP_K)
        times.append(time.perf_counter() - t0)
    blocking_dt = float(np.median(times))
    partial["blocking_batch_seconds"] = blocking_dt
    partial["blocking_hps"] = Q * N / blocking_dt
    partial["stage"] = "pipelined"

    # Steady-state pipelined serving: 3 batches in flight so the host-link
    # round trip overlaps device execution (match_topk_batch_async — the
    # production pattern; the reference's number is likewise a hot-loop
    # throughput, not a cold round trip)
    DEPTH, RUNS = 3, 10
    futs = deque(
        match_topk_batch_async(queries, corpus, Config(), k=TOP_K)
        for _ in range(DEPTH)
    )
    t0 = time.perf_counter()
    for _ in range(RUNS):
        futs.append(match_topk_batch_async(queries, corpus, Config(),
                                           k=TOP_K))
        res = futs.popleft().result()
    dt = (time.perf_counter() - t0) / RUNS
    while futs:
        futs.popleft().result()
    assert len(res) == len(queries)
    # permuted variants can legitimately match nothing (stage-1 and the
    # kernels still do identical work — presence is order-blind); the
    # canonical needle must match and every result must be k-capped
    assert res[0][0] > 0
    assert all(len(r[1]) == min(r[0], TOP_K) for r in res)

    hps = Q * N / dt
    partial["result"] = {
        "metric": METRIC,
        "value": round(hps),
        "unit": "haystacks/s",
        "vs_baseline": round(hps / REF_HAYSTACKS_PER_SEC, 4),
        "extra": {
            "corpus_rows": N,
            "batch_queries": Q,
            "top_k": TOP_K,
            "batch_seconds": dt,
            "pipeline_depth": DEPTH,
            "blocking_batch_seconds": blocking_dt,
            "single_query_latency_seconds": latency,
            "single_query_matches": n_matches,
            "reference_haystacks_per_sec": REF_HAYSTACKS_PER_SEC,
        },
    }
  except Exception as exc:  # noqa: BLE001 — any failure becomes a line
    partial["error"] = f"{type(exc).__name__}: {exc}"


if __name__ == "__main__":
    main()
