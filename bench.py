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
overlaps the host-link round trip with device execution). That is the
deployment shape for an accelerator: the host link here is a tunnel with
~26 ms RTT and ~30 MB/s, so single-query latency measures the link, not
the engine (reported in extra anyway), and shipping every match row of a
1M-row corpus over it would measure the tunnel too.

Prints one JSON line PER COMPLETED STAGE (each line is complete and
self-sufficient; the last line is the best available measurement — a
driver that kills the process mid-run still gets every stage that
finished). vs_baseline is against the reference's published
single-thread rate on this dataset profile: 1.24 ms / 100k haystacks =
80.6M haystacks/s (Ryzen 9950x3D, BENCHMARKS.md:122-124; the reference's
cost is linear in corpus size — 63M hay/s on 1.4M-row Chromium).
"""

import json
import sys
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
# errors) while the relay is down — so the probe retries over a bounded
# window, every stage prints its own JSON line the moment it completes
# (round-2 bench was lost to a tunnel drop, round-3 to an external
# SIGKILL that arrived before the old single-emit-at-the-end design
# printed anything), and the whole measurement runs under a deadline.
PROBE_ATTEMPTS = 2
PROBE_TIMEOUT_S = 75.0
PROBE_RETRY_SLEEP_S = 15.0
MEASURE_DEADLINE_S = 420.0


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
    print(json.dumps(line), flush=True)


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

    state = {"stage": "start"}
    worker = threading.Thread(target=_measure, args=(state,), daemon=True)
    worker.start()
    worker.join(MEASURE_DEADLINE_S)

    # One retry on a mid-measure device fault (the tunneled TPU worker
    # can crash and restart — seen live in round 4, where for a stretch
    # the device faulted on LARGE programs while smaller ones ran fine).
    # The retry halves the batch width so the retry program is ~4x
    # lighter; throughput amortizes slightly less, but a smaller real
    # number beats no number.
    if (
        not state.get("done")
        and not state.get("emitted")  # a partial line already stands
        and "UNAVAILABLE" in state.get("error", "")
    ):
        time.sleep(20.0)
        if _device_reachable():
            state = {"stage": "retry", "q": Q // 4}
            worker = threading.Thread(
                target=_measure, args=(state,), daemon=True
            )
            worker.start()
            worker.join(MEASURE_DEADLINE_S / 2)

    if state.get("done"):
        return  # final line already printed by the worker
    # Deadline hit (or tunnel died mid-stage): if a stage already printed
    # a line, that line stands as the result; otherwise say why.
    if not state.get("emitted"):
        _emit(None, None, error=state.get(
            "error",
            f"no stage completed within {MEASURE_DEADLINE_S:.0f}s "
            f"(last stage: {state.get('stage')})",
        ))


def _measure(state):
  try:

    q_batch = state.get("q", Q)
    from frizbee_tpu.config import Config
    from frizbee_tpu.corpus import pack_corpus
    from frizbee_tpu.datagen import partial_match_corpus
    from frizbee_tpu.matcher import (
        Matcher,
        match_topk_batch,
        match_topk_batch_async,
    )

    state["stage"] = "pack"
    haystacks = partial_match_corpus(median_length=MEDIAN_LEN, num_samples=N)
    corpus = pack_corpus(haystacks, unicode=False)

    queries = [Matcher.from_query(s, Config()) for s in _queries(q_batch)]

    # Warmup: compile + device upload. With the persistent XLA cache warm
    # (~/.cache/frizbee_tpu_xla — program shapes are corpus-size-class
    # quantized so any 1M-row corpus hits it) this is seconds, not minutes.
    state["stage"] = "warmup"
    match_topk_batch(queries, corpus, Config(), k=TOP_K)

    # Blocking round-trip serving (one batch in flight at a time).
    # Emits the first real measurement line — everything after this
    # only improves on it.
    state["stage"] = "blocking"
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = match_topk_batch(queries, corpus, Config(), k=TOP_K)
        times.append(time.perf_counter() - t0)
    blocking_dt = float(np.median(times))
    blocking_hps = q_batch * N / blocking_dt
    state["emitted"] = True
    _emit(
        round(blocking_hps),
        round(blocking_hps / REF_HAYSTACKS_PER_SEC, 4),
        extra={
            "corpus_rows": N, "batch_queries": q_batch, "top_k": TOP_K,
            "blocking_batch_seconds": blocking_dt,
            "note": "blocking-loop rate (pipelined stage still running)",
        },
    )

    # Steady-state pipelined serving: 3 batches in flight so the host-link
    # round trip overlaps device execution (match_topk_batch_async — the
    # production pattern; the reference's number is likewise a hot-loop
    # throughput, not a cold round trip)
    state["stage"] = "pipelined"
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

    # Single-query latency (RTT-bound on this host link) — measured last
    # so it can never cost the headline its deadline budget.
    state["stage"] = "latency"
    matcher = Matcher("deadbeef", Config())
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = matcher.match_arrays(corpus)
        lat.append(time.perf_counter() - t0)
    latency = float(np.median(lat))
    n_matches = int(len(out[0]))

    hps = q_batch * N / dt
    _emit(
        round(hps),
        round(hps / REF_HAYSTACKS_PER_SEC, 4),
        extra={
            "corpus_rows": N,
            "batch_queries": q_batch,
            "top_k": TOP_K,
            "batch_seconds": dt,
            "pipeline_depth": DEPTH,
            "blocking_batch_seconds": blocking_dt,
            "single_query_latency_seconds": latency,
            "single_query_matches": n_matches,
            "reference_haystacks_per_sec": REF_HAYSTACKS_PER_SEC,
        },
    )
    state["done"] = True
  except Exception as exc:  # noqa: BLE001 — any failure becomes a line
    state["error"] = f"{type(exc).__name__}: {exc}"
    if not state.get("emitted"):
        _emit(None, None, error=state["error"])
    sys.stdout.flush()


if __name__ == "__main__":
    main()
