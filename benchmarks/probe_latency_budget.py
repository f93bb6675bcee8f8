"""Single-query blocking-latency budget (VERDICT round-4 #5).

Breaks one blocking `match_arrays` round trip into its stages for the
partial_match_64 and chromium_like profiles, next to the raw link
floors, so RESULTS.md can show WHERE the ~90 ms goes:

  dispatch   host graph build + async program launch (returns early)
  device     block_until_ready on the result (execution, no transfer)
  head       np.asarray of the 1+8192-row head slice (~64 KB)
  rest       second fetch of the remaining matches (count - 8192 rows)
  fixups     host-side greedy/XL fixups + ordering

plus link_rtt_ms (4-byte fetch) and link_mb_s (one 4 MB fetch). The
expected floor for a FULL-result single query is
rtt + result_bytes / link_bw — match_arrays must ship every match row;
top-k serving (match_topk_batch, k<=2048) is the latency shape for
consumers that don't need the full list.

    python benchmarks/probe_latency_budget.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from frizbee_tpu.config import Config  # noqa: E402
from frizbee_tpu.corpus import pack_corpus  # noqa: E402
from frizbee_tpu.datagen import (  # noqa: E402
    chromium_like_corpus,
    partial_match_corpus,
)
from frizbee_tpu.matcher import Matcher, match_topk_batch  # noqa: E402

OUT = "benchmarks/probe_latency_budget.jsonl"


def link_floors():
    import jax.numpy as jnp

    small = jnp.zeros((1,), jnp.int32) + 1
    np.asarray(small)  # warm
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(small + 1)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    big = jnp.zeros((1 << 20,), jnp.int32) + 1  # 4 MB
    np.asarray(big)
    bws = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(big + 1)
        bws.append(time.perf_counter() - t0)
    bw = (4 << 20) / (float(np.median(bws)) - rtt)
    return rtt, bw


def budget(name, corpus, needle, rtt, bw):
    m = Matcher(needle, Config())
    m.match_arrays(corpus)  # warm compiles
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        pending = m._fused_dispatch(corpus)
        t1 = time.perf_counter()
        _corpus, out, head = pending
        out.block_until_ready()
        t2 = time.perf_counter()
        head_np = np.asarray(head)
        t3 = time.perf_counter()
        count = int(head_np[0, 0])
        k = min(m.fetch_rows, len(corpus))
        if count > k:
            rows = np.concatenate(
                [head_np[1:], np.asarray(out[1 + k: 1 + count])], axis=0
            )
        else:
            rows = head_np[1: 1 + count]
        t4 = time.perf_counter()
        cols = m._decode_rows(rows)
        m._host_fixups(corpus, *cols)
        t5 = time.perf_counter()
        stages = {
            "dispatch_ms": (t1 - t0) * 1e3,
            "device_ms": (t2 - t1) * 1e3,
            "head_fetch_ms": (t3 - t2) * 1e3,
            "rest_fetch_ms": (t4 - t3) * 1e3,
            "fixups_ms": (t5 - t4) * 1e3,
            "total_ms": (t5 - t0) * 1e3,
        }
        if best is None or stages["total_ms"] < best["total_ms"]:
            best = stages
            best_count = count
    result_bytes = best_count * 8 + (1 + min(k, best_count)) * 8
    floor_ms = (rtt + result_bytes / bw) * 1e3
    # top-k single query: the latency consumers actually feel when they
    # don't need the full match list
    match_topk_batch([m], corpus, Config(), k=2048)  # warm
    tk = []
    for _ in range(3):
        t0 = time.perf_counter()
        match_topk_batch([m], corpus, Config(), k=2048)
        tk.append(time.perf_counter() - t0)
    row = {
        "profile": name, "matches": best_count,
        **{kk: round(v, 2) for kk, v in best.items()},
        "result_mb": round(result_bytes / 1e6, 2),
        "link_floor_ms": round(floor_ms, 1),
        "vs_link_floor": round(best["total_ms"] / floor_ms, 2),
        "topk_single_query_ms": round(float(np.median(tk)) * 1e3, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    rtt, bw = link_floors()
    rows = [{
        "probe": "link",
        "link_rtt_ms": round(rtt * 1e3, 2),
        "link_mb_s": round(bw / 1e6, 1),
    }]
    print(json.dumps(rows[0]), flush=True)
    pm = pack_corpus(
        partial_match_corpus(median_length=64, num_samples=1_000_000),
        unicode=False,
    )
    rows.append(budget("partial_match_64", pm, "deadbeef", rtt, bw))
    del pm
    ch = pack_corpus(chromium_like_corpus(), unicode=False)
    rows.append(budget("chromium_like", ch, "linux", rtt, bw))
    with open(OUT, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
