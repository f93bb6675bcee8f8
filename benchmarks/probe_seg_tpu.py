"""Compiled-Mosaic probe for the sub-lane packed (seg) kernel path.

Packs short-row corpora into narrow buckets (W < 128) and checks
device == host oracle row-for-row, per width and typo budget, on the
real TPU. Each width is a new Mosaic program shape: first run compiles
remotely (minutes/shape), repeats hit the persistent cache.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from frizbee_tpu.config import Config
from frizbee_tpu.corpus import pack_corpus
from frizbee_tpu.datagen import HaystackGenerationOptions, generate_haystack
from frizbee_tpu.matcher import Matcher

WIDTHS = [int(w) for w in sys.argv[1:]] or [64, 32, 16]


def probe(width: int):
    hay = generate_haystack(
        "deadbeef",
        HaystackGenerationOptions(
            seed=5, partial_match_percentage=0.35, match_percentage=0.15,
            median_length=max(8, width - 6), std_dev_length=4,
            num_samples=4000,
        ),
    )
    hay = [h[:width] for h in hay]
    corpus = pack_corpus(hay, unicode=False, bucket_widths=(width,))
    for typos in (0, 1):
        cfg = Config(max_typos=typos)
        dev = Matcher("deadbeef", cfg)
        host = Matcher("deadbeef", cfg, use_device=False)
        t0 = time.time()
        dm = dev.match_list(corpus)
        dt = time.time() - t0
        hm = host.match_list(hay)
        ok = len(dm) == len(hm) and all(
            a.score == b.score and a.index == b.index
            and a.exact == b.exact
            for a, b in zip(dm, hm)
        )
        print(json.dumps({
            "width": width, "typos": typos, "rows": len(hay),
            "device_matches": len(dm), "host_matches": len(hm),
            "ok": ok, "first_call_s": round(dt, 2),
        }), flush=True)
        if not ok:
            for i, (a, b) in enumerate(zip(dm, hm)):
                if (a.score, a.index, a.exact) != (b.score, b.index,
                                                   b.exact):
                    print("first diff at", i, a, b)
                    break
            raise SystemExit(1)


for w in WIDTHS:
    probe(w)
print("SEG TPU PROBE OK")
