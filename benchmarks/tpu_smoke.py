"""Real-TPU differential smoke: device engine vs host oracle on a small
corpus. First Mosaic compile check for kernel changes (small grids compile
fastest and populate the persistent cache). Prints one PASS/FAIL line per
config."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(name, queries, hay, cfg, unicode=False):
    from frizbee_tpu.corpus import pack_corpus
    from frizbee_tpu.matcher import Matcher, match_arrays_batch

    t0 = time.perf_counter()
    try:
        corpus = pack_corpus(hay, unicode=unicode)
        res = match_arrays_batch(queries, corpus, cfg)
        ok = True
        for q, r in zip(queries, res):
            ref = Matcher.from_query(q, cfg, use_device=False).match_arrays(
                hay
            )
            for a, b in zip(r, ref):
                if not np.array_equal(a, b):
                    ok = False
                    print(f"  MISMATCH {name} q={q!r}")
                    break
        print(
            f"{'PASS' if ok else 'FAIL'} {name} "
            f"({time.perf_counter() - t0:.1f}s)", flush=True,
        )
        return ok
    except Exception as e:  # noqa: BLE001
        print(f"ERROR {name}: {e!r}"[:500], flush=True)
        return False


def main():
    from frizbee_tpu.config import Config
    from frizbee_tpu.datagen import partial_match_corpus, unicode_corpus

    which = sys.argv[1:] or ["ascii0"]
    hay = partial_match_corpus(median_length=48, num_samples=7900, seed=3)
    ok = True
    if "ascii0" in which:
        ok &= run("ascii T=0 int16", ["deadbeef", "beadfeed"], hay, Config())
    if "typos" in which:
        ok &= run("ascii T=1", ["deadbeef"], hay, Config(max_typos=1))
        ok &= run("ascii T=2", ["daedbeef"], hay, Config(max_typos=2))
    if "nopre" in which:
        ok &= run("ascii all-scores", ["dead"], hay, Config(max_typos=None))
    if "unicode" in which:
        uhay = unicode_corpus(
            "arabic", num_samples=7900, median_units=18, needle="إن", seed=4
        )
        ok &= run("unicode T=0", ["إن"], uhay, Config(), unicode=True)
    print("SMOKE", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
