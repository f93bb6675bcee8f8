"""Randomized compiled-path differential soak on the real TPU:
device (Mosaic-compiled kernels) vs host oracle across fuzzy/literal/
multi-pattern/negation/typo configs on small mixed corpora."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
from frizbee_tpu.config import CaseMatching, Config, Matching
from frizbee_tpu.corpus import pack_corpus
from frizbee_tpu.datagen import partial_match_corpus, unicode_corpus
from frizbee_tpu.matcher import Matcher, match_arrays_batch

rng = np.random.default_rng(123)
t0 = time.time()
checks = 0

def parity(queries, corpus, cfg, label, syntax=True):
    global checks
    mk = (lambda q: Matcher.from_query(q, cfg)) if syntax else (lambda q: Matcher(q, cfg))
    res = match_arrays_batch([mk(q) for q in queries], corpus, cfg)
    for q, r in zip(queries, res):
        hm = (Matcher.from_query(q, cfg, use_device=False) if syntax
              else Matcher(q, cfg, use_device=False))
        ref = hm.match_arrays(corpus)
        for a, b, n in zip(r, ref, "isxe"):
            np.testing.assert_array_equal(a, b, err_msg=f"{label} q={q!r} {n}")
        checks += 1
    print(f"OK {label} ({time.time()-t0:.0f}s)", flush=True)

hay = partial_match_corpus(median_length=24, num_samples=20000, seed=5)
corpus = pack_corpus(hay, unicode=False)

words = ["dead", "beef", "cafe", "feed", "db", "ad", "deadbeef", "eadbe"]
# fuzzy with typo budgets
for t in (0, 1, 2, None):
    qs = list(rng.choice(words, 3))
    parity(qs, corpus, Config(max_typos=t), f"fuzzy typos={t}", syntax=False)
# literal modes via config + atoms
for mode in (Matching.SUBSTRING, Matching.PREFIX, Matching.SUFFIX, Matching.EXACT):
    parity(list(rng.choice(words, 3)), corpus, Config(matching=mode),
           f"literal {mode.value}", syntax=False)
# query syntax: atoms, negation, multi
parity(["dead beef", "'dead fe", "^de ad$", "!cafe dead", "dead !beef 'fe",
        "!dead !beef"], corpus, Config(), "multi/atoms")
# casing modes
for cm in (CaseMatching.IGNORE, CaseMatching.RESPECT, CaseMatching.SMART):
    parity(["Dead BEef"], corpus, Config(casing=cm), f"casing {cm}")
# unicode corpus: fuzzy + literal + multi
uhay = unicode_corpus("arabic", num_samples=15000, median_units=14, needle="إن", seed=7)
ucorpus = pack_corpus(uhay, unicode=True)
parity(["إن", "ن إ", "إن !ما", "'إن"], ucorpus, Config(), "unicode multi")
parity(["إن"], ucorpus, Config(matching=Matching.SUBSTRING), "unicode literal", syntax=False)
print(f"SOAK OK: {checks} device==host checks in {time.time()-t0:.0f}s", flush=True)
