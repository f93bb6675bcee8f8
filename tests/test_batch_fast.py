"""The Q-batched fast serving path (ops/batch._fused_match_batch_fast) and
``match_topk_batch``, differential-tested against the per-query device path
and the host oracle on the CPU backend.

Corpora here are sized past the kernel block size so the compacted flow
(stage-1 MXU matmul -> packed-key sort -> gather -> kernel) actually runs,
and include an all-match case that forces the capacity-miss in-place flow.
"""

import numpy as np
import pytest

from frizbee_tpu.config import Config
from frizbee_tpu.corpus import pack_corpus
from frizbee_tpu.datagen import (
    all_match_corpus,
    partial_match_corpus,
    unicode_corpus,
)
from frizbee_tpu.matcher import (
    Matcher,
    match_arrays_batch,
    match_topk_batch,
    match_topk_batch_async,
)

QUERIES = ["deadbeef", "feedbead", "badcafes", "dead"]


@pytest.fixture(scope="module")
def corpus_partial():
    hay = partial_match_corpus(median_length=24, num_samples=4500, seed=7)
    return pack_corpus(hay, unicode=False)


def _assert_query_parity(corpus, queries, cfg, k=None):
    if k is None:
        res = match_arrays_batch(queries, corpus, cfg)
    else:
        res = match_topk_batch(queries, corpus, cfg, k=k)
    for q, r in zip(queries, res):
        ref = Matcher.from_query(q, cfg, use_device=False).match_arrays(
            corpus
        )
        if k is None:
            got = r
        else:
            count, got = r[0], r[1:]
            assert count == len(ref[0])
            ref = tuple(a[:k] for a in ref)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(a, b)


def test_fast_compacted_flow_parity(corpus_partial):
    _assert_query_parity(corpus_partial, QUERIES, Config())


def test_fast_topk_counts_and_rows(corpus_partial):
    _assert_query_parity(corpus_partial, QUERIES, Config(), k=50)


def test_fast_in_place_flow_all_match():
    # every row matches -> survivor capacity misses -> in-place flow
    hay = all_match_corpus(median_length=24, num_samples=4500, seed=8)
    corpus = pack_corpus(hay, unicode=False)
    _assert_query_parity(corpus, ["deadbeef", "dbef"], Config())


def test_fast_typo_budgets(corpus_partial):
    for t in (1, 2):
        _assert_query_parity(
            corpus_partial, ["deadbeef", "daedbeef"], Config(max_typos=t)
        )


def test_fast_no_prefilter(corpus_partial):
    _assert_query_parity(
        corpus_partial, ["dead", "beef"], Config(max_typos=None)
    )


def test_fast_unicode_corpus():
    hay = unicode_corpus(
        "arabic", num_samples=4200, median_units=18, needle="إن",
        seed=9,
    )
    corpus = pack_corpus(hay, unicode=True)
    _assert_query_parity(
        corpus, ["إن", "نه"], Config()
    )


def test_batch_unit_mode_mismatch_falls_back():
    # ADVICE round-1 (high): an ASCII query served against a unicode-packed
    # corpus must not run the fused path in codepoint units — scores must
    # equal the per-query path's byte semantics.
    hay = ["a¢b", "ab", "xax b", "a b"] * 64
    corpus = pack_corpus(hay, unicode=True)
    res = match_arrays_batch(["ab", "é"], corpus, Config())
    for q, r in zip(["ab", "é"], res):
        ref = Matcher.from_query(q, Config(), use_device=False).match_arrays(
            hay
        )
        for a, b in zip(r, ref):
            np.testing.assert_array_equal(a, b)


def test_fast_multi_bucket_corpus():
    # mixed lengths spread across two width buckets -> the non-identity
    # index path (per-bucket contiguity broken) still decodes indices
    hay = partial_match_corpus(median_length=24, num_samples=2200, seed=11)
    hay += [h * 9 for h in
            partial_match_corpus(median_length=20, num_samples=2200,
                                 seed=12)]
    corpus = pack_corpus(hay, unicode=False)
    assert len(corpus.buckets) >= 2
    _assert_query_parity(corpus, ["deadbeef", "beef"], Config())


def test_async_batch_equals_sync(corpus_partial):
    """Pipelined dispatch (multiple futures in flight) must return exactly
    what the blocking call returns, and result() must be idempotent."""
    sync = match_topk_batch(QUERIES, corpus_partial, Config(), k=50)
    futs = [
        match_topk_batch_async(QUERIES, corpus_partial, Config(), k=50)
        for _ in range(3)
    ]
    for f in futs:
        res = f.result()
        for r, s in zip(res, sync):
            assert r[0] == s[0]
            for a, b in zip(r[1:], s[1:]):
                np.testing.assert_array_equal(a, b)
    assert futs[0].result() is futs[0].result()


def test_in_body_sort_parity():
    """When the batched P3 sort would exceed the HBM budget (10M+ rows),
    the result sort runs per query inside the scan body. Lower the budget
    so a small corpus takes that path, and pin parity with the oracle —
    including the in-place flow (all-match corpus)."""
    import jax

    import frizbee_tpu.ops.batch as ob

    hay = partial_match_corpus(median_length=24, num_samples=5200, seed=19)
    corpus = pack_corpus(hay, unicode=False)
    old = ob.SORT_BODY_BUDGET
    try:
        ob.SORT_BODY_BUDGET = 1024
        jax.clear_caches()
        _assert_query_parity(corpus, ["deadbeef", "dbef"], Config())
        _assert_query_parity(corpus, ["deadbeef"], Config(), k=30)
        # capacity-miss -> in-place flow, also with the in-body sort
        hay2 = all_match_corpus(median_length=24, num_samples=5200, seed=20)
        _assert_query_parity(
            pack_corpus(hay2, unicode=False), ["deadbeef"], Config()
        )
    finally:
        ob.SORT_BODY_BUDGET = old
        jax.clear_caches()


def test_key64_layout_roundtrip():
    """The int64 result key ([-((score << idx_bits) | (idx_mask - index))
    << 16 | meta16], ops/batch keys_from/decode) must realize (score
    desc, index asc) and round-trip meta at EVERY corpus scale — pinned
    here up to idx_bits=31 (2^31-row corpora) without building one."""
    import numpy as np

    rng = np.random.default_rng(7)
    for idx_bits in (10, 20, 24, 31):
        m = 4096
        idx_mask = (1 << idx_bits) - 1
        score = rng.integers(0, 0x10000, m).astype(np.int64)
        index = rng.integers(0, min(idx_mask + 1, 1 << 31), m)
        index = np.unique(index)
        score = score[: len(index)]
        meta16 = rng.integers(0, 0x10000, len(index)).astype(np.int64)
        comp = (score << idx_bits) | (idx_mask - index)
        k64 = ((-comp) << 16) | meta16
        order = np.argsort(k64, kind="stable")
        want = np.lexsort((index, -score))
        np.testing.assert_array_equal(index[order], index[want])
        np.testing.assert_array_equal(score[order], score[want])
        # decode round-trip (the finalize path's arithmetic)
        comp2 = -(k64 >> 16)
        s2 = comp2 >> idx_bits
        i2 = idx_mask - (comp2 & idx_mask)
        m2 = k64 & 0xFFFF
        np.testing.assert_array_equal(s2, score)
        np.testing.assert_array_equal(i2, index)
        np.testing.assert_array_equal(m2, meta16)


def test_fast_literal_serving_parity(corpus_partial):
    """Literal modes ride the flag-gated colstream fast path (round-5):
    multi-group corpus + Q>1 exercises stage-1 group flags, key-emit,
    and the capped finalize for contiguous-run matching."""
    from frizbee_tpu.config import Matching

    for mode in (
        Matching.SUBSTRING, Matching.PREFIX, Matching.SUFFIX,
        Matching.EXACT,
    ):
        cfg = Config(matching=mode)
        _assert_query_parity(
            corpus_partial, ["dead", "beef", "deadbeef"], cfg
        )


def test_fast_literal_serving_unicode():
    from frizbee_tpu.config import Matching

    hay = unicode_corpus(
        "arabic", num_samples=4200, median_units=18, needle="إن",
        seed=9,
    )
    corpus = pack_corpus(hay, unicode=True)
    for mode in (Matching.SUBSTRING, Matching.PREFIX):
        _assert_query_parity(
            corpus, ["إن", "ن"], Config(matching=mode)
        )


def test_fast_literal_ignores_typo_budget(corpus_partial):
    """Literal matching ignores max_typos (reference:
    src/literal/mod.rs:1-8) — the colstream literal route must run its
    stage-1 at T=0 and produce identical results for any budget,
    including None (which flips the fuzzy no_prefilter static)."""
    from frizbee_tpu.config import Matching

    for mt in (2, None):
        cfg = Config(matching=Matching.SUBSTRING, max_typos=mt)
        _assert_query_parity(corpus_partial, ["dead", "eadb"], cfg)


def test_fast_literal_topk(corpus_partial):
    from frizbee_tpu.config import Matching

    _assert_query_parity(
        corpus_partial, ["dead", "ea"],
        Config(matching=Matching.SUBSTRING), k=40,
    )


def test_fast_multi_pattern_serving_parity(corpus_partial):
    """Multi-pattern queries ride the stage-1-narrowed colstream fast
    path (round-5): AND-ed group flags, per-pattern columns-mode
    kernels, device combine, capped finalize. Mixes fuzzy, literal
    atoms, and negation at serving scale."""
    _assert_query_parity(
        corpus_partial,
        ["dead beef", "dead !beef", "'dead beef", "^de ad", "!dead !beef"],
        Config(),
    )
    _assert_query_parity(
        corpus_partial, ["dead beef", "daed beef"], Config(max_typos=1)
    )


def test_fast_multi_pattern_topk(corpus_partial):
    _assert_query_parity(
        corpus_partial, ["dead beef", "ea be"], Config(), k=40
    )


def test_fast_multi_pattern_unicode():
    hay = unicode_corpus(
        "arabic", num_samples=4200, median_units=18, needle="إن",
        seed=9,
    )
    corpus = pack_corpus(hay, unicode=True)
    _assert_query_parity(corpus, ["إن ن", "إن !م"], Config())


def test_mixed_finalize_parity():
    """Per-query mixed finalize (round-5): a batch mixing selective
    needles (alive groups fit the capped sort) with broad needles
    (most groups alive -> full per-row sort) must split at a static
    n_sel and stay bit-equal to the oracle."""
    rng = np.random.default_rng(21)
    c1 = [
        "".join(rng.choice(list("abcdef"), 20)) + "0123"
        for _ in range(4000)
    ]
    c2 = [
        "".join(rng.choice(list("uvwxyz"), 20)) + "0123"
        for _ in range(12000)
    ]
    corpus = pack_corpus(c1 + c2, unicode=False)

    # white-box: the host cap chooser must pick a mixed split for this
    # (selective, broad) pair (group-count gate lowered: the split is
    # only ENABLED at >=512 groups in production, see
    # matcher.MIXED_FINALIZE_MIN_GROUPS)
    import frizbee_tpu.matcher as fmatch
    from frizbee_tpu.matcher import _colstream_finalize_cap

    def nd(q):
        o = np.frombuffer(q.encode(), np.uint8).astype(np.int32)
        f = np.where((o >= 97) & (o <= 122), o - 32, o)
        return np.concatenate([o, f])

    old_gate = fmatch.MIXED_FINALIZE_MIN_GROUPS
    fmatch.MIXED_FINALIZE_MIN_GROUPS = 0
    try:
        res = _colstream_finalize_cap(
            corpus, [(np.stack([nd("beef"), nd("0123")]), 0)], 40
        )
        assert res is not None
        cap, n_sel, perm = res
        assert n_sel == 1 and list(perm) == [0, 1]

        _assert_query_parity(corpus, ["beef", "0123"], Config(), k=40)
        # broad-first input order exercises the perm reorder
        _assert_query_parity(corpus, ["0123", "beef"], Config(), k=40)
    finally:
        fmatch.MIXED_FINALIZE_MIN_GROUPS = old_gate


def test_q1_window_overflow_redispatch():
    """The tiered single-query result window must transparently
    re-dispatch with the full window when the match count overflows it
    (all rows match here), returning the complete result set."""
    import frizbee_tpu.matcher as fmatch

    hay = all_match_corpus(median_length=24, num_samples=4500, seed=33)
    corpus = pack_corpus(hay, unicode=False)
    old = fmatch.Q1_WINDOW_MIN
    fmatch.Q1_WINDOW_MIN = 64  # window << count -> overflow path
    try:
        m = Matcher("deadbeef", Config())
        got = m.match_arrays(corpus)
        ref = Matcher(
            "deadbeef", Config(), use_device=False
        ).match_arrays(corpus)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(a, b)
        assert len(got[0]) == len(corpus)
    finally:
        fmatch.Q1_WINDOW_MIN = old


def test_dispatch_cache_non_fast_path_repeat():
    """Repeated single-query dispatch on the SAME corpus through a
    NON-fast configuration (index-sort strategy) must serve from the
    cache without error (advisor round-5: the cache-hit path referenced
    locals only bound on a miss)."""
    from frizbee_tpu.config import SortStrategy

    hay = partial_match_corpus(median_length=24, num_samples=2500, seed=41)
    corpus = pack_corpus(hay, unicode=False)
    m = Matcher("dead", Config(sort=SortStrategy.INDEX_ASC))
    first = m.match_arrays(corpus)
    second = m.match_arrays(corpus)  # cache hit, non-fast branch
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)
    ref = Matcher(
        "dead", Config(sort=SortStrategy.INDEX_ASC), use_device=False
    ).match_arrays(corpus)
    for a, b in zip(second, ref):
        np.testing.assert_array_equal(a, b)


def test_dispatch_cache_releases_dropped_corpus():
    """A corpus the caller dropped must not stay pinned by the dispatch
    cache (weakref eviction)."""
    import gc
    import weakref

    hay = partial_match_corpus(median_length=24, num_samples=2500, seed=43)
    m = Matcher("dead", Config())
    corpus = pack_corpus(hay, unicode=False)
    m.match_arrays(corpus)
    assert len(m._dispatch_cache) >= 1
    ref = weakref.ref(corpus)
    del corpus
    gc.collect()
    assert ref() is None
    assert len(m._dispatch_cache) == 0


def test_dispatch_cache_invalidates_on_set_pattern():
    """The per-corpus dispatch cache must not serve stale needles after
    set_pattern/set_config rebuilds."""
    hay = partial_match_corpus(median_length=24, num_samples=2500, seed=35)
    corpus = pack_corpus(hay, unicode=False)
    m = Matcher("deadbeef", Config())
    first = m.match_arrays(corpus)
    m.set_pattern("beef")
    second = m.match_arrays(corpus)
    ref = Matcher("beef", Config(), use_device=False).match_arrays(corpus)
    for a, b in zip(second, ref):
        np.testing.assert_array_equal(a, b)
    assert len(second[0]) != len(first[0]) or not np.array_equal(
        second[0], first[0]
    )


def test_fast_empty_batch_short_circuit():
    """A batch where no query has any stage-1 survivor must produce empty
    results through the short-circuit flow, identically to the oracle."""
    from frizbee_tpu.datagen import no_match_corpus

    hay = no_match_corpus(median_length=24, num_samples=4500, seed=31)
    corpus = pack_corpus(hay, unicode=False)
    _assert_query_parity(corpus, ["deadbeef", "beefdead"], Config())
    res = match_topk_batch(["deadbeef"], corpus, Config(), k=16)
    assert res[0][0] == 0 and len(res[0][1]) == 0
