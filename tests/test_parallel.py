"""Mesh-sharded matching: parallel == sequential property.

Ports the reference's core parallel property (reference:
tests/api_properties.rs:79-114): sharded matching with a deterministic merge
must reproduce the sequential result exactly when score-sorted.
"""

import numpy as np
import pytest

from frizbee_tpu.config import Config
from frizbee_tpu.corpus import pack_corpus
from frizbee_tpu.datagen import partial_match_corpus
from frizbee_tpu.engine import FuzzyEngine
from frizbee_tpu.matcher import Matcher


@pytest.fixture(scope="module")
def corpus_small():
    hay = partial_match_corpus(median_length=20, num_samples=400, seed=3)
    return hay


def test_mesh_topk_equals_sequential(corpus_small):
    import jax

    from frizbee_tpu.parallel import make_mesh, match_corpus_sharded

    hay = corpus_small
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(min(8, len(jax.devices())))
    engine = FuzzyEngine("deadbeef", Config())
    corpus = pack_corpus(hay, unicode=False)
    k = 32
    index, score, exact, end_col = match_corpus_sharded(corpus, engine, mesh, k=k)

    seq = Matcher("deadbeef", Config()).match_list(hay)[:k]
    assert [m.index for m in seq] == list(index[: len(seq)])
    assert [m.score for m in seq] == list(score[: len(seq)])
    assert [m.exact for m in seq] == list(exact[: len(seq)])


def test_mesh_varied_shard_counts(corpus_small):
    import jax

    from frizbee_tpu.parallel import make_mesh, match_corpus_sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs multiple devices")
    engine = FuzzyEngine("dead", Config(max_typos=1))
    corpus = pack_corpus(corpus_small, unicode=False)
    seq = Matcher("dead", Config(max_typos=1)).match_list(corpus_small)[:16]
    for n in (2, 4):
        mesh = make_mesh(n)
        index, score, _, _ = match_corpus_sharded(corpus, engine, mesh, k=16)
        assert [m.index for m in seq] == list(index[: len(seq)])
        assert [m.score for m in seq] == list(score[: len(seq)])


def test_shard_chunked_matcher_parallel(corpus_small):
    """Host-chunked parallel API agrees with sequential (all strategies)."""
    m = Matcher("dead", Config())
    seq = m.match_list(corpus_small)
    par = m.match_list_parallel(corpus_small, 3)
    assert seq == par


def test_mesh_topk_unicode(corpus_small):
    """Unicode corpus sharded over the mesh == sequential (the scaled-down
    version of BASELINE config #5)."""
    import jax

    from frizbee_tpu.datagen import unicode_corpus
    from frizbee_tpu.parallel import make_mesh, match_corpus_sharded

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    hay = unicode_corpus(
        "arabic", num_samples=300, median_units=16, needle="إن",
        needle_every=5, seed=11,
    )
    engine = FuzzyEngine("إن", Config())
    corpus = pack_corpus(hay, unicode=True)
    mesh = make_mesh(min(8, len(jax.devices())))
    index, score, exact, _ = match_corpus_sharded(corpus, engine, mesh, k=24)
    seq = Matcher("إن", Config()).match_list(hay)[:24]
    assert [m.index for m in seq] == list(index[: len(seq)])
    assert [m.score for m in seq] == list(score[: len(seq)])


def test_mesh_greedy_rows_rescored():
    """ADVICE round-1 (medium): unicode rows whose trimmed window exceeds
    MAX_HAYSTACK_LEN bytes must be host-rescored on the parallel path too —
    parallel == sequential includes greedy/XL windows."""
    from frizbee_tpu.parallel import make_mesh, match_corpus_sharded

    hay = (
        ["linux kernel", "nope", "l" + "ل" * 600 + "inux"]
        + ["لinuلx" + "ل" * 600]
        + ["filler%d" % i for i in range(12)]
    )
    cfg = Config()
    engine = FuzzyEngine("linux", cfg)
    corpus = pack_corpus(hay, unicode=True)
    mesh = make_mesh(4)
    index, score, exact, end_col = match_corpus_sharded(
        corpus, engine, mesh, k=16
    )
    seq = Matcher("linux", cfg, use_device=False).match_arrays(hay)
    np.testing.assert_array_equal(index, seq[0][:16])
    np.testing.assert_array_equal(score, seq[1][:16])
    np.testing.assert_array_equal(end_col, seq[3][:16])


def _assert_topk_equal(got, want):
    assert len(got) == len(want)
    for (gc, gi, gs, ge, gec), (wc, wi, ws, we, wec) in zip(got, want):
        assert gc == wc
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
        np.testing.assert_array_equal(np.asarray(gs), np.asarray(ws))
        np.testing.assert_array_equal(
            np.asarray(ge, bool), np.asarray(we, bool)
        )
        np.testing.assert_array_equal(np.asarray(gec), np.asarray(wec))


def test_mesh_batch_topk_equals_single_device(corpus_small):
    """Q-query sharded serving == the single-device serving path
    (counts and rows), across shard counts."""
    import jax

    from frizbee_tpu.matcher import match_topk_batch
    from frizbee_tpu.parallel import make_mesh, match_topk_batch_sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs multiple devices")
    corpus = pack_corpus(corpus_small, unicode=False)
    queries = ["deadbeef", "dead", "beef", "zqzqzq"]
    cfg = Config()
    want = match_topk_batch(queries, corpus, cfg, k=16)
    for n in (2, 4):
        got = match_topk_batch_sharded(
            queries, corpus, make_mesh(n), cfg, k=16
        )
        _assert_topk_equal(got, want)


def test_mesh_batch_topk_full_syntax(corpus_small):
    """The sharded serving path covers the FULL query syntax on the mesh
    (the general match body runs inside shard_map): typo budgets,
    multi-pattern combine with negation veto, and literal modes — all
    equal to the single-device serving path (reference parallel path
    covers every pattern type, src/matcher/parallel.rs:18-89)."""
    import jax

    from frizbee_tpu.matcher import Matcher, match_topk_batch
    from frizbee_tpu.parallel import make_mesh, match_topk_batch_sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs multiple devices")
    corpus = pack_corpus(corpus_small, unicode=False)
    cfg = Config(max_typos=1)
    queries = [
        Matcher("dead", cfg),
        Matcher.from_query("dead !beef", cfg),   # negation veto
        Matcher.from_query("'dead", cfg),        # literal substring
        Matcher.from_query("^dead", cfg),        # literal prefix
        Matcher.from_query("beef$", cfg),        # literal suffix
        Matcher.from_query("dead beef", cfg),    # multi-pattern sum
        Matcher("dead", Config(max_typos=2)),
        Matcher("", cfg),                        # empty: host copy path
    ]
    want = match_topk_batch(queries, corpus, cfg, k=12)
    got = match_topk_batch_sharded(queries, corpus, make_mesh(4), cfg, k=12)
    _assert_topk_equal(got, want)


def test_mesh_batch_topk_sort_strategies(corpus_small):
    """Every sort strategy serves on the mesh and equals single-device."""
    import jax

    from frizbee_tpu.config import SortStrategy
    from frizbee_tpu.matcher import match_topk_batch
    from frizbee_tpu.parallel import make_mesh, match_topk_batch_sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs multiple devices")
    corpus = pack_corpus(corpus_small, unicode=False)
    mesh = make_mesh(4)
    for strat in SortStrategy:
        cfg = Config(sort=strat)
        want = match_topk_batch(["dead", "beef"], corpus, cfg, k=10)
        got = match_topk_batch_sharded(
            ["dead", "beef"], corpus, mesh, cfg, k=10
        )
        _assert_topk_equal(got, want)


def test_mesh_batch_topk_unicode_greedy():
    """Unicode sharded batch serving, including greedy (window > DP cap)
    rows that need host rescoring and an XL row."""
    import jax

    from frizbee_tpu.matcher import match_topk_batch
    from frizbee_tpu.parallel import make_mesh, match_topk_batch_sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs multiple devices")
    hay = (
        ["linux kernel", "nope", "l" + "ل" * 600 + "inux"]
        + ["لinuلx" + "ل" * 600]
        + ["linux" + "x" * 1100]  # XL row (over the widest bucket)
        + ["filler%d" % i for i in range(12)]
    )
    cfg = Config()
    corpus = pack_corpus(hay, unicode=True)
    queries = ["linux", "kernel"]
    want = match_topk_batch(queries, corpus, cfg, k=16)
    got = match_topk_batch_sharded(queries, corpus, make_mesh(4), cfg, k=16)
    _assert_topk_equal(got, want)


def test_mesh_batch_topk_greedy_at_k_boundary():
    """Greedy rows near the k cut with multiple buckets: the sharded path
    must apply host fixups to the same globally-ordered fetched set as
    the single-device path (per-bucket-local rescoring diverges here:
    a greedy row inside its bucket's top-k but outside the global top-k
    must NOT be rescored into or out of the result)."""
    import jax

    from frizbee_tpu.matcher import match_topk_batch
    from frizbee_tpu.parallel import make_mesh, match_topk_batch_sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs multiple devices")
    greedy_rows = [
        "l" + "ل" * 600 + "inux",      # window > DP cap: device-capped score
        "لinuلx" + "ل" * 600,
        "li" + "ن" * 700 + "nux",
    ]
    strong = ["%d linux" % i for i in range(6)]       # clean matches
    weak = ["l-i%d-n-u-x" % i for i in range(6)]      # gapped matches
    hay = strong + greedy_rows + weak + ["filler%d" % i for i in range(20)]
    corpus = pack_corpus(hay, unicode=True)
    mesh = make_mesh(4)
    for k in (2, 4, 8, 32):
        want = match_topk_batch(["linux"], corpus, Config(), k=k)
        got = match_topk_batch_sharded(
            ["linux"], corpus, mesh, Config(), k=k
        )
        _assert_topk_equal(got, want)
