"""Batched serving API and fused-path equivalences on the CPU backend."""

import numpy as np
import pytest

from frizbee_tpu.config import Config, Scoring, SortStrategy
from frizbee_tpu.corpus import pack_corpus
from frizbee_tpu.datagen import partial_match_corpus
from frizbee_tpu.matcher import Matcher, match_arrays_batch


@pytest.fixture(scope="module")
def hay():
    return partial_match_corpus(median_length=24, num_samples=500, seed=13)


def test_batch_equals_per_query(hay):
    queries = ["deadbeef", "feedbead", "dead", "be ad", "!beef x", "zz"]
    res = match_arrays_batch(queries, hay, Config())
    for q, r in zip(queries, res):
        ref = Matcher.from_query(q, Config(), use_device=False).match_arrays(hay)
        for a, b in zip(r, ref):
            np.testing.assert_array_equal(a, b)


def test_batch_accepts_matchers_and_corpus(hay):
    corpus = pack_corpus(hay, unicode=False)
    ms = [Matcher("dead", Config()), Matcher("beef", Config())]
    res = match_arrays_batch(ms, corpus, Config())
    for m, r in zip(ms, res):
        ref = m.match_arrays(corpus)
        for a, b in zip(r, ref):
            np.testing.assert_array_equal(a, b)


def test_batch_overflow_falls_back(hay):
    res = match_arrays_batch(["e"], hay, Config(), fetch_rows=3)
    ref = Matcher("e", Config(), use_device=False).match_arrays(hay)
    for a, b in zip(res[0], ref):
        np.testing.assert_array_equal(a, b)


def test_batch_custom_scoring(hay):
    cfg = Config(scoring=Scoring(match_score=20, gap_open_penalty=9))
    res = match_arrays_batch(["dead"], hay, cfg)
    ref = Matcher("dead", cfg, use_device=False).match_arrays(hay)
    for a, b in zip(res[0], ref):
        np.testing.assert_array_equal(a, b)


def test_batch_sort_strategies(hay):
    for s in SortStrategy:
        cfg = Config(sort=s)
        res = match_arrays_batch(["dead", "beef"], hay, cfg)
        for q, r in zip(["dead", "beef"], res):
            ref = Matcher(q, cfg, use_device=False).match_arrays(hay)
            for a, b in zip(r, ref):
                np.testing.assert_array_equal(a, b)


def test_fetch_rows_two_fetch_path(hay):
    m = Matcher("e", Config())
    m.fetch_rows = 5
    ref = Matcher("e", Config(), use_device=False).match_list(hay)
    assert m.match_list(hay) == ref
