"""Round-trip serde for the public types and packed-corpus persistence
(the reference's serde derives, src/lib.rs:107-108, plus the checkpoint
analog: a saved packed corpus reloads without re-packing)."""

import numpy as np
import pytest

from frizbee_tpu.config import Config, Scoring, SortStrategy
from frizbee_tpu.corpus import Corpus, pack_corpus
from frizbee_tpu.matcher import Matcher
from frizbee_tpu.pattern import Pattern, PatternConfig
from frizbee_tpu.types import Match, MatchIndices

HAY = [
    "src/linux/main.c", "LinUx", "", "a" * 40, "nope", "lnx",
    "a/very/long/path/" + "x" * 1200,  # XL row (host path)
    "café ¢¢ linux", "деадбиф",
]


def test_match_round_trip():
    m = Match(score=37, index=4, exact=True, end_col=11)
    assert Match.from_dict(m.to_dict()) == m
    mi = MatchIndices(score=9, index=2, exact=False, indices=[5, 4, 1])
    assert MatchIndices.from_dict(mi.to_dict()) == mi


def test_config_round_trip():
    cfg = Config(
        max_typos=None,
        sort=SortStrategy.INDEX_DESC,
        scoring=Scoring(match_score=20, delimiter_bonus=7),
    )
    assert Config.from_dict(cfg.to_dict()) == cfg


def test_pattern_round_trip():
    for atom in ("^foo$", "!bar", "'qux", r"sp\ ace"):
        p = Pattern.parse(atom)
        assert Pattern.from_dict(p.to_dict()) == p
    p = Pattern.literal(
        "lit", PatternConfig(max_typos=2, scoring=Scoring(match_score=13))
    )
    assert Pattern.from_dict(p.to_dict()) == p


@pytest.mark.parametrize("unicode", [False, True])
def test_corpus_save_load(tmp_path, unicode):
    path = str(tmp_path / "corpus.npz")
    c = pack_corpus(HAY * 8, unicode=unicode)
    c.save(path)
    c2 = Corpus.load(path)

    assert c2.haystacks == c.haystacks
    assert c2.unicode == c.unicode
    np.testing.assert_array_equal(c2.xl_indices, c.xl_indices)
    assert len(c2.buckets) == len(c.buckets)
    for b, b2 in zip(c.buckets, c2.buckets):
        assert b2.width == b.width
        np.testing.assert_array_equal(b2.indices, b.indices)
        np.testing.assert_array_equal(b2.cp, b.cp)
        np.testing.assert_array_equal(b2.n_units, b.n_units)
        np.testing.assert_array_equal(b2.n_bytes, b.n_bytes)
        # full (possibly lazily derived) context arrays must agree too
        for a, a2 in zip(b._full_arrays(), b2._full_arrays()):
            np.testing.assert_array_equal(a2, a)

    # a reloaded corpus serves queries identically (host oracle engines)
    m = Matcher("linux", Config(), use_device=False)
    assert m.match_list(c2) == m.match_list(c)

    # ... and identically through the DEVICE fast paths (colstream
    # blocks, ctx plane, flags are all rebuilt lazily from the
    # persisted arrays): fuzzy, literal, and multi-pattern queries
    from frizbee_tpu.config import Matching
    from frizbee_tpu.matcher import match_arrays_batch

    for cfg, qs in (
        (Config(), ["lin nux", "li !nux"]),
        (Config(matching=Matching.SUBSTRING), ["lin"]),
    ):
        r1 = match_arrays_batch(
            [Matcher.from_query(q, cfg) for q in qs], c, cfg
        )
        r2 = match_arrays_batch(
            [Matcher.from_query(q, cfg) for q in qs], c2, cfg
        )
        for a, b in zip(r1, r2):
            for x, y in zip(a, b):
                np.testing.assert_array_equal(x, y)
