"""Public-API property tests over generated corpora.

Ports the reference's integration property suite (reference:
tests/api_properties.rs): equivalences across API surfaces — one-shot ==
reused matcher, match_list == match_iter, indices-API agrees with
match-API, parallel == sequential — plus a multi-pattern reference model
built from independent single-pattern matchers.
"""

import random

import numpy as np
import pytest

from frizbee_tpu.config import Config, SortStrategy
from frizbee_tpu.matcher import Matcher, match_list
from frizbee_tpu.pattern import Pattern

ALPHABET = "abcdeABC_/. é다01"


def gen_corpus(rng, n, max_len=40):
    return [
        "".join(rng.choice(ALPHABET) for _ in range(rng.randint(0, max_len)))
        for _ in range(n)
    ]


def gen_needle(rng):
    return "".join(
        rng.choice("abcdeéA_d") for _ in range(rng.randint(1, 6))
    )


CASES = []
_rng = random.Random(7)
for _ in range(12):
    CASES.append(
        (
            gen_needle(_rng),
            gen_corpus(_rng, 60),
            _rng.choice([0, 1, 2, None]),
        )
    )


@pytest.mark.parametrize("needle,hay,typos", CASES)
def test_one_shot_equals_reused(needle, hay, typos):
    cfg = Config(max_typos=typos)
    m = Matcher(needle, cfg)
    a = m.match_list(hay)
    b = m.match_list(hay)  # reuse
    c = match_list(needle, hay, cfg)  # one-shot
    assert a == b == c


@pytest.mark.parametrize("needle,hay,typos", CASES[:6])
def test_match_list_equals_match_iter(needle, hay, typos):
    cfg = Config(max_typos=typos)
    m = Matcher(needle, cfg)
    lst = m.match_list(hay)
    it = list(m.match_iter(hay))
    # iter is unsorted (index order); compare as multisets of tuples
    assert sorted((x.index, x.score, x.exact) for x in lst) == sorted(
        (x.index, x.score, x.exact) for x in it
    )


@pytest.mark.parametrize("needle,hay,typos", CASES[:6])
def test_indices_api_agrees_with_match_api(needle, hay, typos):
    cfg = Config(max_typos=typos)
    m = Matcher(needle, cfg)
    lst = m.match_list(hay)
    idx = m.match_list_indices(hay)
    # indices-API may drop matches whose traceback exceeds the typo budget
    lst_map = {x.index: x.score for x in lst}
    for mi in idx:
        assert mi.index in lst_map
        assert all(
            0 <= b < len(hay[mi.index].encode()) for b in mi.indices
        )
        assert mi.indices == sorted(mi.indices, reverse=True)


@pytest.mark.parametrize("needle,hay,typos", CASES[:4])
@pytest.mark.parametrize("shards", [1, 2, 3, 8])
def test_parallel_equals_sequential(needle, hay, typos, shards):
    cfg = Config(max_typos=typos)
    m = Matcher(needle, cfg)
    assert m.match_list(hay) == m.match_list_parallel(hay, shards)


@pytest.mark.parametrize("seed", range(4))
def test_multi_pattern_reference_model(seed):
    """Multi-pattern == intersect/negate/sum of single-pattern matchers
    (reference: tests/api_properties.rs:316-416)."""
    rng = random.Random(seed)
    hay = gen_corpus(rng, 80)
    pats = []
    for _ in range(rng.randint(2, 3)):
        pats.append(
            Pattern.parse(
                ("!" if rng.random() < 0.3 else "") + gen_needle(rng).replace("!", "a")
            )
        )
    cfg = Config()
    combined = Matcher.from_patterns(pats, cfg).match_list(hay)

    # model: independent single-pattern matchers
    per = []
    for p in pats:
        single = p.with_(negated=False)
        res = {
            m.index: m
            for m in Matcher.from_patterns([single], cfg).match_list(hay)
        }
        per.append((p.negated, res))
    expect = []
    for i in range(len(hay)):
        score, exact, ok = 0, False, True
        for negated, res in per:
            if negated:
                if i in res:
                    ok = False
            else:
                if i not in res:
                    ok = False
                else:
                    score = min(score + res[i].score, 0xFFFF)
                    exact |= res[i].exact
        if ok:
            expect.append((i, score, exact))
    expect.sort(key=lambda t: (-t[1], t[0]))
    got = [(m.index, m.score, m.exact) for m in combined]
    assert got == expect


@pytest.mark.parametrize("strategy", list(SortStrategy))
def test_sort_strategies_total_order(strategy):
    rng = random.Random(3)
    hay = gen_corpus(rng, 100)
    m = Matcher("ab", Config(sort=strategy))
    out = m.match_list(hay)
    keys = [(x.score, x.index) for x in out]
    if strategy is SortStrategy.SCORE_THEN_INDEX_ASC:
        assert keys == sorted(keys, key=lambda t: (-t[0], t[1]))
    elif strategy is SortStrategy.SCORE_THEN_INDEX_DESC:
        assert keys == sorted(keys, key=lambda t: (-t[0], -t[1]))
    elif strategy is SortStrategy.INDEX_ASC:
        assert keys == sorted(keys, key=lambda t: t[1])
    else:
        assert keys == sorted(keys, key=lambda t: -t[1])
