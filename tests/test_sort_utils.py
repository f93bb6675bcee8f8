"""Public sort / k-merge / serde / iterator utilities."""

import random

from frizbee_tpu import Config, Match, Scoring, SortStrategy
from frizbee_tpu.matcher import Matcher, fuzzy_match
from frizbee_tpu.sort import (
    k_merge_matches_by_index_asc,
    k_merge_matches_by_index_desc,
    k_merge_matches_by_score_then_index_asc,
    k_merge_matches_by_score_then_index_desc,
    sort_matches,
)


def _rand_matches(rng, n, base=0):
    return [
        Match(score=rng.randint(0, 300), index=base + i) for i in range(n)
    ]


def test_sort_matches_stable_desc():
    rng = random.Random(1)
    ms = _rand_matches(rng, 1000)
    out = sort_matches(ms)
    keys = [(m.score, m.index) for m in out]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1]))


def test_k_merge_all_orders():
    rng = random.Random(2)
    runs = []
    base = 0
    for _ in range(4):
        run = _rand_matches(rng, rng.randint(0, 50), base)
        base += len(run)
        runs.append(sorted(run, key=lambda m: (-m.score, m.index)))
    flat = [m for r in runs for m in r]
    asc = k_merge_matches_by_score_then_index_asc(runs)
    assert [(m.score, m.index) for m in asc] == sorted(
        ((m.score, m.index) for m in flat), key=lambda t: (-t[0], t[1])
    )
    desc = k_merge_matches_by_score_then_index_desc(runs)
    assert [(m.score, m.index) for m in desc] == sorted(
        ((m.score, m.index) for m in flat), key=lambda t: (-t[0], -t[1])
    )
    ia = k_merge_matches_by_index_asc(runs)
    assert [m.index for m in ia] == sorted(m.index for m in flat)
    idd = k_merge_matches_by_index_desc(runs)
    assert [m.index for m in idd] == sorted(
        (m.index for m in flat), reverse=True
    )


def test_config_serde_roundtrip():
    cfg = Config(
        max_typos=2,
        sort=SortStrategy.INDEX_DESC,
        scoring=Scoring(match_score=20),
    )
    d = cfg.to_dict()
    import json

    cfg2 = Config.from_dict(json.loads(json.dumps(d)))
    assert cfg2 == cfg


def test_fuzzy_match_iterator_adapter():
    hay = ["foo", "bar", "foobar", "qux"]
    lazy = list(fuzzy_match(iter(hay), "foo", Config()))
    m = Matcher("foo", Config())
    eager = sorted(m.match_list(hay), key=lambda x: x.index)
    assert [(x.index, x.score) for x in lazy] == [
        (x.index, x.score) for x in eager
    ]
