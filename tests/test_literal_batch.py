"""Native batched literal matcher vs the per-row oracle.

LiteralEngine.match_many / match_xl_rows run native/packer.cpp
host_literal_batch (OpenMP); the per-row literal_find oracle
(oracle/literal.py) is the semantics truth. Covers all four modes,
case sensitivity, unicode (multi-byte units incl. length-changing case
flips), exact/prefix bonuses, earliest-best substring occurrences, and
XL blob row selection.
"""

import numpy as np
import pytest

from frizbee_tpu.config import CaseMatching, Config, Matching
from frizbee_tpu.engine import LiteralEngine


ROWS = [
    "DeadBeef",
    "deadbeef",
    "xxdeadbeefxx",
    "dead beef",
    "DEADBEEF",
    "",
    "beefdead",
    "a/dead_beef/b",
    "deadbee",
    "Dead/Beef and deadbeef twice DeadBeef",
    "d",
    "the beef is dead but DeadBeef deAdBeEf",
    "ümläut deadbeef ümläut",
    "  deadbeef",
]

UNICODE_ROWS = [
    "إن الكتاب",
    "كتاب إن",
    "nothing",
    "إنإن",
    "ẞstraße",           # length-changing case pairs
    "straße ẞ",
    "",
]


def _oracle(engine, rows):
    matched = np.zeros(len(rows), bool)
    score = np.zeros(len(rows), np.int64)
    exact = np.zeros(len(rows), bool)
    end_col = np.zeros(len(rows), np.int64)
    for i, h in enumerate(rows):
        m = engine.match_one(h, i)
        if m is not None:
            matched[i] = True
            score[i], exact[i], end_col[i] = m.score, m.exact, m.end_col
    return matched, score, exact, end_col


@pytest.mark.parametrize("mode", [
    Matching.EXACT, Matching.PREFIX, Matching.SUFFIX, Matching.SUBSTRING,
])
@pytest.mark.parametrize("needle", ["deadbeef", "DeadBeef", "dead", "beef"])
def test_match_many_matches_oracle(mode, needle):
    cfg = Config(matching=mode)
    eng = LiteralEngine(needle, cfg, use_device=False)
    got = eng.match_many(ROWS)
    want = _oracle(eng, ROWS)
    for g, w, name in zip(got, want, ("matched", "score", "exact", "end")):
        np.testing.assert_array_equal(
            np.where(want[0], g, 0), np.where(want[0], w, 0),
            err_msg=f"{mode} {needle} {name}",
        )
    np.testing.assert_array_equal(got[0], want[0])


@pytest.mark.parametrize("mode", [Matching.SUBSTRING, Matching.PREFIX])
@pytest.mark.parametrize("needle", ["إن", "ẞ", "straße"])
def test_match_many_unicode(mode, needle):
    cfg = Config(matching=mode)
    eng = LiteralEngine(needle, cfg, use_device=False)
    got = eng.match_many(UNICODE_ROWS)
    want = _oracle(eng, UNICODE_ROWS)
    np.testing.assert_array_equal(got[0], want[0])
    for g, w in zip(got[1:], want[1:]):
        np.testing.assert_array_equal(
            np.where(want[0], g, 0), np.where(want[0], w, 0)
        )


def test_case_sensitive_respect():
    cfg = Config(matching=Matching.SUBSTRING, casing=CaseMatching.RESPECT)
    eng = LiteralEngine("DeadBeef", cfg, use_device=False)
    got = eng.match_many(ROWS)
    want = _oracle(eng, ROWS)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(
        np.where(want[0], got[1], 0), np.where(want[0], want[1], 0)
    )


def test_substring_earliest_best_occurrence():
    """Row with several occurrences: the native path must return the same
    (earliest among highest-scoring) position the oracle picks."""
    cfg = Config(matching=Matching.SUBSTRING)
    eng = LiteralEngine("deadbeef", cfg, use_device=False)
    rows = ["deadbeef then /deadbeef (delimiter bonus later)"]
    got = eng.match_many(rows)
    want = _oracle(eng, rows)
    np.testing.assert_array_equal(got[3], want[3])  # end_col == position


def test_match_xl_rows_blob():
    """XL blob path: rows beyond the widest bucket score straight off the
    corpus-resident encoded blob."""
    from frizbee_tpu.corpus import pack_corpus

    long_rows = [
        "x" * 1500 + "deadbeef" + "y" * 10,
        "z" * 1500,
        "deadbeef" + "w" * 1500,
    ]
    corpus = pack_corpus(["short row"] + long_rows, unicode=False)
    assert len(corpus.xl_indices) == 3
    cfg = Config(matching=Matching.SUBSTRING)
    eng = LiteralEngine("deadbeef", cfg, use_device=False)
    res = eng.match_xl_rows(corpus, np.arange(3))
    if res is None:
        pytest.skip("native library unavailable")
    m, s, e, ec = res
    rows = [corpus.haystacks[int(i)] for i in corpus.xl_indices]
    wm, ws, we, wec = _oracle(eng, rows)
    np.testing.assert_array_equal(m, wm)
    np.testing.assert_array_equal(np.where(wm, s, 0), np.where(wm, ws, 0))
    np.testing.assert_array_equal(np.where(wm, ec, 0), np.where(wm, wec, 0))
