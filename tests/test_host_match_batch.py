"""Native batched host pipeline (host_match_batch) vs the Python oracle.

The per-row ``engine._host_pipeline`` is the semantics oracle (itself
pinned to the reference's matcher pipeline); ``engine.match_many`` must
equal it row for row — through the native C++ batch when available and
through the per-row fallback when not. On top sits the end-to-end check:
a greedy/XL-heavy corpus through the DEVICE matcher must equal the host
oracle matcher (the ground-truth invariant), at a scale the old per-row
Python loop made impractical.
"""

import random

import numpy as np
import pytest

import frizbee_tpu.native as native
from frizbee_tpu.config import Config, Scoring
from frizbee_tpu.engine import FuzzyEngine

ALPHA = "abcdeABC_/. 01xyz"


def gen_rows(rng, n, lo=0, hi=60):
    return [
        "".join(rng.choice(ALPHA) for _ in range(rng.randint(lo, hi)))
        for _ in range(n)
    ]


def xl_rows(rng, n):
    """Rows past the device DP cap / widest bucket, half of them
    embedding a needle subsequence."""
    out = []
    for i in range(n):
        body = "".join(
            rng.choice(ALPHA) for _ in range(rng.randint(1100, 3000))
        )
        if i % 2 == 0:
            body = "l" + body + "inux" if i % 4 == 0 else "li" + body + "nux"
        out.append(body)
    return out


def _assert_many_equals_oracle(eng, rows):
    m, s, e, ec = eng.match_many(rows)
    for r, h in enumerate(rows):
        res = eng._host_pipeline(h)
        if res is None:
            assert not m[r], (eng.needle, r, h[:40])
        else:
            assert m[r], (eng.needle, r, h[:40])
            assert (s[r], e[r], ec[r]) == res[:3], (
                eng.needle, r, h[:40], (s[r], e[r], ec[r]), res[:3]
            )


@pytest.mark.parametrize("seed", range(4))
def test_match_many_equals_oracle(seed):
    rng = random.Random(1000 + seed)
    rows = (
        gen_rows(rng, 50)
        + xl_rows(rng, 8)
        + ["", "l", "linux", "LINUX", "Linux" * 400]
    )
    for needle in ("linux", "Li", "a_b.c"):
        for typos in (0, 1, 3, None):
            eng = FuzzyEngine(needle, Config(max_typos=typos))
            _assert_many_equals_oracle(eng, rows)


def test_match_many_scoring_variants():
    rng = random.Random(77)
    rows = gen_rows(rng, 30) + xl_rows(rng, 6)
    scorings = [
        Scoring(
            match_score=255, mismatch_penalty=1, gap_open_penalty=255,
            gap_extend_penalty=120, prefix_bonus=200,
            capitalization_bonus=7, matching_case_bonus=9,
            exact_match_bonus=250, delimiter_bonus=11,
        ),
        Scoring(
            match_score=1, mismatch_penalty=0, gap_open_penalty=0,
            gap_extend_penalty=0, prefix_bonus=0, capitalization_bonus=0,
            matching_case_bonus=0, exact_match_bonus=0, delimiter_bonus=0,
        ),
    ]
    for sc in scorings:
        for typos in (0, 2, None):
            eng = FuzzyEngine("Linux", Config(max_typos=typos, scoring=sc))
            _assert_many_equals_oracle(eng, rows)


UNI_ALPHA = "abcdeABC_/. éß다漢𝄞01"


def gen_uni_rows(rng, n, lo=0, hi=60):
    return [
        "".join(rng.choice(UNI_ALPHA) for _ in range(rng.randint(lo, hi)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("seed", range(3))
def test_match_many_unicode_equals_oracle(seed):
    """The unicode twin (codepoint prefilter/SW + byte greedy), including
    multi-byte scalars straddling the start-1 window trim."""
    rng = random.Random(2000 + seed)
    rows = gen_uni_rows(rng, 40) + [
        "é" + "다" * 700 + "B",        # >1024 bytes via 3-byte scalars
        "é" + "x" * 1500 + "다",       # greedy window
        "다" * 600,                     # XL in bytes, < cap in units
        "L" + "é" * 800 + "inux",      # 2-byte scalar at the trim point
        "", "é", "zz",
    ]
    for needle in ("é다", "다漢", "éB"):
        for typos in (0, 1, None):
            eng = FuzzyEngine(needle, Config(max_typos=typos))
            assert eng.unicode
            _assert_many_equals_oracle(eng, rows)


def test_xl_heavy_unicode_device_equals_host():
    from frizbee_tpu.matcher import Matcher

    rng = random.Random(13)
    hay = gen_uni_rows(rng, 30) + [
        "é" + "다" * rng.randint(400, 900) + "B" for _ in range(30)
    ]
    rng.shuffle(hay)
    for typos in (0, 1):
        dev = Matcher("é다B", Config(max_typos=typos))
        host = Matcher("é다B", Config(max_typos=typos), use_device=False)
        assert dev.match_list(hay) == host.match_list(hay), typos


@pytest.mark.parametrize("seed", range(2))
def test_match_many_indices_equals_oracle(seed):
    """Batched native traceback (greedy in-scan indices + full-matrix SW
    walk) == per-row match_one_indices, ASCII and unicode, long and
    short rows, across typo budgets."""
    rng = random.Random(4000 + seed)
    for needle, uni in (("deadbeef", False), ("é다", True)):
        alpha = UNI_ALPHA if uni else "abcdefABC_/. 01"
        rows = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 60)))
            for _ in range(30)
        ] + [
            "".join(
                rng.choice(alpha) for _ in range(rng.randint(1100, 2400))
            )
            for _ in range(6)
        ] + [needle, needle * 300, ""]
        for typos in (0, 1, None):
            eng = FuzzyEngine(needle, Config(max_typos=typos))
            nat = eng.match_many_indices(rows)
            if nat is None:
                pytest.skip("no native toolchain")
            for r, h in enumerate(rows):
                want = eng.match_one_indices(h, r)
                got = nat[r]
                if want is None:
                    assert got is None, (needle, typos, r)
                else:
                    assert got is not None, (needle, typos, r)
                    assert got[0] == want.score and got[1] == want.exact
                    if want.score > 0:
                        assert got[2] == want.indices, (needle, typos, r)


def test_match_list_indices_xl_heavy_device_equals_host():
    from frizbee_tpu.matcher import Matcher

    rng = random.Random(41)
    hay = gen_rows(rng, 40) + [
        "".join(
            rng.choice("abcdefABC_/. 01")
            for _ in range(rng.randint(1100, 2200))
        )
        for _ in range(30)
    ]
    for typos in (0, 1):
        dev = Matcher("deadbeef", Config(max_typos=typos))
        host = Matcher(
            "deadbeef", Config(max_typos=typos), use_device=False
        )
        d = dev.match_list_indices(hay)
        h = host.match_list_indices(hay)
        assert [(m.index, m.score, m.exact, m.indices) for m in d] == [
            (m.index, m.score, m.exact, m.indices) for m in h
        ], typos


@pytest.mark.skipif(native.get_lib() is None, reason="no native toolchain")
@pytest.mark.parametrize("unicode", [False, True])
def test_xl_blob_equals_strings(unicode):
    """The corpus-resident encoded XL blob (row-selection native path)
    must equal match_many on materialized strings, full set and
    per-query-style subsets."""
    from frizbee_tpu.corpus import pack_corpus

    rng = random.Random(31)
    alpha = UNI_ALPHA if unicode else "abcdeABC_/. 01"
    hay = (
        gen_uni_rows(rng, 30) if unicode else gen_rows(rng, 30)
    ) + [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1100, 2500)))
        for _ in range(20)
    ]
    corpus = pack_corpus(hay, unicode=unicode)
    assert len(corpus.xl_indices) >= 20
    needles = ("é다", "다a") if unicode else ("linux", "aB")
    for needle in needles:
        for typos in (0, 2, None):
            eng = FuzzyEngine(needle, Config(max_typos=typos))
            if eng.unicode != unicode:
                continue
            pos = np.arange(len(corpus.xl_indices))
            blob_res = eng.match_xl_rows(corpus, pos)
            assert blob_res is not None
            rows = [corpus.haystacks[int(i)] for i in corpus.xl_indices]
            str_res = eng.match_many(rows)
            for a, b in zip(blob_res, str_res):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            sub = pos[::3]
            for a, b in zip(eng.match_xl_rows(corpus, sub), str_res):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)[sub]
                )


@pytest.mark.skipif(native.get_lib() is None, reason="no native toolchain")
def test_native_equals_fallback():
    """The native batch and the per-row fallback must agree exactly."""
    rng = random.Random(5)
    rows = gen_rows(rng, 40) + xl_rows(rng, 6)
    eng = FuzzyEngine("linux", Config(max_typos=1))
    got_native = eng.match_many(rows)
    saved = native._lib, native._tried
    try:
        native._lib, native._tried = None, True
        got_py = eng.match_many(rows)
    finally:
        native._lib, native._tried = saved
    for a, b in zip(got_native, got_py):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_xl_heavy_corpus_device_equals_host():
    """End-to-end at the shape the per-row loop made impractical: a
    corpus dominated by greedy/XL rows through the device matcher ==
    the pure-Python host oracle matcher."""
    from frizbee_tpu.matcher import Matcher

    rng = random.Random(9)
    hay = (
        gen_rows(rng, 40)
        + xl_rows(rng, 60)
        + ["l" + "x" * 600 + "inux" for _ in range(20)]  # greedy windows
    )
    rng.shuffle(hay)
    for typos in (0, 1, None):
        dev = Matcher("linux", Config(max_typos=typos))
        host = Matcher("linux", Config(max_typos=typos), use_device=False)
        assert dev.match_list(hay) == host.match_list(hay), typos


def test_xl_heavy_topk_batch():
    """The serving path's host fixups run the batched pipeline; counts
    and rows must still equal the per-query reference path."""
    from frizbee_tpu.matcher import Matcher, match_topk_batch

    rng = random.Random(11)
    hay = gen_rows(rng, 64) + xl_rows(rng, 30)
    res = match_topk_batch(["linux", "xy"], hay, Config(max_typos=1), k=16)
    for q, (count, index, score, exact, end_col) in zip(["linux", "xy"], res):
        w_index, w_score, w_exact, w_end = Matcher(
            q, Config(max_typos=1)
        ).match_arrays(hay)
        assert count == len(w_index)
        np.testing.assert_array_equal(np.asarray(index), w_index[:16])
        np.testing.assert_array_equal(np.asarray(score), w_score[:16])
        np.testing.assert_array_equal(
            np.asarray(exact, bool), w_exact[:16].astype(bool)
        )
        np.testing.assert_array_equal(np.asarray(end_col), w_end[:16])
