"""Device-vs-oracle parity: the jitted bucket pipeline must agree with the
host oracle on matched/score/exact/end_col for randomized corpora across
configs — the analog of the reference's SIMD-backend parity suite
(reference: src/smith_waterman/backend/tests/parity.rs)."""

import random

import numpy as np
import pytest

from frizbee_tpu import Config, Matcher, Scoring, SortStrategy
from frizbee_tpu.corpus import pack_corpus
from frizbee_tpu.engine import FuzzyEngine


def random_corpus(rng, alphabet, n, max_len, boundary_bias=True):
    out = []
    # bias lengths toward bucket boundaries like the reference's generator
    # (reference: src/smith_waterman/backend/tests/generator.rs:20-118)
    boundaries = [0, 1, 15, 16, 17, 31, 32, 33, 63, 64, 65]
    for _ in range(n):
        if boundary_bias and rng.random() < 0.4:
            ln = rng.choice(boundaries)
        else:
            ln = rng.randint(0, max_len)
        out.append("".join(rng.choice(alphabet) for _ in range(ln)))
    return out


def assert_parity(needle, haystacks, config):
    dev = FuzzyEngine(needle, config, use_device=True)
    host = FuzzyEngine(needle, config, use_device=False)
    corpus = pack_corpus(haystacks, unicode=dev.unicode)
    r_dev = dev.match_corpus(corpus)
    r_host = host.match_corpus(corpus)
    for i, h in enumerate(haystacks):
        ctx = dict(needle=needle, haystack=h, i=i, config=config)
        assert bool(r_dev.matched[i]) == bool(r_host.matched[i]), ctx
        if r_dev.matched[i]:
            assert int(r_dev.score[i]) == int(r_host.score[i]), ctx
            assert bool(r_dev.exact[i]) == bool(r_host.exact[i]), ctx
            assert int(r_dev.end_col[i]) == int(r_host.end_col[i]), ctx


ASCII_ALPHABET = "abcABC_/.z01 -"
UNI_ALPHABET = "abéζ다😀_XY ß"


@pytest.mark.parametrize("typos", [0, 1, 2, 3, None])
def test_parity_ascii(typos):
    rng = random.Random(100 + (typos or 9))
    haystacks = random_corpus(rng, ASCII_ALPHABET, 150, 80)
    for needle in ["a", "abc", "A_c", "z01", "ca.", "abcABC"]:
        assert_parity(needle, haystacks, Config(max_typos=typos))


@pytest.mark.parametrize("typos", [0, 1, 2, None])
def test_parity_unicode(typos):
    rng = random.Random(200 + (typos or 9))
    haystacks = random_corpus(rng, UNI_ALPHABET, 100, 40)
    for needle in ["é", "다", "ab", "é다", "😀x", "ß"]:
        assert_parity(needle, haystacks, Config(max_typos=typos))


def test_parity_case_sensitive():
    rng = random.Random(300)
    haystacks = random_corpus(rng, ASCII_ALPHABET, 120, 60)
    for needle in ["Abc", "ABC", "aBc"]:
        for typos in [0, 1, None]:
            assert_parity(needle, haystacks, Config(max_typos=typos))


def test_parity_custom_scoring():
    rng = random.Random(400)
    haystacks = random_corpus(rng, ASCII_ALPHABET, 100, 50)
    scorings = [
        Scoring(gap_open_penalty=1, gap_extend_penalty=5),
        Scoring(match_score=40, capitalization_bonus=40, mismatch_penalty=0,
                gap_open_penalty=0, gap_extend_penalty=0, prefix_bonus=0,
                matching_case_bonus=0, exact_match_bonus=0, delimiter_bonus=0),
        Scoring(mismatch_penalty=260),
        Scoring(delimiter_bonus=13, capitalization_bonus=1),
    ]
    for scoring in scorings:
        for typos in [0, 1, None]:
            assert_parity("abc", haystacks, Config(max_typos=typos, scoring=scoring))


def test_parity_long_haystacks_and_greedy_boundary():
    rng = random.Random(500)
    base = random_corpus(rng, ASCII_ALPHABET, 20, 40)
    # straddle the 1024-byte greedy boundary and the XL bucket edge
    long_ones = [
        "x" * 1000 + "abc",
        "a" + "z" * 1022 + "bc",
        "a" + "z" * 1100 + "bc",
        "abc" + "y" * 2000,
        ("ab" * 700) + "c",
    ]
    for typos in [0, 1, None]:
        assert_parity("abc", base + long_ones, Config(max_typos=typos))


def test_match_list_device_equals_host_end_to_end():
    rng = random.Random(600)
    haystacks = random_corpus(rng, ASCII_ALPHABET, 200, 70)
    for query in ["abc", "a c", "^ab c$", "'bc !zz", "abc ABC"]:
        for strategy in SortStrategy:
            config = Config(sort=strategy)
            dev = Matcher.from_query(query, config, use_device=True).match_list(
                haystacks
            )
            host = Matcher.from_query(query, config, use_device=False).match_list(
                haystacks
            )
            assert dev == host, (query, strategy)
