"""Ported public-API tests (reference: src/matcher/mod.rs:528-864 tests,
src/matcher/algo.rs tests, src/matcher/multi.rs tests), run against both the
device (jax) and host (oracle) engines."""

import pytest

from frizbee_tpu import Config, Matcher, Matching, Pattern, PatternConfig, Scoring, SortStrategy


ENGINES = [True, False]  # use_device


@pytest.fixture(params=ENGINES, ids=["device", "host"])
def use_device(request):
    return request.param


def test_basic(use_device):
    haystacks = ["deadbeef", "deadbf", "deadbeefg", "deadbe"]
    config = Config(max_typos=None)
    matches = Matcher("deadbe", config, use_device=use_device).match_list(haystacks)
    assert [m.index for m in matches] == [3, 0, 2, 1]


def test_no_typos(use_device):
    haystacks = ["deadbeef", "deadbf", "deadbeefg", "deadbe"]
    matches = Matcher("deadbe", Config(max_typos=0), use_device=use_device).match_list(
        haystacks
    )
    assert len(matches) == 3


def test_readme_example(use_device):
    haystacks = ["fooBar", "foo_bar", "barfoo", "prelude", "println!"]
    # "fBr" contains an uppercase char, so smart casing is case-sensitive:
    # only "fooBar" has the literal 'B'
    matches = Matcher("fBr", use_device=use_device).match_list(haystacks)
    assert {m.index for m in matches} == {0}
    # case-insensitive needle matches both orderings
    matches = Matcher("fbr", use_device=use_device).match_list(haystacks)
    assert {m.index for m in matches} == {0, 1}


def test_exact_flag(use_device):
    haystacks = ["deadbeef", "deadbf", "deadbeefg", "deadbe"]
    matches = Matcher("deadbe", Config(), use_device=use_device).match_list(haystacks)
    exact = [m for m in matches if m.exact]
    assert len(exact) == 1
    assert exact[0].index == 3
    assert matches[0].index == 3  # exact bonus ranks it first


def test_unsorted_output_preserves_candidate_order(use_device):
    haystacks = ["foo", "nomatch", "xfoo", "f_o_o", "bar"]
    config = Config(sort=SortStrategy.INDEX_ASC)
    matches = Matcher("foo", config, use_device=use_device).match_list(haystacks)
    assert [m.index for m in matches] == [0, 2, 3]


def test_match_list_indices_reports_expected_public_indices(use_device):
    haystacks = ["xabcx", "a_b_c", "nomatch"]
    config = Config(sort=SortStrategy.INDEX_ASC)
    matches = Matcher("abc", config, use_device=use_device).match_list_indices(
        haystacks
    )
    assert len(matches) == 2
    assert matches[0].index == 0
    assert matches[0].indices == [3, 2, 1]
    assert matches[1].index == 1
    assert matches[1].indices == [4, 2, 0]


def test_filtered_match_end_col_uses_original_haystack_offsets(use_device):
    config = Config(sort=SortStrategy.INDEX_ASC)
    matches = Matcher("abc", config, use_device=use_device).match_list(["xxabcxx"])
    assert len(matches) == 1
    assert matches[0].end_col == 4


def test_greedy_fallback_membership_agrees(use_device):
    haystack = "a" + "z" * 1100 + "b"
    config = Config(max_typos=1)
    matches = Matcher("abc", config, use_device=use_device).match_list([haystack])
    indices = Matcher("abc", config, use_device=use_device).match_list_indices(
        [haystack]
    )
    assert len(matches) == 1
    assert len(indices) == 1
    assert matches[0].score == indices[0].score
    assert indices[0].indices == []


def test_all_zero_scoring_does_not_divide_by_zero(use_device):
    scoring = Scoring(0, 0, 0, 0, 0, 0, 0, 0, 0)
    Matcher("foo", Config(scoring=scoring), use_device=use_device).match_list(
        ["foobar"]
    )


def test_gap_open_below_gap_extend_does_not_underflow(use_device):
    scoring = Scoring(gap_open_penalty=1, gap_extend_penalty=5)
    Matcher("foo", Config(scoring=scoring), use_device=use_device).match_list(
        ["foobar", "fabco"]
    )


def test_huge_bonuses_report_descriptive_overflow_error(use_device):
    scoring = Scoring(capitalization_bonus=60000, matching_case_bonus=40000)
    with pytest.raises(ValueError, match="needle too long"):
        Matcher("f", Config(scoring=scoring), use_device=use_device)


def test_overflow_guard_uses_char_count_for_unicode_needles(use_device):
    needle = "一二三四五六七八"
    scoring = Scoring(capitalization_bonus=4000)
    matches = Matcher(needle, Config(scoring=scoring), use_device=use_device).match_list(
        [needle]
    )
    assert len(matches) == 1


def test_zero_gap_capitalization_scores_do_not_saturate(use_device):
    scoring = Scoring(
        match_score=40,
        capitalization_bonus=40,
        mismatch_penalty=0,
        gap_open_penalty=0,
        gap_extend_penalty=0,
        prefix_bonus=0,
        matching_case_bonus=0,
        exact_match_bonus=0,
        delimiter_bonus=0,
    )
    matches = Matcher("BBBB", Config(scoring=scoring), use_device=use_device).match_list(
        ["aBaBaBaB"]
    )
    assert matches[0].score == 4 * (40 + 40)


# --- multi-pattern (reference: src/matcher/multi.rs tests) ---


def multi(query, config, use_device):
    return Matcher.from_query(query, config, use_device=use_device)


def test_multi_pattern_negation(use_device):
    haystacks = ["foobar", "foo", "barfoo", "bar", "qux"]
    config = Config(sort=SortStrategy.INDEX_ASC)
    matches = multi("foo !bar", config, use_device).match_list(haystacks)
    assert [m.index for m in matches] == [1]


def test_multi_pattern_negated_matching_modes(use_device):
    haystacks = ["foo/bar", "bar/foo", "foo", "foobar"]
    config = Config(sort=SortStrategy.INDEX_ASC)
    matches = multi("foo !^bar", config, use_device).match_list(haystacks)
    assert [m.index for m in matches] == [0, 2, 3]
    matches = multi("foo !bar$", config, use_device).match_list(haystacks)
    assert [m.index for m in matches] == [1, 2]


def test_multi_pattern_scores_sum(use_device):
    haystacks = ["foo", "xfoox", "bar"]
    config = Config(sort=SortStrategy.INDEX_ASC)
    single = Matcher("foo", config, use_device=use_device).match_list(haystacks)
    combined = multi("foo foo", config, use_device).match_list(haystacks)
    assert len(combined) == len(single)
    for c, s in zip(combined, single):
        assert c.index == s.index
        assert c.score == s.score * 2
        assert c.exact == s.exact
        assert c.end_col == s.end_col


def test_multi_pattern_all_negated(use_device):
    haystacks = ["foo", "bar", "xfoox", "qux"]
    config = Config(sort=SortStrategy.INDEX_ASC)
    matches = multi("!foo", config, use_device).match_list(haystacks)
    assert [m.index for m in matches] == [1, 3]
    assert all(m.score == 0 for m in matches)
    matches = multi("!foo !qux", config, use_device).match_list(haystacks)
    assert [m.index for m in matches] == [1]


def test_multi_pattern_contradiction_is_empty(use_device):
    matches = multi("foo !foo", Config(), use_device).match_list(["foo", "foobar"])
    assert matches == []


def test_multi_pattern_score_sorted(use_device):
    haystacks = ["xfoobarx", "foobar", "zzz"]
    matches = multi("foo bar", Config(), use_device).match_list(haystacks)
    assert len(matches) == 2
    assert matches[0].index == 1
    assert matches[0].score >= matches[1].score


def test_multi_pattern_match_iter_matches_match_list(use_device):
    haystacks = ["foobar", "foo", "barfoo", "bar", "qux", "FooBar"]
    for query in ["foo !bar", "foo bar", "!foo", "^foo bar$", "foo !^bar"]:
        config = Config(sort=SortStrategy.INDEX_ASC)
        matcher = multi(query, config, use_device)
        from_iter = list(matcher.match_iter(haystacks))
        from_list = matcher.match_list(haystacks)
        assert from_iter == from_list, query


def test_match_iter_corpus_and_pipelined_chunks(use_device):
    """match_iter over a pre-packed Corpus (one device program) and over
    raw strings long enough to keep two chunks in flight both reproduce
    match_list's content in input order; match_iter_indices too."""
    from frizbee_tpu.corpus import pack_corpus

    haystacks = [
        f"{i} deadbeef" if i % 3 == 0 else f"filler {i}" for i in range(150)
    ]
    matcher = Matcher("deadbeef", Config(), use_device=use_device)
    matcher.iter_chunk = 64  # force several in-flight chunks
    want = sorted(
        matcher.match_list(haystacks), key=lambda m: m.index
    )
    assert list(matcher.match_iter(haystacks)) == want
    corpus = pack_corpus(haystacks, unicode=False)
    assert list(matcher.match_iter(corpus)) == want
    wi = list(matcher.match_iter_indices(haystacks))
    ci = list(matcher.match_iter_indices(corpus))
    assert wi == ci and len(wi) == len(want)


def test_multi_pattern_match_list_indices_matches_match_list(use_device):
    haystacks = ["foobar", "foo", "barfoo", "bar", "qux", "FooBar"]
    for query in ["foo !bar", "foo bar", "!foo", "foo fo"]:
        config = Config(sort=SortStrategy.INDEX_ASC)
        matcher = multi(query, config, use_device)
        matches = matcher.match_list(haystacks)
        indices = matcher.match_list_indices(haystacks)
        assert len(matches) == len(indices), query
        for m, i in zip(matches, indices):
            assert (m.index, m.score, m.exact) == (i.index, i.score, i.exact), query
            assert all(a > b for a, b in zip(i.indices, i.indices[1:])), query


def test_multi_pattern_overlapping_indices_deduped(use_device):
    matcher = multi("foo fo", Config(), use_device)
    indices = matcher.match_list_indices(["foo"])
    assert len(indices) == 1
    assert indices[0].indices == [2, 1, 0]


def test_pattern_matching_override_matches_config(use_device):
    haystacks = ["fooX", "xfoo", "foo"]
    config = Config(sort=SortStrategy.INDEX_ASC)
    from_pattern = Matcher(
        [Pattern.literal("foo", PatternConfig(matching=Matching.PREFIX))],
        config,
        use_device=use_device,
    ).match_list(haystacks)
    from_config = Matcher(
        "foo", config.with_(matching=Matching.PREFIX), use_device=use_device
    ).match_list(haystacks)
    assert from_pattern == from_config


def test_set_config_preserves_pattern_matching_override(use_device):
    haystacks = ["fooX", "xfoo"]
    config = Config(sort=SortStrategy.INDEX_ASC)
    matcher = multi("^foo", config, use_device)
    matcher.set_config(config.with_(max_typos=None))
    matches = matcher.match_list(haystacks)
    assert [m.index for m in matches] == [0]


def test_set_pattern_reverts_to_literal_matching(use_device):
    config = Config(sort=SortStrategy.INDEX_ASC)
    matcher = multi("^foo", config, use_device)
    assert matcher.patterns == [Pattern.parse("^foo")]
    assert len(matcher.match_list(["foobar", "^foo"])) == 1
    matcher.set_pattern("^foo")
    matches = matcher.match_list(["foobar", "^foo"])
    assert [m.index for m in matches] == [1]


def test_pattern_max_typos_override_beats_config(use_device):
    haystacks = ["hello", "world"]
    config = Config(max_typos=0, sort=SortStrategy.INDEX_ASC)
    strict = Matcher(["helloz"], config, use_device=use_device).match_list(haystacks)
    assert strict == []
    lenient = Matcher(
        [Pattern.literal("helloz", PatternConfig(max_typos=1))],
        config,
        use_device=use_device,
    ).match_list(haystacks)
    assert [m.index for m in lenient] == [0]


def test_multi_pattern_smart_case_per_pattern(use_device):
    haystacks = ["Foo BAR", "foo bar"]
    config = Config(sort=SortStrategy.INDEX_ASC)
    matches = multi("Foo bar", config, use_device).match_list(haystacks)
    assert [m.index for m in matches] == [0]


def test_multi_pattern_unicode_per_pattern(use_device):
    haystacks = ["다나 foo", "dana foo", "다나"]
    config = Config(sort=SortStrategy.INDEX_ASC)
    matches = multi("다나 foo", config, use_device).match_list(haystacks)
    assert [m.index for m in matches] == [0]


def test_from_patterns_empty_patterns_match_everything(use_device):
    haystacks = ["foo", "bar"]
    assert len(Matcher([], Config(), use_device=use_device).match_list(haystacks)) == 2
    assert len(multi("! ^$ '", Config(), use_device).match_list(haystacks)) == 2


def test_parallel_equals_sequential(use_device):
    haystacks = ["foo", "foobar", "xfooy", "bar", "f_o_o"] * 10
    for strategy in SortStrategy:
        config = Config(sort=strategy)
        m = Matcher("foo", config, use_device=use_device)
        seq = m.match_list(haystacks)
        for shards in (1, 2, 3, 8):
            par = m.match_list_parallel(haystacks, shards)
            assert par == seq, (strategy, shards)


def test_xl_host_path_presence_gate():
    """Corpora with many oversized (>largest-bucket) rows: the XL host
    pipeline is presence-gated (matcher._xl_candidates) but results must
    still equal the oracle exactly, including XL rows that do match."""
    import numpy as np
    from frizbee_tpu.corpus import pack_corpus

    rng = np.random.default_rng(5)
    pool = list("ghijklmnopqrstuvw")  # no needle chars
    xl = [
        "".join(rng.choice(pool, size=1500)) for _ in range(40)
    ]
    xl[3] = xl[3][:700] + "deadbeef" + xl[3][700:]
    xl[17] = "d e a d b e e f " * 120  # matching, window > DP cap
    hay = xl + ["deadbeef", "nope", "dxexaxdxbxexexf"]
    corpus = pack_corpus(hay, unicode=False)
    assert len(corpus.xl_indices) >= 40
    for typos in (0, 1, None):
        cfg = Config(max_typos=typos)
        dev = Matcher("deadbeef", cfg).match_list(corpus)
        host = Matcher("deadbeef", cfg, use_device=False).match_list(hay)
        assert dev == host
