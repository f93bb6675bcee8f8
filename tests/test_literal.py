"""Literal matching semantics, mirroring the reference's literal suite
(reference: src/literal/mod.rs:203-361) on both the host oracle and the
device pipeline, plus device==host sweeps across modes.
"""

import numpy as np
import pytest

from frizbee_tpu.config import (
    CAPITALIZATION_BONUS,
    DELIMITER_BONUS,
    EXACT_MATCH_BONUS,
    MATCH_SCORE,
    MATCHING_CASE_BONUS,
    PREFIX_BONUS,
    CaseMatching,
    Config,
    Matching,
)
from frizbee_tpu.matcher import Matcher

CHAR_SCORE = MATCH_SCORE + MATCHING_CASE_BONUS


def get_score(needle, haystack, use_device, casing=CaseMatching.SMART):
    cfg = Config(matching=Matching.SUBSTRING, casing=casing)
    ms = Matcher(needle, cfg, use_device=use_device).match_list([haystack])
    return ms[0].score if ms else None


@pytest.mark.parametrize("use_device", [False, True])
class TestLiteralScoring:
    def test_score_basic(self, use_device):
        assert get_score("b", "abc", use_device) == CHAR_SCORE
        assert get_score("c", "abc", use_device) == CHAR_SCORE

    def test_score_prefix(self, use_device):
        assert get_score("a", "abc", use_device) == CHAR_SCORE + PREFIX_BONUS
        assert get_score("a", "aabc", use_device) == CHAR_SCORE + PREFIX_BONUS
        assert get_score("a", "babc", use_device) == CHAR_SCORE

    def test_score_exact_match(self, use_device):
        assert (
            get_score("a", "a", use_device)
            == CHAR_SCORE + PREFIX_BONUS + EXACT_MATCH_BONUS
        )
        assert (
            get_score("abc", "abc", use_device)
            == 3 * CHAR_SCORE + PREFIX_BONUS + EXACT_MATCH_BONUS
        )

    def test_score_delimiter(self, use_device):
        assert get_score("-", "a--bc", use_device) == CHAR_SCORE
        assert get_score("b", "a-b", use_device) == CHAR_SCORE + DELIMITER_BONUS
        assert get_score("a", "a-b-c", use_device) == CHAR_SCORE + PREFIX_BONUS
        assert get_score("b", "a--b", use_device) == CHAR_SCORE + DELIMITER_BONUS
        assert get_score("c", "a--bc", use_device) == CHAR_SCORE
        assert get_score("a", "-a--bc", use_device) == CHAR_SCORE + DELIMITER_BONUS

    def test_score_no_delimiter_for_delimiter_chars(self, use_device):
        assert get_score("-", "a-bc", use_device) == CHAR_SCORE
        assert get_score("-", "a--bc", use_device) == CHAR_SCORE

    def test_score_capital_bonus(self, use_device):
        assert get_score("a", "Ab", use_device) == MATCH_SCORE + PREFIX_BONUS
        assert get_score("A", "Aa", use_device) == CHAR_SCORE + PREFIX_BONUS
        assert (
            get_score("D", "forDist", use_device)
            == CHAR_SCORE + CAPITALIZATION_BONUS
        )
        assert get_score("D", "foRDist", use_device) == CHAR_SCORE
        assert (
            get_score("D", "FOR_DIST", use_device)
            == CHAR_SCORE + DELIMITER_BONUS
        )

    def test_score_prefix_beats_delimiter(self, use_device):
        assert get_score("swap", "swap(test)", use_device) > get_score(
            "swap", "iter_swap(test)", use_device
        )
        assert get_score("_", "_private_member", use_device) > get_score(
            "_", "public_member", use_device
        )

    def test_bonus_precedence(self, use_device):
        assert get_score("b", "b", use_device) > get_score("b", "a-b", use_device)
        assert get_score("b", "a-b", use_device) > get_score("b", "ab", use_device)
        assert get_score("B", "aB", use_device) > get_score("b", "aB", use_device)

    def test_case_sensitive_rejects_folded(self, use_device):
        assert (
            get_score("A", "0A", use_device, CaseMatching.RESPECT) == CHAR_SCORE
        )
        assert get_score("A", "0a", use_device, CaseMatching.RESPECT) is None
        assert (
            get_score("A", "0a", use_device, CaseMatching.IGNORE) == MATCH_SCORE
        )

    def test_unicode_per_codepoint(self, use_device):
        assert (
            get_score("é", "é", use_device)
            == CHAR_SCORE + PREFIX_BONUS + EXACT_MATCH_BONUS
        )
        assert (
            get_score("éx", "éx", use_device)
            == 2 * CHAR_SCORE + PREFIX_BONUS + EXACT_MATCH_BONUS
        )
        assert get_score("é", "xé", use_device) == CHAR_SCORE

    def test_unicode_case_fold(self, use_device):
        for needle, upper in [("é", "É"), ("и", "И"), ("α", "Α")]:
            assert (
                get_score(needle, upper, use_device, CaseMatching.IGNORE)
                is not None
            )
            assert (
                get_score(needle, upper, use_device, CaseMatching.RESPECT)
                is None
            )

    def test_unicode_rejects_hybrid_bytes(self, use_device):
        # Cherokee 'Ꭰ' U+13A0 = E1 8E A0 vs 'ꭰ' U+AB70 = EA AD B0: the
        # hybrid E1 AD B0 (U+1B70) must not match, the true lowercase must
        assert (
            get_score("Ꭰ", "᭰", use_device, CaseMatching.IGNORE) is None
        )
        assert (
            get_score("Ꭰ", "ꭰ", use_device, CaseMatching.IGNORE) is not None
        )

    def test_length_changing_fold_case_sensitive(self, use_device):
        assert get_score("ß", "ß", use_device, CaseMatching.IGNORE) is not None
        assert get_score("ß", "SS", use_device, CaseMatching.IGNORE) is None
        assert get_score("ß", "ss", use_device, CaseMatching.IGNORE) is None

    def test_substring_alignment_positions(self, use_device):
        for prefix_len in [0, 1, 7, 8, 15, 16, 31, 32, 63, 64, 65]:
            hay = "x" * prefix_len + "bar"
            ms = Matcher(
                "bar", Config(matching=Matching.SUBSTRING),
                use_device=use_device,
            ).match_list([hay])
            assert len(ms) == 1, prefix_len
            assert ms[0].index == 0

    def test_unicode_indices_span_whole_run(self, use_device):
        ms = Matcher(
            "é다", Config(matching=Matching.SUBSTRING), use_device=use_device
        ).match_list_indices(["xxé다yy"])
        assert len(ms) == 1
        assert ms[0].indices == [6, 5, 4, 3, 2]


def test_substring_picks_best_scoring_occurrence():
    # earlier occurrence wins ties; a delimiter-bonused later one wins
    cfg = Config(matching=Matching.SUBSTRING)
    dev = Matcher("bar", cfg).match_list(["xbarx_y_bar"])
    host = Matcher("bar", cfg, use_device=False).match_list(["xbarx_y_bar"])
    assert dev == host
    assert dev[0].end_col == 10  # the _bar occurrence (delimiter bonus)
