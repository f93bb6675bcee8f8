"""Ported pinned scoring tests (reference: src/smith_waterman/mod.rs:208-449,
src/smith_waterman/greedy.rs tests). These define scoring truth for the build.
"""

from frizbee_tpu.config import (
    CAPITALIZATION_BONUS,
    DELIMITER_BONUS,
    GAP_EXTEND_PENALTY,
    GAP_OPEN_PENALTY,
    MATCH_SCORE,
    MATCHING_CASE_BONUS,
    PREFIX_BONUS,
    Scoring,
)
from frizbee_tpu.oracle import (
    make_needle_units,
    match_end_col,
    match_greedy,
    sw_indices,
    sw_score,
    tokenize,
)
from frizbee_tpu.oracle.smith_waterman import sw_has_alignment, sw_matrices

CHAR_SCORE = MATCH_SCORE + MATCHING_CASE_BONUS
S = Scoring()


def get_score(needle, haystack, case_sensitive=False):
    nu = make_needle_units(needle, unicode=False, case_sensitive=case_sensitive)
    hay = tokenize(haystack.encode(), unicode=False)
    return sw_score(nu, hay, S, include_prefix=True)


def get_unicode_score(needle, haystack):
    nu = make_needle_units(needle, unicode=True, case_sensitive=False)
    hay = tokenize(haystack.encode(), unicode=True)
    return sw_score(nu, hay, S, include_prefix=True)


def get_score_typos(needle, haystack, max_typos, case_sensitive=False):
    nu = make_needle_units(needle, unicode=False, case_sensitive=case_sensitive)
    hay = tokenize(haystack.encode(), unicode=False)
    score = sw_score(nu, hay, S, include_prefix=True)
    if sw_has_alignment(nu, hay, S, True, max_typos):
        return score
    return None


def get_indices(needle, haystack):
    nu = make_needle_units(needle, unicode=False, case_sensitive=False)
    hay = tokenize(haystack.encode(), unicode=False)
    return sw_indices(nu, hay, S, True, None)[1]


def get_unicode_indices(needle, haystack):
    nu = make_needle_units(needle, unicode=True, case_sensitive=False)
    hay = tokenize(haystack.encode(), unicode=True)
    return sw_indices(nu, hay, S, True, None)[1]


def get_end_col(needle, haystack, unicode=False):
    nu = make_needle_units(needle, unicode=unicode, case_sensitive=False)
    hay = tokenize(haystack.encode(), unicode=unicode)
    H, _ = sw_matrices(nu, hay, S, True)
    return match_end_col(H, hay)


def test_score_basic():
    assert get_score("b", "abc") == CHAR_SCORE
    assert get_score("c", "abc") == CHAR_SCORE


def test_score_prefix():
    assert get_score("a", "abc") == CHAR_SCORE + PREFIX_BONUS
    assert get_score("a", "aabc") == CHAR_SCORE + PREFIX_BONUS
    assert get_score("a", "babc") == CHAR_SCORE


def test_score_exact_match():
    assert get_score("a", "a") == CHAR_SCORE + PREFIX_BONUS
    assert get_score("abc", "abc") == 3 * CHAR_SCORE + PREFIX_BONUS


def test_unicode_score_counts_multibyte_scalars_once():
    assert get_unicode_score("é", "é") == CHAR_SCORE + PREFIX_BONUS
    assert get_unicode_score("😀", "😀") == CHAR_SCORE + PREFIX_BONUS
    assert get_unicode_score("éx", "éx") == 2 * CHAR_SCORE + PREFIX_BONUS


def test_unicode_gap_propagation_counts_skipped_scalars_once():
    assert get_unicode_score("éx", "ébx") == get_unicode_score("éx", "é😀x")
    assert (
        get_unicode_score("ab", "aéb")
        == 2 * CHAR_SCORE + PREFIX_BONUS - GAP_OPEN_PENALTY
    )


def test_unicode_gap_propagation_handles_adjacent_scalar_end_then_body():
    assert (
        get_unicode_score("ab", "aé😀b")
        == 2 * CHAR_SCORE + PREFIX_BONUS - GAP_OPEN_PENALTY - GAP_EXTEND_PENALTY
    )


def test_score_delimiter():
    assert get_score("-", "a--bc") == CHAR_SCORE
    assert get_score("b", "a-b") == CHAR_SCORE + DELIMITER_BONUS
    assert get_score("a", "a-b-c") == CHAR_SCORE + PREFIX_BONUS
    assert get_score("b", "a--b") == CHAR_SCORE + DELIMITER_BONUS
    assert get_score("c", "a--bc") == CHAR_SCORE
    assert get_score("a", "-a--bc") == CHAR_SCORE + DELIMITER_BONUS


def test_score_no_delimiter_for_delimiter_chars():
    assert get_score("-", "a-bc") == CHAR_SCORE
    assert get_score("-", "a--bc") == CHAR_SCORE
    assert get_score("a_b", "a_bb") > get_score("a_b", "a__b")


def test_score_affine_gap():
    assert get_score("test", "Uteost") == CHAR_SCORE * 4 - GAP_OPEN_PENALTY
    assert (
        get_score("test", "Uteoost")
        == CHAR_SCORE * 4 - GAP_OPEN_PENALTY - GAP_EXTEND_PENALTY
    )
    assert (
        get_score("test", "Utooooeoooosoooot")
        == CHAR_SCORE * 4 - GAP_OPEN_PENALTY * 3 - GAP_EXTEND_PENALTY * 9
    )
    assert (
        get_score("test", "Utooooooeoooooosoooooot")
        == CHAR_SCORE * 4 - GAP_OPEN_PENALTY * 3 - GAP_EXTEND_PENALTY * 15
    )


def test_score_capital_bonus():
    assert get_score("a", "A") == MATCH_SCORE + PREFIX_BONUS
    assert get_score("A", "Aa") == CHAR_SCORE + PREFIX_BONUS
    assert get_score("D", "forDist") == CHAR_SCORE + CAPITALIZATION_BONUS
    assert get_score("D", "foRDist") == CHAR_SCORE
    assert get_score("D", "FOR_DIST") == CHAR_SCORE + DELIMITER_BONUS


def test_score_prefix_beats_delimiter():
    assert get_score("swap", "swap(test)") > get_score("swap", "iter_swap(test)")
    assert get_score("_", "_private_member") > get_score("_", "public_member")


def test_score_prefix_beats_capitalization():
    assert get_score("H", "HELLO") > get_score("H", "fooHello")


def test_score_continuous_beats_delimiter():
    assert get_score("foo", "fooo") > get_score("foo", "f_o_o_o")


def test_score_continuous_beats_capitalization():
    assert get_score("fo", "foo") > get_score("fo", "faOo")


def test_tie_prone_alignment_indices_are_stable():
    assert get_indices("aa", "aaa") == [1, 0]
    assert get_indices("ab", "abab") == [1, 0]
    assert get_indices("abc", "xabcabc") == [3, 2, 1]


def test_typo_threshold_distinguishes_mismatch_deletion_and_haystack_gap():
    assert get_score_typos("abc", "axc", 0) is None
    assert get_score_typos("abc", "axc", 1) is not None
    assert get_score_typos("abc", "ac", 0) is None
    assert get_score_typos("abc", "ac", 1) is not None
    assert get_score_typos("abc", "abbc", 0) is not None


def test_one_long_gap_beats_repeated_gap_opens():
    assert get_score("abc", "a111bc") > get_score("abc", "a1b1c")


def test_bonus_precedence_manual_cases():
    assert get_score("b", "b") > get_score("b", "a-b")
    assert get_score("b", "a-b") > get_score("b", "ab")
    assert get_score("B", "aB") > get_score("b", "aB")


def test_case_sensitive_scoring_rejects_folded_bytes():
    assert get_score_typos("A", "A", 0, True) == CHAR_SCORE + PREFIX_BONUS
    assert get_score_typos("A", "a", 0, True) is None
    assert get_score_typos("A", "a", 0, False) == MATCH_SCORE + PREFIX_BONUS


def test_score_typos():
    assert get_score_typos("foo", "Ufooo", 0) == CHAR_SCORE * 3
    assert get_score_typos("foo", "Ufo", 0) is None
    assert get_score_typos("foo", "Ufo", 1) == CHAR_SCORE * 2 - GAP_OPEN_PENALTY
    assert get_score_typos("foo", "Ufo", 2) == CHAR_SCORE * 2 - GAP_OPEN_PENALTY
    assert get_score_typos("foo", "Uf", 1) is None
    assert (
        get_score_typos("foo", "Uf", 2)
        == CHAR_SCORE - GAP_OPEN_PENALTY - GAP_EXTEND_PENALTY
    )
    assert get_score_typos("foo", "U", 2) is None
    assert get_score_typos("foo", "U", 3) == 0
    assert get_score_typos("foo", "U", 4) == 0


def test_indices_basic():
    assert get_indices("_", "abc") == []
    assert get_indices("a", "abc") == [0]
    assert get_indices("b", "abc") == [1]
    assert get_indices("c", "abc") == [2]
    assert get_indices("ac", "________________abc") == [18, 16]
    assert get_indices("foo", "Uf") == [1]


def test_unicode_indices_expand_multibyte_scalars():
    assert get_unicode_indices("é", "é") == [1, 0]
    assert get_unicode_indices("😀", "😀") == [3, 2, 1, 0]
    assert get_unicode_indices("aé", "aé") == [2, 1, 0]


def test_end_col_basic():
    assert get_end_col("abc", "abcdef") == 2
    assert get_end_col("a", "abc") == 0
    assert get_end_col("c", "abc") == 2
    assert get_end_col("def", "abcdef") == 5
    assert get_end_col("def", "________________abcdef") == 21


def test_end_col_unicode():
    assert get_end_col("é", "xxé", unicode=True) == 2
    assert get_end_col("abc", "abcdef", unicode=True) == 2


# --- greedy fallback tests (reference: src/smith_waterman/greedy.rs:96-205) ---


def greedy_score(needle, haystack):
    result = match_greedy(needle.encode(), haystack.encode(), S, False, True)
    return result[0] if result is not None else 0


def test_greedy_basic():
    assert greedy_score("b", "abc") == CHAR_SCORE
    assert greedy_score("c", "abc") == CHAR_SCORE
    assert greedy_score("fbb", "barbazfoobarbaz") == (
        CHAR_SCORE
        - GAP_OPEN_PENALTY
        - GAP_EXTEND_PENALTY
        + CHAR_SCORE
        - GAP_OPEN_PENALTY
        - GAP_EXTEND_PENALTY
        + CHAR_SCORE
    )


def test_greedy_no_match():
    assert greedy_score("a", "b") == 0
    assert greedy_score("ab", "ba") == 0
    assert greedy_score("abc", "ab") == 0


def test_greedy_prefix():
    assert greedy_score("a", "abc") == CHAR_SCORE + PREFIX_BONUS
    assert greedy_score("a", "aabc") == CHAR_SCORE + PREFIX_BONUS
    assert greedy_score("a", "babc") == CHAR_SCORE


def test_greedy_delimiter():
    assert greedy_score("-", "a--bc") == CHAR_SCORE
    assert greedy_score("b", "a-b") == CHAR_SCORE + DELIMITER_BONUS
    assert greedy_score("a", "a-b-c") == CHAR_SCORE + PREFIX_BONUS
    assert greedy_score("b", "a--b") == CHAR_SCORE + DELIMITER_BONUS
    assert greedy_score("c", "a--bc") == CHAR_SCORE
    assert greedy_score("a", "-a--bc") == CHAR_SCORE


def test_greedy_affine_gap():
    assert greedy_score("test", "Uterst") == CHAR_SCORE * 4 - GAP_OPEN_PENALTY
    assert (
        greedy_score("test", "Uterrst")
        == CHAR_SCORE * 4 - GAP_OPEN_PENALTY - GAP_EXTEND_PENALTY
    )


def test_greedy_capital_bonus():
    assert greedy_score("a", "A") == MATCH_SCORE + PREFIX_BONUS
    assert greedy_score("A", "Aa") == CHAR_SCORE + PREFIX_BONUS
    assert greedy_score("d", "forDist") == MATCH_SCORE + CAPITALIZATION_BONUS
    assert greedy_score("D", "forDist") == CHAR_SCORE + CAPITALIZATION_BONUS
    assert greedy_score("D", "foRDist") == CHAR_SCORE
    assert greedy_score("D", "FOR_DIST") == CHAR_SCORE + DELIMITER_BONUS


def test_greedy_huge_gap_saturates():
    haystack = "a" + "x" * 70000 + "b"
    assert greedy_score("ab", haystack) == MATCHING_CASE_BONUS
