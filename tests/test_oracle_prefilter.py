"""Ported prefilter truth tables + randomized LCS-oracle parity
(reference: src/prefilter/mod.rs:188-300, 895-1047)."""

import random

from frizbee_tpu.oracle import (
    lcs_accepts,
    make_needle_units,
    prefilter_window,
    tokenize,
)


def pf(needle, haystack, max_typos, case_sensitive=False, unicode=False):
    nu = make_needle_units(needle, unicode=unicode, case_sensitive=case_sensitive)
    data = haystack.encode()
    hay = tokenize(data, unicode=unicode)
    return prefilter_window(nu, hay, len(data), max_typos)


def matched(needle, haystack, max_typos, **kw):
    return pf(needle, haystack, max_typos, **kw)[0]


def test_ordered_matching_cases():
    for needle, haystack, max_typos, want in [
        ("foo", "foo", 0, True),
        ("foo", "f_o_o", 0, True),
        ("foo", "FOO", 0, True),
        ("abc", "xaxbxcx", 0, True),
        ("fo", "_______________fo", 0, True),
        ("foo", "f_______________o_______________o", 0, True),
        ("foo", "oof", 0, False),
        ("abc", "cba", 0, False),
        ("foo", "fo", 0, False),
        ("foo", "f_________________________o______", 0, False),
        ("a", "", 0, False),
        ("\0", "abc", 0, False),
        ("aa", "a", 0, False),
    ]:
        assert matched(needle, haystack, max_typos) == want, (needle, haystack)


def test_typo_matching_cases():
    for needle, haystack, max_typos, want in [
        ("abc", "", 2, False),
        ("abc", "", 3, True),
        ("abc", "bc", 1, True),
        ("abc", "ac", 1, True),
        ("abc", "ab", 1, True),
        ("bar", "ba", 1, True),
        ("bar", "ar", 1, True),
        ("hello", "hll", 2, True),
        ("abcdef", "abdf", 2, True),
        ("TeSt", "ES", 2, True),
        ("abc", "c", 2, True),
        ("a\0b", "ab", 1, True),
        ("foo", "fo", 5, True),
        ("abc", "a_______________b", 1, True),
        ("test", "t_______________s_______________t", 1, True),
        ("d63NacaDJaaaa", "63aeeaaaeeaaaaaaaNacaDJaaAa", 1, True),
        ("bar", "rb", 1, False),
        ("abcdef", "fcda", 2, False),
        ("TeSt", "ES", 1, False),
        ("abc", "cba", 1, False),
        ("abc", "cba", 2, True),
        ("aaa", "aa", 0, False),
        ("aaa", "aa", 1, True),
        ("aba", "aa", 1, True),
        ("aaba", "aba", 1, True),
    ]:
        assert matched(needle, haystack, max_typos) == want, (
            needle,
            haystack,
            max_typos,
        )


def test_case_sensitive_matching_cases():
    for needle, haystack, max_typos, want in [
        ("foo", "foo", 0, True),
        ("foo", "FOO", 0, False),
        ("FoO", "xxFoOxx", 0, True),
        ("abc", "xaxbxcx", 0, True),
        ("abc", "xAxBxCx", 0, False),
        ("TeSt", "eS", 2, True),
        ("TeSt", "ES", 2, False),
        ("Ab", "b", 1, True),
        ("Ab", "ab", 0, False),
        ("Ab", "ab", 1, True),
    ]:
        assert matched(needle, haystack, max_typos, case_sensitive=True) == want, (
            needle,
            haystack,
            max_typos,
        )


def test_returned_windows_are_conservative():
    assert pf("foo", "xxfooxfoo", 0) == (True, 2, 9)
    assert pf("abc", "xxaybzczz", 0) == (True, 2, 7)
    assert pf("abcd", "xxaydz", 2) == (True, 2, 5)
    assert pf("abc", "xyz", 3) == (True, 0, 3)


def test_unicode_prefilter_matches_full_utf8_chars():
    for needle, haystack, want in [
        ("إن", "xxإنyy", (True, 2, 6)),
        ("니다", "xx니__다yy", (True, 2, 10)),
        ("😀", "xx😀yy", (True, 2, 6)),
    ]:
        assert pf(needle, haystack, 0, unicode=True) == want, (needle, haystack)


def test_unicode_prefilter_rejects_same_final_bytes_with_wrong_prefixes():
    wrong_first = "ۥ"
    wrong_second = "؆"
    assert "إ".encode()[1] == wrong_first.encode()[1]
    assert "إ".encode()[0] != wrong_first.encode()[0]
    assert not matched("إ", wrong_first, 0, unicode=True)
    assert not matched("إ", wrong_second, 0, unicode=True)


def test_randomized_lcs_parity():
    """The prefilter bool must equal the LCS acceptance oracle
    (reference: src/prefilter/mod.rs:1013-1047)."""
    rng = random.Random(42)
    alphabet = "abcABC_xyz01"
    for _ in range(3000):
        n = rng.randint(1, 8)
        m = rng.randint(0, 24)
        needle = "".join(rng.choice(alphabet) for _ in range(n))
        haystack = "".join(rng.choice(alphabet) for _ in range(m))
        typos = rng.choice([0, 1, 2, 3])
        cs = rng.random() < 0.5
        nu = make_needle_units(needle, unicode=False, case_sensitive=cs)
        hay = tokenize(haystack.encode(), unicode=False)
        got = prefilter_window(nu, hay, len(haystack.encode()), typos)[0]
        want = lcs_accepts(nu, hay, typos)
        assert got == want, (needle, haystack, typos, cs)


def test_randomized_lcs_parity_unicode():
    rng = random.Random(43)
    alphabet = "abéζ다😀_x"
    for _ in range(1500):
        n = rng.randint(1, 5)
        m = rng.randint(0, 12)
        needle = "".join(rng.choice(alphabet) for _ in range(n))
        haystack = "".join(rng.choice(alphabet) for _ in range(m))
        typos = rng.choice([0, 1, 2])
        nu = make_needle_units(needle, unicode=True, case_sensitive=False)
        data = haystack.encode()
        hay = tokenize(data, unicode=True)
        got = prefilter_window(nu, hay, len(data), typos)[0]
        want = lcs_accepts(nu, hay, typos)
        assert got == want, (needle, haystack, typos)


def test_window_contains_all_short_embeddings():
    """Property: every <=typos-deletion embedding of the needle lies inside
    the reported window (the window must never cut off an alignment)."""
    rng = random.Random(7)
    alphabet = "abcx_"
    for _ in range(2000):
        n = rng.randint(1, 5)
        m = rng.randint(1, 14)
        needle = "".join(rng.choice(alphabet) for _ in range(n))
        haystack = "".join(rng.choice(alphabet) for _ in range(m))
        nu = make_needle_units(needle, unicode=False, case_sensitive=False)
        hay = tokenize(haystack.encode(), unicode=False)
        ok, start, end = prefilter_window(nu, hay, m, 0)
        if not ok:
            continue
        # the greedy-leftmost embedding must fit
        pos = -1
        fits = True
        for k in range(n):
            nxt = next(
                (
                    j
                    for j in range(pos + 1, m)
                    if hay.cp[j] in (nu.orig[k], nu.flip[k])
                ),
                None,
            )
            if nxt is None:
                fits = False
                break
            pos = nxt
        assert fits
        assert start <= m and end <= m + 1
        assert start < end
