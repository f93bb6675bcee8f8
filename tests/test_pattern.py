"""Pattern/query parser table tests (reference: src/pattern.rs:307-345)."""

import pytest

from frizbee_tpu.config import Matching
from frizbee_tpu.pattern import Pattern


def assert_parse(atom, needle, matching, negated):
    p = Pattern.parse(atom)
    assert p.needle == needle, (atom, p.needle)
    assert p.config.matching == matching, (atom, p.config.matching)
    assert p.negated == negated, atom


def test_parse_selects_matching_mode():
    assert_parse("foo", "foo", None, False)
    assert_parse("^foo", "foo", Matching.PREFIX, False)
    assert_parse("foo$", "foo", Matching.SUFFIX, False)
    assert_parse("'foo", "foo", Matching.SUBSTRING, False)
    assert_parse("^foo$", "foo", Matching.EXACT, False)


def test_parse_negation():
    # Bare negated atoms match substrings, like fzf and nucleo
    assert_parse("!foo", "foo", Matching.SUBSTRING, True)
    assert_parse("!^foo", "foo", Matching.PREFIX, True)
    assert_parse("!foo$", "foo", Matching.SUFFIX, True)
    assert_parse("!'foo", "foo", Matching.SUBSTRING, True)
    assert_parse("!^foo$", "foo", Matching.EXACT, True)


def test_parse_escapes_special_syntax():
    assert_parse("\\^foo", "^foo", None, False)
    assert_parse("foo\\$", "foo$", None, False)
    assert_parse("\\'foo", "'foo", None, False)
    assert_parse("\\!foo", "!foo", None, False)
    assert_parse("foo\\ bar", "foo bar", None, False)
    assert_parse("!\\^foo", "^foo", Matching.SUBSTRING, True)
    assert_parse("!\\!foo", "!foo", Matching.SUBSTRING, True)


def test_parse_escaped_backslash_before_operator():
    assert_parse("foo\\\\$", "foo\\\\", Matching.SUFFIX, False)
    # Backslashes before non-special characters are literal
    assert_parse("foo\\bar", "foo\\bar", None, False)
    assert_parse("foo\\", "foo\\", None, False)
    # The first two backslashes pair up, the third escapes the space
    assert_parse("a\\\\\\ b", "a\\\\ b", None, False)


def test_parse_query_splits_and_drops_empty():
    ps = Pattern.parse_query("foo  !^bar   ")
    assert [(p.needle, p.negated) for p in ps] == [
        ("foo", False), ("bar", True)
    ]
    assert Pattern.parse_query("   ") == []
    assert Pattern.parse_query("! ^ $") == []


def test_parse_query_escaped_space_joins_atoms():
    ps = Pattern.parse_query("foo\\ bar baz")
    assert [p.needle for p in ps] == ["foo bar", "baz"]
