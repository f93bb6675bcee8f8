"""Packed corpus arrays must agree with the per-haystack tokenize oracle."""

import random

import numpy as np

from frizbee_tpu.corpus import pack_corpus
from frizbee_tpu.oracle import tokenize


def check(haystacks, unicode):
    corpus = pack_corpus(haystacks, unicode=unicode)
    seen = set()
    for bucket in corpus.buckets:
        cp, first_byte, prev_last_byte, byte_off, byte_len = (
            bucket._full_arrays()
        )
        for r in range(bucket.size):
            idx = int(bucket.indices[r])
            if idx < 0:  # size-class padding row
                assert bucket.n_units[r] == 0 and bucket.n_bytes[r] == 0
                continue
            seen.add(idx)
            h = haystacks[idx].encode()
            units = tokenize(h, unicode=unicode)
            m = len(units.cp)
            assert bucket.n_units[r] == m
            assert bucket.n_bytes[r] == len(h)
            assert m <= bucket.width
            np.testing.assert_array_equal(cp[r, :m], units.cp)
            np.testing.assert_array_equal(first_byte[r, :m], units.first_byte)
            np.testing.assert_array_equal(
                prev_last_byte[r, :m], units.prev_last_byte
            )
            np.testing.assert_array_equal(byte_off[r, :m], units.byte_off)
            np.testing.assert_array_equal(byte_len[r, :m], units.byte_len)
    for idx in corpus.xl_indices:
        seen.add(int(idx))
    assert seen == set(range(len(haystacks)))


def test_pack_ascii():
    haystacks = ["", "a", "hello_world", "x" * 100, "y" * 2000, "foo/bar/baz.rs"]
    check(haystacks, unicode=False)


def test_pack_unicode():
    haystacks = ["", "héllo", "다나foo", "😀" * 40, "é" * 600, "plain_ascii"]
    check(haystacks, unicode=True)


def test_pack_random():
    rng = random.Random(1)
    alphabet = "abcXYZ_/.012é다😀"
    haystacks = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        for _ in range(200)
    ]
    check(haystacks, unicode=True)
    check(haystacks, unicode=False)
