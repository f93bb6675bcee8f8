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


def test_cluster_order_is_permutation_and_leaf_sorted():
    """Colstream clustering returns a valid permutation whose leaf runs
    stay unit-count-sorted, for both bit-ranking policies."""
    import numpy as np

    from frizbee_tpu.corpus import _cluster_order

    rng = np.random.default_rng(0)
    b, leaf = 5000, 256
    counts = (rng.random((b, 128)) < 0.2).astype(np.uint8) * rng.integers(
        1, 4, (b, 128)
    ).astype(np.uint8)
    nu = rng.integers(1, 65, b).astype(np.int32)
    for unicode in (False, True):
        order = _cluster_order(counts, nu, leaf, unicode=unicode)
        assert sorted(order.tolist()) == list(range(b))
    # tiny bucket: plain nu sort
    order = _cluster_order(counts[:100], nu[:100], leaf, unicode=False)
    assert np.all(np.diff(nu[:100][order]) >= 0)


def test_colstream_blocks_roundtrip_indices():
    """device_arrays_colstream's idxT must map every real row exactly
    once and carry -1 padding slots."""
    import numpy as np

    from frizbee_tpu.corpus import pack_corpus

    rng = np.random.default_rng(1)
    pool = list("abcdefghij/XYZ")
    hay = [
        "".join(rng.choice(pool, size=int(rng.integers(1, 60))))
        for _ in range(3000)
    ]
    corpus = pack_corpus(hay, unicode=False)
    for b in corpus.buckets:
        cpT, nuT, idxT, blk_bits, _ctxT = b.device_arrays_colstream()
        idx = np.asarray(idxT)
        real = idx[idx >= 0]
        want = b.indices[b.indices >= 0]
        assert sorted(real.tolist()) == sorted(want.tolist())
        # padded length covers whole groups; blk_bits rows match groups
        assert idx.shape[0] % (cpT.shape[1] * 128) == 0
        assert blk_bits.shape[0] == idx.shape[0] // (cpT.shape[1] * 128)
