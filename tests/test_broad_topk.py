"""The block-min tournament result selection (ops/batch._broad_topk):
the exact replacement for the broad-needle full (Q, total) result sort.

Layers tested, per the repo correctness chain: the primitive against a
NumPy full sort (bit-equality, incl. sentinel blocks, heavy hi-half
ties, and the fetch==NB boundary), the gate arithmetic, and the serving
path end-to-end against the host oracle with shapes that force the
tournament branch (white-box asserted)."""

import numpy as np
import pytest

from frizbee_tpu.config import Config
from frizbee_tpu.corpus import pack_corpus
from frizbee_tpu.datagen import all_match_corpus
from frizbee_tpu.matcher import Matcher, match_topk_batch
from frizbee_tpu.ops.batch import (
    BROAD_TOPK_R,
    _broad_topk,
    _broad_topk_ok,
)

SENT = np.int64(0x7FFFFFFFFFFFFFFF)


def _halves(keys_np):
    import jax.numpy as jnp

    hi = (keys_np >> 32).astype(np.int64).astype(np.uint32)
    lo = (keys_np & 0xFFFFFFFF).astype(np.uint32)
    return (
        jnp.asarray(hi.view(np.int32)),
        jnp.asarray(lo.view(np.int32)),
    )


def _keys(rng, Q, T, match_frac, n_scores, idx_bits=20):
    idx = np.arange(T, dtype=np.int64)
    score = rng.integers(0, n_scores, (Q, T)).astype(np.int64)
    matched = rng.random((Q, T)) < match_frac
    return np.where(
        matched,
        ((0xFFFF - score) << (idx_bits + 16)) | (idx << 16)[None, :],
        SENT,
    )


@pytest.mark.parametrize(
    "Q,T,fetch,match_frac,n_scores",
    [
        (3, 4096, 16, 0.5, 40),
        (2, 16384, 64, 0.9, 3),  # heavy ties: 3 scores over 15k rows
        (4, 8192, 32, 0.02, 8),  # sparse: most blocks all-sentinel
    ],
)
def test_broad_topk_equals_full_sort(Q, T, fetch, match_frac, n_scores):
    rng = np.random.default_rng(Q * T + fetch)
    keys_np = _keys(rng, Q, T, match_frac, n_scores)
    assert _broad_topk_ok(T, fetch)
    hi, lo = _halves(keys_np)
    got = np.asarray(
        _broad_topk(hi, lo, fetch_rows=fetch, interpret=True)
    )
    want = np.sort(keys_np, axis=1)[:, :fetch]
    np.testing.assert_array_equal(got, want)


def test_broad_topk_all_sentinel_and_boundary():
    # one query fully unmatched; fetch == NB (the block-count boundary)
    T, R = 8192, BROAD_TOPK_R
    keys_np = np.full((2, T), SENT)
    keys_np[1, 7] = np.int64(123) << 16
    fetch = T // R
    # the half-width gate rejects fetch == NB (gather would cover the
    # whole width) — the primitive itself must still be exact there
    assert not _broad_topk_ok(T, fetch)
    hi, lo = _halves(keys_np)
    got = np.asarray(
        _broad_topk(hi, lo, fetch_rows=fetch, interpret=True)
    )
    np.testing.assert_array_equal(
        got, np.sort(keys_np, axis=1)[:, :fetch]
    )


def test_broad_topk_gate():
    R = BROAD_TOPK_R
    assert _broad_topk_ok(1024 * 1024, 2048)  # the 1M serving shape
    assert not _broad_topk_ok(1024 * 1024, 6144)  # gather > total/2
    assert not _broad_topk_ok(8 * R + 1, 4)  # unpadded total
    assert not _broad_topk_ok(4 * R, 8)  # fewer blocks than fetch
    # group-padded totals are always R-aligned (1024 % R == 0)
    assert 1024 % R == 0


def test_broad_topk_serving_parity():
    """End-to-end: an all-match corpus past the gate width with a
    small top-k forces the in-place flow's plain finalize through the
    tournament (no capped tier at < MIXED_FINALIZE_MIN_GROUPS groups);
    results must stay bit-equal to the host oracle."""
    k = 32
    hay = all_match_corpus(
        median_length=24, num_samples=10300, seed=77
    )
    corpus = pack_corpus(hay, unicode=False)
    total = sum(
        -(-b.cp.shape[0] // 1024) * 1024 for b in corpus.buckets
    )
    assert _broad_topk_ok(total, min(k, len(corpus)))  # white-box

    cfg = Config()
    queries = ["deadbeef", "dbef"]
    res = match_topk_batch(queries, corpus, cfg, k=k)
    for q, r in zip(queries, res):
        ref = Matcher.from_query(
            q, cfg, use_device=False
        ).match_arrays(corpus)
        count, got = r[0], r[1:]
        assert count == len(ref[0])
        for a, b in zip(got, tuple(x[:k] for x in ref)):
            np.testing.assert_array_equal(a, b)
