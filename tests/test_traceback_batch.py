"""Batched traceback (frizbee_tpu/traceback.py) vs the per-row oracle.

``match_list_indices`` on the device path routes single-pattern fuzzy
matches through the vectorized NumPy walk; the ``use_device=False`` matcher
walks the scalar oracle per row. Both must agree exactly (scores, exact
flags, reversed byte indices, ordering)."""

import numpy as np
import pytest

from frizbee_tpu.config import Config, Scoring
from frizbee_tpu.datagen import (
    HaystackGenerationOptions,
    generate_haystack,
    unicode_corpus,
)
from frizbee_tpu.matcher import Matcher


def _assert_indices_equal(hay, needle, cfg):
    dev = Matcher(needle, cfg).match_list_indices(hay)
    host = Matcher(needle, cfg, use_device=False).match_list_indices(hay)
    assert len(dev) == len(host)
    for a, b in zip(dev, host):
        assert (a.index, a.score, a.exact) == (b.index, b.score, b.exact)
        assert a.indices == b.indices, (a.index, hay[a.index])


@pytest.fixture(scope="module")
def hay():
    return generate_haystack(
        "deadbeef",
        HaystackGenerationOptions(
            seed=21, partial_match_percentage=0.5, match_percentage=0.35,
            median_length=32, std_dev_length=20, num_samples=600,
        ),
    )


def test_batched_traceback_default(hay):
    _assert_indices_equal(hay, "deadbeef", Config())


@pytest.mark.parametrize("typos", [1, 2, None])
def test_batched_traceback_typos(hay, typos):
    _assert_indices_equal(hay, "deadbeef", Config(max_typos=typos))


def test_batched_traceback_casing_and_delims():
    hay = [
        "DeadBeef", "dead_beef", "dead/beef!", "DEADBEEF", "deadbeef",
        " deadbeef", "xx dead beef xx", "d-e-a-d-b-e-e-f",
    ] * 16
    _assert_indices_equal(hay, "DeadBeef", Config())
    _assert_indices_equal(hay, "deadbeef", Config())


def test_batched_traceback_unicode():
    hay = unicode_corpus(
        "arabic", num_samples=400, median_units=16, needle="إن",
        needle_every=3, seed=5,
    )
    _assert_indices_equal(hay, "إن", Config())


def test_batched_traceback_custom_scoring(hay):
    cfg = Config(
        scoring=Scoring(match_score=24, gap_open_penalty=7,
                        capitalization_bonus=9)
    )
    _assert_indices_equal(hay, "dead", cfg)


@pytest.mark.parametrize("typos", [0, 2, None])
def test_native_walk_equals_numpy_walk(hay, typos):
    """The C++ fill+walk (native/packer.cpp sw_indices_batch) must equal
    the NumPy twin tuple-for-tuple; keeps the NumPy path exercised on
    hosts where the native library builds."""
    import frizbee_tpu.traceback as tb
    from frizbee_tpu import native
    from frizbee_tpu.engine import FuzzyEngine

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    for needle in ("deadbeef", "DeadBe"):
        eng = FuzzyEngine(needle, Config(max_typos=typos))
        nat = tb.batched_match_indices(eng, hay)
        tb._FORCE_NUMPY = True
        try:
            ref = tb.batched_match_indices(eng, hay)
        finally:
            tb._FORCE_NUMPY = False
        assert nat == ref
