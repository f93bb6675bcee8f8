"""Native C++ packer vs the NumPy packer (its differential oracle)."""

import numpy as np
import pytest

import frizbee_tpu.native as native
from frizbee_tpu import corpus as C
from frizbee_tpu.datagen import partial_match_corpus

CASES = (
    partial_match_corpus(median_length=40, num_samples=300, seed=5)
    + ["héllo wörld 漢字", "ß" * 10, "", "x" * 3000, "𝄞 clef", "γειά"]
)


@pytest.mark.skipif(native.get_lib() is None, reason="no native toolchain")
@pytest.mark.parametrize("unicode", [False, True])
def test_native_matches_numpy(unicode):
    c_native = C.pack_corpus(CASES, unicode=unicode)
    saved = native._lib, native._tried
    try:
        native._lib, native._tried = None, True
        c_numpy = C.pack_corpus(CASES, unicode=unicode)
    finally:
        native._lib, native._tried = saved
    assert len(c_native.buckets) == len(c_numpy.buckets)
    np.testing.assert_array_equal(c_native.xl_indices, c_numpy.xl_indices)
    for b1, b2 in zip(c_native.buckets, c_numpy.buckets):
        assert b1.width == b2.width
        np.testing.assert_array_equal(b1.indices, b2.indices)
        np.testing.assert_array_equal(b1.n_units, b2.n_units)
        np.testing.assert_array_equal(b1.n_bytes, b2.n_bytes)
        for a, b in zip(b1._full_arrays(), b2._full_arrays()):
            np.testing.assert_array_equal(a, b)
