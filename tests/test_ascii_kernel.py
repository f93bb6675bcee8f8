"""Pallas ASCII kernel parity vs the jnp pipeline (which is itself pinned
to the host oracle and the reference's scoring tests).

Mirrors the reference's two-rung backend testing: contract-level checks on
boundary-biased inputs plus randomized parity against a lane-matched oracle
(reference: src/smith_waterman/backend/tests/parity.rs). On CPU the kernels
run in interpreter mode; the same code compiles via Mosaic on TPU.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from frizbee_tpu.config import Config  # noqa: E402
from frizbee_tpu.corpus import pack_corpus  # noqa: E402
from frizbee_tpu.datagen import (  # noqa: E402
    HaystackGenerationOptions,
    generate_haystack,
)
from frizbee_tpu.engine import FuzzyEngine  # noqa: E402
from frizbee_tpu.ops.kernels import fuzzy_match_ascii  # noqa: E402
from frizbee_tpu.ops.fuzzy import fuzzy_pipeline  # noqa: E402


def _kernel_vs_jnp(haystacks, needle, typos, widths=(128,)):
    config = Config(max_typos=typos)
    eng = FuzzyEngine(needle, config)
    orig, flip, sc = eng._device_needle()
    nopre = typos is None
    t = 0 if nopre else typos
    packed = jnp.concatenate([orig, flip]).astype(jnp.int32)
    sct = tuple(int(x) for x in np.asarray(sc))
    corpus = pack_corpus(haystacks, unicode=False, bucket_widths=widths)
    assert corpus.buckets, "corpus collapsed to XL only"
    for b in corpus.buckets:
        cp, first, prev, boff, blen = b._full_arrays()
        ref = fuzzy_pipeline(
            jnp.asarray(cp), jnp.asarray(first),
            jnp.asarray(prev), jnp.asarray(boff),
            jnp.asarray(blen), jnp.asarray(b.n_units),
            jnp.asarray(b.n_bytes), orig, flip, sc,
            max_typos=t, no_prefilter=nopre,
        )
        cp8 = jnp.asarray(cp.astype(np.uint8).astype(np.int8))
        nu = jnp.asarray(b.n_units.astype(np.int32)[:, None])
        m, s, e, ec = fuzzy_match_ascii(
            cp8, nu, packed, max_typos=t, no_prefilter=nopre,
            scoring=sct, interpret=True,
        )
        rm, rs, re_, rec = [np.asarray(x) for x in ref[:4]]
        m = np.asarray(m)
        np.testing.assert_array_equal(m, rm)
        np.testing.assert_array_equal(np.asarray(s)[rm], rs[rm])
        np.testing.assert_array_equal(np.asarray(e)[rm], re_[rm])
        np.testing.assert_array_equal(np.asarray(ec)[rm], rec[rm])


BOUNDARY_CASES = [
    "",
    "d",
    "deadbeef",
    "deadbeefdeadbeef",
    "x" * 127 + "d",
    "d" + "x" * 127,
    "de" + "x" * 60 + "adbeef",
    "DEADBEEF",
    "DeadBeef",
    "dead beef",
    "dead/beef",
    "dead_beef_dead_beef",
    "eadbeef",  # missing first char
    "deadbee",  # missing last char
    "daedbeef",  # transposition
    "xxdxxexxaxxdxxbxxexxexxfxx",
    "f" * 128,
    "deadbeef" * 16,
]


@pytest.mark.parametrize("typos", [0, 1, 2, None])
def test_kernel_boundary_cases(typos):
    _kernel_vs_jnp(BOUNDARY_CASES, "deadbeef", typos)


@pytest.mark.parametrize("needle", ["d", "de", "DeAd", "dead beef"])
def test_kernel_short_needles(needle):
    _kernel_vs_jnp(BOUNDARY_CASES, needle, 0)


def test_kernel_randomized_parity():
    hay = generate_haystack(
        "deadbeef",
        HaystackGenerationOptions(
            seed=123, partial_match_percentage=0.3, match_percentage=0.2,
            median_length=48, std_dev_length=30, num_samples=300,
        ),
    )
    for typos in (0, 1, None):
        _kernel_vs_jnp(hay, "deadbeef", typos)


def test_kernel_wide_bucket():
    hay = ["deadbeef" + "x" * 200, "x" * 250, ("de" + "y" * 100) * 2]
    _kernel_vs_jnp(hay, "deadbeef", 0, widths=(256,))


def test_kernel_typo3_path():
    hay = ["dxxf", "df", "deadbeef", "zzzz", "dbef"]
    _kernel_vs_jnp(hay, "dbef", 3)


# Short rows for the narrow (sub-lane packed) buckets: G = 128//W logical
# rows share one 128-lane vector with segmented scans (kernels `seg`)
NARROW_CASES = [
    "",
    "d",
    "deadbeef",
    "DEADBEEF",
    "DeadBeef",
    "dead beef",
    "dead/beef",
    "eadbeef",
    "deadbee",
    "daedbeef",
    "dxexaxdxbxexexf",
    "f" * 15,
    "xdeadbeefx",
    "de adbe ef",
    "_deadbeef",
    "beefdead",
]


@pytest.mark.parametrize("width", [16, 32, 64])
@pytest.mark.parametrize("typos", [0, 1, 2, None])
def test_kernel_narrow_seg_packing(width, typos):
    """W < 128 buckets pack G = 128//W rows per vector (segmented scans);
    results must stay bit-identical to the jnp pipeline row-for-row."""
    _kernel_vs_jnp(NARROW_CASES, "deadbeef", typos, widths=(width,))


@pytest.mark.parametrize("width", [16, 64])
def test_kernel_narrow_seg_randomized(width):
    hay = generate_haystack(
        "deadbeef",
        HaystackGenerationOptions(
            seed=321, partial_match_percentage=0.3, match_percentage=0.2,
            median_length=max(8, width - 6), std_dev_length=4,
            num_samples=257,  # odd count: exercises the G-padding path
        ),
    )
    hay = [h[:width] for h in hay]
    for typos in (0, 1, None):
        _kernel_vs_jnp(hay, "deadbeef", typos, widths=(width,))


def test_pack_rows_for_kernel_roundtrip():
    from frizbee_tpu.ops.kernels import pack_rows_for_kernel

    cp = jnp.arange(8 * 32, dtype=jnp.int8).reshape(8, 32)
    nu = jnp.arange(8, dtype=jnp.int32).reshape(8, 1)
    cp_k, nu_k, seg, g = pack_rows_for_kernel(cp, nu)
    assert (seg, g) == (32, 4)
    assert cp_k.shape == (2, 128)
    assert nu_k.shape == (2, 4)
    # row-major: logical row r lands in vector row r//G, segment r%G
    np.testing.assert_array_equal(
        np.asarray(cp_k).reshape(8, 32), np.asarray(cp)
    )
    np.testing.assert_array_equal(
        np.asarray(nu_k).reshape(8, 1), np.asarray(nu)
    )
    # W >= 128 passes through
    cp2 = jnp.zeros((4, 128), jnp.int8)
    nu2 = jnp.zeros((4, 1), jnp.int32)
    r = pack_rows_for_kernel(cp2, nu2)
    assert r[2] == 0 and r[3] == 1 and r[0] is cp2


def test_kernel_int16_lanes_parity():
    """The u8/u16 dual-precision analog: int16 score lanes must agree with
    int32 bit-for-bit whenever score_fits_int16 admits the config
    (reference: src/smith_waterman/mod.rs:92-116). Interpreter-mode only:
    the current Mosaic backend can't lower 16-bit VPU ops (see
    kernels.INT16_MOSAIC_OK)."""
    import jax.numpy as jnp

    from frizbee_tpu.ops.kernels import (
        match_units,
        pack_needle_scalars,
        score_fits_int16,
    )
    from frizbee_tpu.ops.kernels import DEFAULT_SCORING

    assert score_fits_int16(DEFAULT_SCORING, 8, 128)
    hay = generate_haystack(
        "deadbeef",
        HaystackGenerationOptions(
            seed=77, partial_match_percentage=0.4, match_percentage=0.2,
            median_length=40, std_dev_length=25, num_samples=300,
        ),
    )
    corpus = pack_corpus(hay, unicode=False, bucket_widths=(128,))
    b = corpus.buckets[0]
    cp8 = jnp.asarray(b.cp.astype(np.uint8).astype(np.int8))
    nu = jnp.asarray(b.n_units.astype(np.int32)[:, None])
    needle = np.frombuffer(b"deadbeef", dtype=np.uint8).astype(np.int32)
    scalars = pack_needle_scalars(
        jnp.asarray(np.concatenate([needle, needle])), cp8.shape[0]
    )
    outs = [
        np.asarray(
            match_units(
                cp8, nu, scalars, max_typos=t, unicode=False,
                no_prefilter=False, int16_lanes=i16, interpret=True,
            )
        )
        for t in (0, 1)
        for i16 in (False, True)
    ]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[2], outs[3])
