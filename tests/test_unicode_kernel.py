"""Pallas unicode (codepoint-unit) kernel parity vs the jnp pipeline.

The unicode twin of test_ascii_kernel.py: exercises
``fuzzy_match_units(unicode=True)`` directly — including 2/3/4-byte
code points, byte windows whose start-1 trim lands mid-codepoint-context,
and typo budgets — against the jnp pipeline (itself pinned to the host
oracle and the reference's unicode scoring tests)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from frizbee_tpu.config import Config  # noqa: E402
from frizbee_tpu.corpus import pack_corpus  # noqa: E402
from frizbee_tpu.datagen import unicode_corpus  # noqa: E402
from frizbee_tpu.engine import FuzzyEngine  # noqa: E402
from frizbee_tpu.ops.kernels import fuzzy_match_units  # noqa: E402
from frizbee_tpu.ops.fuzzy import fuzzy_pipeline  # noqa: E402


def _kernel_vs_jnp(haystacks, needle, typos, widths=(128,)):
    from frizbee_tpu.config import UnicodeMatching

    config = Config(max_typos=typos, unicode=UnicodeMatching.ALWAYS)
    eng = FuzzyEngine(needle, config)
    assert eng.unicode, "twin must exercise the codepoint packing"
    orig, flip, sc = eng._device_needle()
    nopre = typos is None
    t = 0 if nopre else typos
    packed = jnp.concatenate([orig, flip]).astype(jnp.int32)
    sct = tuple(int(x) for x in np.asarray(sc))
    corpus = pack_corpus(haystacks, unicode=True, bucket_widths=widths)
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
        cp32 = jnp.asarray(cp.astype(np.int32))
        nu = jnp.asarray(b.n_units.astype(np.int32)[:, None])
        m, s, e, ec, g = fuzzy_match_units(
            cp32, nu, packed, max_typos=t, no_prefilter=nopre,
            scoring=sct, unicode=True, interpret=True,
        )
        rm, rs, re_, rec, rg = [np.asarray(x) for x in ref[:5]]
        m = np.asarray(m)
        np.testing.assert_array_equal(m, rm)
        np.testing.assert_array_equal(np.asarray(s)[rm], rs[rm])
        np.testing.assert_array_equal(np.asarray(e)[rm], re_[rm])
        np.testing.assert_array_equal(np.asarray(ec)[rm], rec[rm])
        np.testing.assert_array_equal(np.asarray(g)[rm], rg[rm])


# 2-byte (¢, é, ا), 3-byte (€, 가, 다), 4-byte (𐍈, 😀) code points around
# window boundaries; trims that land one byte before a multi-byte unit
BOUNDARY_CASES = [
    "",
    "é",
    "€𐍈",
    "inلux",
    "لineux",
    "x" * 100 + "لinux",
    "لinux" + "€" * 60,
    "€" * 100,
    "aلbicnduex",              # needle interleaved with multi-byte noise
    "LEINUX",                  # case pairs
    "Λinux",                   # Greek capital lambda lookalike
    "l i n u x",
    "l€i€n€u€x",               # 3-byte delimiters between matches
    "𐍈linux𐍈",                # 4-byte flank
    "가나다 linux 가나다",
    "linu",                    # missing last
    "inux",                    # missing first
    "lxinu",                   # transposed tail
    "😀" * 40 + "lin😀ux",
]


@pytest.mark.parametrize("typos", [0, 1, 2, None])
def test_unicode_kernel_boundary_cases(typos):
    _kernel_vs_jnp(BOUNDARY_CASES, "linux", typos)


@pytest.mark.parametrize("needle", ["é", "€𐍈", "لi", "Линукс", "가나다"])
def test_unicode_kernel_needles(needle):
    _kernel_vs_jnp(BOUNDARY_CASES + [needle, needle * 3], needle, 0)


def test_unicode_kernel_randomized_parity():
    for script, needle in (("arabic", "إن"), ("korean", "니다"),
                           ("greek", "αβ")):
        hay = unicode_corpus(
            script, num_samples=300, median_units=30, needle=needle,
            needle_every=4, seed=17,
        )
        for typos in (0, 1, None):
            _kernel_vs_jnp(hay, needle, typos)


@pytest.mark.parametrize("width", [16, 32, 64])
@pytest.mark.parametrize("typos", [0, 1, None])
def test_unicode_kernel_narrow_seg_packing(width, typos):
    """Sub-lane packed (G = 128//W rows per vector) unicode buckets:
    segmented scans must keep byte-context derivation (offsets, lengths,
    n_bytes) per segment."""
    hay = [
        "",
        "é",
        "€𐍈",
        "inلux",
        "لineux",
        "LEINUX",
        "Λinux",
        "l i n u x",
        "l€i€n€u€x",
        "𐍈linux𐍈",
        "linu",
        "inux",
        "lxinu",
        "가나 linux",
        "😀lin😀ux",
    ]
    hay = [h[: width - 1] for h in hay]
    _kernel_vs_jnp(hay, "linux", typos, widths=(width,))


def test_unicode_kernel_narrow_seg_randomized():
    hay = unicode_corpus(
        "arabic", num_samples=253, median_units=24, needle="إن",
        needle_every=4, seed=29,
    )
    hay = [h[:30] for h in hay]
    for typos in (0, 1):
        _kernel_vs_jnp(hay, "إن", typos, widths=(32,))


def test_unicode_kernel_wide_bucket_trim_straddle():
    """Windows whose byte trim (start-1) lands inside a multi-byte unit's
    context, on a 256-unit bucket."""
    hay = [
        "€" * 120 + "linux" + "€" * 80,
        "a" * 199 + "لlinux",
        ("li" + "𐍈" * 50) * 2 + "nux",
    ]
    _kernel_vs_jnp(hay, "linux", 0, widths=(256,))
    _kernel_vs_jnp(hay, "linux", 1, widths=(256,))
