"""C extension Match (native/fastmatch.c) vs the dataclass oracle.

The module-level ``Match`` rebinds to the C type when it builds; these
tests pin every behavior the package and its consumers rely on —
construction (positional/kw/defaults), mutation, equality, ordering,
repr, serde, from_index — against types.PY_MATCH, plus the bulk
build_matches constructor and its MatchList/iterator integration.
"""

import numpy as np
import pytest

from frizbee_tpu import types
from frizbee_tpu.native import get_fastmatch

fm = get_fastmatch()
pytestmark = pytest.mark.skipif(
    fm is None, reason="fastmatch extension unavailable"
)


def both(*args, **kw):
    return fm.Match(*args, **kw), types.PY_MATCH(*args, **kw)


def test_construction_and_fields():
    for args, kw in [
        ((), {}),
        ((5,), {}),
        ((5, 2), {}),
        ((5, 2, True), {}),
        ((5, 2, True, 9), {}),
        ((), dict(score=7, index=3, exact=True, end_col=1)),
        ((7,), dict(index=3)),
    ]:
        c, p = both(*args, **kw)
        assert c.score == p.score
        assert c.index == p.index
        assert c.exact == p.exact and isinstance(c.exact, bool)
        assert c.end_col == p.end_col


def test_repr_matches_dataclass():
    c, p = both(score=37, index=4, exact=True, end_col=11)
    assert repr(c) == repr(p)
    c2, p2 = both()
    assert repr(c2) == repr(p2)


def test_mutation():
    c, p = both(score=1, index=2)
    for m in (c, p):
        m.score = 9
        m.exact = True
        m.end_col = 5
    assert c.score == p.score == 9
    assert c.exact is True
    assert c.end_col == p.end_col == 5


def test_equality_and_ordering():
    assert fm.Match(1, 2, True, 3) == fm.Match(1, 2, True, 3)
    assert fm.Match(1, 2) != fm.Match(1, 3)
    assert fm.Match(1, 2, True) != fm.Match(1, 2, False)
    # (score desc, index asc) — the dataclass __lt__ contract
    ms = [fm.Match(1, 5), fm.Match(3, 1), fm.Match(3, 0)]
    ps = [types.PY_MATCH(1, 5), types.PY_MATCH(3, 1), types.PY_MATCH(3, 0)]
    assert [(m.score, m.index) for m in sorted(ms)] == [
        (m.score, m.index) for m in sorted(ps)
    ]
    assert (fm.Match(1, 2) < fm.Match(1, 3)) == (
        types.PY_MATCH(1, 2) < types.PY_MATCH(1, 3)
    )


def test_serde_and_classmethods():
    c, p = both(score=37, index=4, exact=True, end_col=11)
    assert c.to_dict() == p.to_dict()
    assert fm.Match.from_dict(p.to_dict()) == c
    assert fm.Match.from_dict({"score": 1, "index": 2}) == fm.Match(1, 2)
    assert c.sort_key() == p.sort_key()
    ci = fm.Match.from_index(6)
    pi = types.PY_MATCH.from_index(6)
    assert (ci.score, ci.index, ci.exact, ci.end_col) == (
        pi.score, pi.index, pi.exact, pi.end_col
    )


def test_pickle_copy_roundtrip():
    """The dataclass round-tripped through pickle/copy before the C
    type existed; the C type must too (advisor round-5 finding)."""
    import copy
    import pickle

    m = fm.Match(score=9, index=4, exact=True, end_col=2)
    assert pickle.loads(pickle.dumps(m)) == m
    assert copy.copy(m) == m
    assert copy.deepcopy(m) == m
    # subprocess unpickling: class-by-name must resolve in a FRESH
    # process (sys.modules registration in native/__init__)
    import subprocess
    import sys

    blob = pickle.dumps(m).hex()
    out = subprocess.run(
        [sys.executable, "-c",
         "import pickle,sys;"
         f"m=pickle.loads(bytes.fromhex('{blob}'));"
         "print(m.score, m.index, m.exact, m.end_col)"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert out.stdout.strip() == "9 4 True 2", out.stderr[-500:]
    # ... including in a NO-NATIVE consumer (no toolchain / worker ->
    # client shipping): the pickle references the stable types-module
    # factory, so it unpickles into the dataclass there
    import os

    env = dict(os.environ, FRIZBEE_TPU_NO_NATIVE="1")
    out = subprocess.run(
        [sys.executable, "-c",
         "import pickle;"
         f"m=pickle.loads(bytes.fromhex('{blob}'));"
         "import frizbee_tpu.types as t;"
         "print(type(m) is t.PY_MATCH, m.score, m.exact)"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
        env=env,
    )
    assert out.stdout.strip() == "True 9 True", out.stderr[-500:]


def test_lenient_assignment_and_coercion():
    """Mutation and from_dict must accept the same inputs the dataclass
    accepts: numpy bools/ints for exact, floats in from_dict
    (advisor round-5 finding)."""
    c, p = both(score=1, index=2)
    for m in (c, p):
        m.exact = np.True_
        assert m.exact is True or m.exact == True  # noqa: E712
        m.exact = 0
        assert not m.exact
    c.exact = np.bool_(True)
    assert c.exact is True
    got = fm.Match.from_dict({"score": 1.0, "index": 2, "exact": 1})
    want = types.PY_MATCH.from_dict({"score": 1.0, "index": 2, "exact": 1})
    assert (got.score, got.index, got.exact) == (
        want.score, want.index, want.exact
    )


def test_build_matches_bulk():
    idx = np.array([3, 1, 2], np.int64)
    sc = np.array([10, 0, 65535], np.int64)
    ex = np.array([1, 0, 1], np.uint8)
    ec = np.array([7, 0, 16383], np.int64)
    out = fm.build_matches(idx, sc, ex, ec)
    assert out == [
        fm.Match(10, 3, True, 7),
        fm.Match(0, 1, False, 0),
        fm.Match(65535, 2, True, 16383),
    ]
    assert out[0].exact is True and out[1].exact is False
    # length mismatch raises instead of reading out of bounds
    with pytest.raises(ValueError):
        fm.build_matches(idx, sc[:2], ex, ec)


def test_matchlist_iter_parity():
    idx = np.array([4, 0, 2], np.int64)
    sc = np.array([9, 9, 1], np.int64)
    ex = np.array([False, True, False])
    ec = np.array([3, 1, 0], np.int64)
    ml = types.MatchList(idx, sc, ex, ec)
    got = list(ml)
    assert [(m.index, m.score, m.exact, m.end_col) for m in got] == [
        (4, 9, False, 3), (0, 9, True, 1), (2, 1, False, 0),
    ]
    assert got == [ml[0], ml[1], ml[2]]


def test_match_iter_yields_c_matches():
    from frizbee_tpu.matcher import Matcher

    hay = ["deadbeef", "dead", "nope", "DeadBeef"]
    out = list(Matcher("dead").match_iter(hay))
    ref = Matcher("dead", use_device=False)
    assert [(m.index, m.score) for m in out] == sorted(
        (m.index, m.score) for m in ref.match_list(hay)
    )
    assert all(type(m) is types.Match for m in out)
