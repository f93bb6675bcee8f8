"""Pure-Python reference semantics ("the oracle").

This package is the executable specification the TPU kernels are
property-tested against, mirroring the reference's scalar backends and
test oracles (reference: src/smith_waterman/backend/scalar.rs,
src/prefilter/mod.rs:895-1047).

Canonical semantics note: the reference's SIMD log-shift gap cascade and
prefilter windows are lane-count dependent in rare corner cases (its own
parity suite tests each backend against a *lane-matched* scalar oracle).
This build canonicalizes to the sequential (lane-count independent)
semantics — equivalent to the reference's single-chunk / scalar behavior —
and pins them with the reference's arithmetic unit tests, which are
lane-independent.
"""

from .tokenize import HayUnits, NeedleUnits, make_needle_units, tokenize
from .smith_waterman import sw_score, sw_indices, match_end_col
from .greedy import match_greedy
from .prefilter import prefilter_window, lcs_accepts
from .literal import literal_find

__all__ = [
    "HayUnits",
    "NeedleUnits",
    "make_needle_units",
    "tokenize",
    "sw_score",
    "sw_indices",
    "match_end_col",
    "match_greedy",
    "prefilter_window",
    "lcs_accepts",
    "literal_find",
]
