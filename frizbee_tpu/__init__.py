"""frizbee-tpu: a TPU-native batched fuzzy-matching / alignment engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference Rust library saghen/frizbee: Smith-Waterman local alignment with
affine gaps, bitmask-equivalent prefiltering with typo tolerance, literal
matching modes, multi-pattern queries, Unicode matching, and deterministic
sorted/merged results — scored thousands of haystacks at a time on TPU
vector units, sharded data-parallel across device meshes.
"""

from .config import (
    CaseMatching,
    Config,
    Matching,
    Scoring,
    SortStrategy,
    UnicodeMatching,
)
from .pattern import Pattern, PatternConfig
from .types import Match, MatchIndices

__version__ = "0.1.0"

__all__ = [
    "CaseMatching",
    "Config",
    "Match",
    "MatchIndices",
    "Matcher",
    "Matching",
    "Pattern",
    "PatternConfig",
    "Scoring",
    "SortStrategy",
    "UnicodeMatching",
    "match_list",
    "match_list_indices",
    "match_list_parallel",
]


def __getattr__(name):
    # Lazy imports keep `import frizbee_tpu` light (no jax import) for
    # config/pattern-only uses
    if name in ("Matcher", "match_list", "match_list_indices", "match_list_parallel"):
        from . import matcher as _m

        return getattr(_m, name)
    raise AttributeError(f"module 'frizbee_tpu' has no attribute {name!r}")
