"""frizbee-tpu: a TPU-native batched fuzzy-matching / alignment engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference Rust library saghen/frizbee: Smith-Waterman local alignment with
affine gaps, bitmask-equivalent prefiltering with typo tolerance, literal
matching modes, multi-pattern queries, Unicode matching, and deterministic
sorted/merged results — scored thousands of haystacks at a time on TPU
vector units, sharded data-parallel across device meshes.
"""

import os as _os

from .config import (
    CaseMatching,
    Config,
    Matching,
    Scoring,
    SortStrategy,
    UnicodeMatching,
)
from .pattern import Pattern, PatternConfig
from .types import Match, MatchIndices, MatchList

__version__ = "0.1.0"


def _host_fingerprint() -> str:
    """Short CPU-feature fingerprint: persistent-cache artifacts for the
    CPU backend are micro-arch-specific (loading one on a different host
    can SIGILL), so the cache directory is keyed per host class. Shared
    with the native .so cache (one definition of "host class")."""
    from .native import _host_tag

    return _host_tag()


def _enable_compilation_cache():
    """Persist compiled XLA/Mosaic executables across processes. Kernel
    compiles can take minutes on remote-compile TPU setups; the cache makes
    every process after the first start in seconds. Opt out with
    FRIZBEE_TPU_NO_CACHE=1 or point FRIZBEE_TPU_CACHE_DIR elsewhere."""
    if _os.environ.get("FRIZBEE_TPU_NO_CACHE") == "1":
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                _os.environ.get(
                    "FRIZBEE_TPU_CACHE_DIR",
                    _os.path.expanduser(
                        f"~/.cache/frizbee_tpu_xla_{_host_fingerprint()}"
                    ),
                ),
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:
        pass


_enable_compilation_cache()

__all__ = [
    "CaseMatching",
    "Config",
    "Match",
    "MatchIndices",
    "MatchList",
    "Matcher",
    "Matching",
    "Pattern",
    "PatternConfig",
    "Scoring",
    "SortStrategy",
    "UnicodeMatching",
    "fuzzy_match",
    "fuzzy_match_indices",
    "match_arrays_batch",
    "match_list",
    "match_topk_batch",
    "match_topk_batch_async",
    "match_topk_batch_sharded",
    "match_list_indices",
    "match_list_parallel",
    "sort_matches",
]

_MATCHER_EXPORTS = (
    "Matcher", "match_list", "match_list_indices", "match_list_parallel",
    "match_arrays_batch", "match_topk_batch", "match_topk_batch_async",
    "fuzzy_match", "fuzzy_match_indices",
)


def __getattr__(name):
    # Lazy imports keep `import frizbee_tpu` light for config/pattern-only
    # uses
    if name in _MATCHER_EXPORTS:
        from . import matcher as _m

        return getattr(_m, name)
    if name == "sort_matches":
        from .sort import sort_matches

        return sort_matches
    if name == "match_topk_batch_sharded":
        from .parallel import match_topk_batch_sharded

        return match_topk_batch_sharded
    raise AttributeError(f"module 'frizbee_tpu' has no attribute {name!r}")
