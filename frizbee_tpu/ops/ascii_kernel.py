"""Compatibility shim: the unit-generic kernels moved to ops/kernels.py."""

from .kernels import *  # noqa: F401,F403
from .kernels import (  # noqa: F401
    DEFAULT_SCORING,
    MAX_KERNEL_NEEDLE,
    fuzzy_match_ascii,
    fuzzy_match_units,
    prefilter_ascii,
    prefilter_units,
    sw_ascii,
    sw_units,
)
