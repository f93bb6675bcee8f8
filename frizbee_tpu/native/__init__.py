"""Native (C++) runtime components, loaded via ctypes.

Builds on first use with the system toolchain into a cache directory; the
NumPy implementations remain as fallbacks and as the differential-testing
oracles, so a missing compiler only costs packing speed, never correctness.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "packer.cpp")


def _host_tag() -> str:
    """The .so is built with -march=native; key the cache per host class
    so a shared/migrated cache dir never loads a mismatched binary
    (SIGILL on first pack)."""
    import hashlib
    import platform

    parts = [platform.machine(), platform.processor()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:10]


_CACHE = os.environ.get(
    "FRIZBEE_TPU_NATIVE_DIR",
    os.path.expanduser(f"~/.cache/frizbee_tpu_native_{_host_tag()}"),
)
_LOCK = threading.Lock()
_lib = None
_tried = False

_FASTMATCH_SRC = os.path.join(os.path.dirname(__file__), "fastmatch.c")
_fastmatch = None
_fastmatch_tried = False


def get_fastmatch():
    """The fastmatch CPython extension (C ``Match`` type + bulk list
    builder — see fastmatch.c), or None when disabled
    (FRIZBEE_TPU_NO_NATIVE=1) or unbuildable; types.py keeps the
    dataclass as the fallback and the behavioral oracle."""
    global _fastmatch, _fastmatch_tried
    if os.environ.get("FRIZBEE_TPU_NO_NATIVE") == "1":
        return None
    if _fastmatch_tried:
        return _fastmatch
    with _LOCK:
        if _fastmatch_tried:
            return _fastmatch
        try:
            import importlib.util
            import sys
            import sysconfig

            tag = sysconfig.get_config_var("SOABI") or "py3"
            inc = sysconfig.get_paths()["include"]
            so = _compile_cached(
                _FASTMATCH_SRC, f"fastmatch.{tag}.so",
                ["gcc", "-O2", "-shared", "-fPIC", f"-I{inc}"],
            )
            if so is None:
                raise RuntimeError("fastmatch build failed")
            spec = importlib.util.spec_from_file_location(
                "frizbee_tpu.native.fastmatch", so
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            # register under the canonical name so pickled Match
            # instances (Match.__reduce__ references the class by
            # module path) resolve in fresh processes
            sys.modules["frizbee_tpu.native.fastmatch"] = mod
            _fastmatch = mod
        except Exception:
            _fastmatch = None
        _fastmatch_tried = True
        return _fastmatch


def _compile_cached(src: str, out_name: str, cmd_head) -> Optional[str]:
    """Shared compile-once protocol for the native components: mtime
    staleness check against ``src``, build to a PER-PID temp name (xdist
    workers on a cold cache all compile concurrently — a shared .tmp
    interleaves writes and os.replace could install a corrupt .so with
    a fresh mtime, silently disabling the native path until the cache
    dir is wiped), then one atomic os.replace."""
    os.makedirs(_CACHE, exist_ok=True)
    so = os.path.join(_CACHE, out_name)
    src_mtime = os.path.getmtime(src)
    if os.path.exists(so) and os.path.getmtime(so) >= src_mtime:
        return so
    tmp = f"{so}.tmp{os.getpid()}"
    cmd = list(cmd_head) + [src, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
        return so
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _build() -> Optional[str]:
    return _compile_cached(
        _SRC, "packer.so",
        ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC"],
    )


def get_lib():
    """The loaded native library, or None when unavailable (or disabled
    via FRIZBEE_TPU_NO_NATIVE=1 — every caller has a NumPy fallback)."""
    global _lib, _tried
    if os.environ.get("FRIZBEE_TPU_NO_NATIVE") == "1":
        return None
    if _tried:
        return _lib
    with _LOCK:
        if _tried:
            return _lib
        so = _build()
        if so is not None:
            try:
                lib = ctypes.CDLL(so)
                i64p = ctypes.POINTER(ctypes.c_int64)
                lib.pack_rows_u8.argtypes = [
                    ctypes.c_char_p, i64p, i64p, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_void_p,
                ]
                lib.pack_rows_u32.argtypes = [
                    ctypes.c_void_p, i64p, i64p, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ]
                lib.utf8_lengths.argtypes = [
                    ctypes.c_void_p, i64p, ctypes.c_int64, i64p,
                ]
                lib.sw_indices_batch.argtypes = (
                    [ctypes.c_void_p] * 8
                    + [ctypes.c_int64, ctypes.c_int64]
                    + [ctypes.c_void_p] * 2
                    + [ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
                    + [ctypes.c_void_p] * 3
                    + [ctypes.c_int64]
                )
                lib.host_match_batch.argtypes = (
                    [ctypes.c_char_p, i64p, i64p, ctypes.c_int64]
                    + [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
                    + [ctypes.c_void_p]
                    + [ctypes.c_int64] * 3
                    + [ctypes.c_char_p, ctypes.c_int64]
                    + [ctypes.c_void_p] * 4
                    + [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
                )
                lib.host_match_batch_u32.argtypes = (
                    [ctypes.c_char_p, i64p, ctypes.c_void_p, i64p, i64p,
                     ctypes.c_int64]
                    + [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64] * 2
                    + [ctypes.c_void_p]
                    + [ctypes.c_int64] * 3
                    + [ctypes.c_char_p, ctypes.c_int64]
                    + [ctypes.c_void_p] * 4
                    + [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
                )
                lib.host_literal_batch.argtypes = (
                    [ctypes.c_char_p, i64p, i64p, ctypes.c_int64]
                    + [ctypes.c_char_p, i64p, ctypes.c_char_p, i64p]
                    + [ctypes.c_int64, ctypes.c_int64]
                    + [ctypes.c_void_p, ctypes.c_int64]
                    + [ctypes.c_void_p] * 3
                )
                _lib = lib
            except Exception:
                _lib = None
        _tried = True
        return _lib


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def pack_rows_u8(joined: bytes, starts: np.ndarray, rows: np.ndarray,
                 width: int) -> Optional[np.ndarray]:
    """(len(rows), width) int8 zero-padded byte matrix, or None."""
    lib = get_lib()
    if lib is None:
        return None
    starts = np.ascontiguousarray(starts, np.int64)
    rows = np.ascontiguousarray(rows, np.int64)
    out = np.empty((len(rows), width), np.int8)
    lib.pack_rows_u8(
        joined, _i64p(starts), _i64p(rows),
        ctypes.c_int64(len(rows)), ctypes.c_int64(width),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def pack_rows_u32(joined_u32: np.ndarray, starts: np.ndarray,
                  rows: np.ndarray, width: int):
    """(cp, first, prev, boff, blen) int32 matrices, or None."""
    lib = get_lib()
    if lib is None:
        return None
    starts = np.ascontiguousarray(starts, np.int64)
    rows = np.ascontiguousarray(rows, np.int64)
    joined_u32 = np.ascontiguousarray(joined_u32, np.uint32)
    b = len(rows)
    outs = [np.empty((b, width), np.int32) for _ in range(5)]
    lib.pack_rows_u32(
        joined_u32.ctypes.data_as(ctypes.c_void_p),
        _i64p(starts), _i64p(rows),
        ctypes.c_int64(b), ctypes.c_int64(width),
        *[o.ctypes.data_as(ctypes.c_void_p) for o in outs],
    )
    return tuple(outs)


def sw_indices_batch(
    cp: np.ndarray, first: np.ndarray, prev: np.ndarray,
    boff: np.ndarray, blen: np.ndarray,
    su: np.ndarray, eu: np.ndarray, inc_prefix: np.ndarray,
    orig: np.ndarray, flip: np.ndarray,
    scoring9: np.ndarray, max_typos: Optional[int],
):
    """Batched per-row DP fill + traceback walk (score, reversed matched
    byte offsets). Returns (score (R,), cnt (R,), idx (R, 4n)) int32, or
    None when the native library is unavailable. Semantics contract:
    oracle/smith_waterman.sw_indices; NumPy twin: traceback.sw_fill +
    walk_indices."""
    lib = get_lib()
    if lib is None:
        return None
    R, W = cp.shape
    n = len(orig)
    cap = max(4 * n, 1)

    def c32(a):
        return np.ascontiguousarray(a, np.int32)

    cp, first, prev, boff, blen = map(c32, (cp, first, prev, boff, blen))
    su, eu = c32(su), c32(eu)
    inc = np.ascontiguousarray(inc_prefix, np.uint8)
    orig, flip = c32(orig), c32(flip)
    sc = c32(scoring9)
    score = np.empty(R, np.int32)
    cnt = np.empty(R, np.int32)
    idx = np.empty((R, cap), np.int32)

    def vp(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    lib.sw_indices_batch(
        vp(cp), vp(first), vp(prev), vp(boff), vp(blen),
        vp(su), vp(eu), vp(inc),
        ctypes.c_int64(R), ctypes.c_int64(W),
        vp(orig), vp(flip), ctypes.c_int64(n),
        vp(sc), ctypes.c_int64(-1 if max_typos is None else int(max_typos)),
        vp(score), vp(cnt), vp(idx), ctypes.c_int64(cap),
    )
    return score, cnt, idx


def host_match_batch(
    joined: bytes, starts: np.ndarray,
    orig: np.ndarray, flip: np.ndarray,
    scoring9: np.ndarray, max_typos: Optional[int],
    dp_cap: int, min_len: int, needle_bytes: bytes,
    rows: Optional[np.ndarray] = None,
    indices_cap: int = 0,
):
    """Batched byte-unit host pipeline (length gate -> prefilter window ->
    greedy or full SW with exact bonus) over ragged rows. ``rows``
    selects a subset (result slot r scores row rows[r]) so resident
    encoded blobs serve per-query candidate sets without re-encoding.
    Returns (matched (R,) bool, score (R,), exact (R,) bool, end_col (R,))
    — plus (idx (R, indices_cap), icnt (R,)) reversed matched byte
    offsets when ``indices_cap`` > 0 — or None when the native library
    is unavailable. Semantics contract: engine._host_pipeline /
    engine.match_one_indices per row (the per-row Python fallback every
    caller keeps is the differential oracle)."""
    lib = get_lib()
    if lib is None:
        return None
    starts = np.ascontiguousarray(starts, np.int64)
    R = len(starts) - 1 if rows is None else len(rows)
    if rows is not None:
        rows = np.ascontiguousarray(rows, np.int64)
    orig = np.ascontiguousarray(orig, np.int32)
    flip = np.ascontiguousarray(flip, np.int32)
    sc = np.ascontiguousarray(scoring9, np.int32)
    n = len(orig)
    matched = np.empty(R, np.uint8)
    score = np.empty(R, np.int32)
    exact = np.empty(R, np.uint8)
    end_col = np.empty(R, np.int32)
    idx = icnt = None
    if indices_cap:
        idx = np.empty((R, indices_cap), np.int32)
        icnt = np.empty(R, np.int32)

    def vp(a):
        return (
            a.ctypes.data_as(ctypes.c_void_p) if a is not None else None
        )

    lib.host_match_batch(
        joined, _i64p(starts),
        None if rows is None else _i64p(rows),
        ctypes.c_int64(R),
        vp(orig), vp(flip), ctypes.c_int64(n),
        vp(sc),
        ctypes.c_int64(-1 if max_typos is None else int(max_typos)),
        ctypes.c_int64(dp_cap), ctypes.c_int64(min_len),
        needle_bytes, ctypes.c_int64(len(needle_bytes)),
        vp(matched), vp(score), vp(exact), vp(end_col),
        vp(idx), vp(icnt), ctypes.c_int64(indices_cap),
    )
    out = (matched.astype(bool), score, exact.astype(bool), end_col)
    return out + (idx, icnt) if indices_cap else out


_LITERAL_MODES = {"exact": 0, "prefix": 1, "suffix": 2, "substring": 3}


def host_literal_batch(
    joined: bytes, starts: np.ndarray,
    unit_pairs,  # [(orig_bytes, flip_bytes)] per needle unit
    mode: str,
    scoring9: np.ndarray, needle_len: int,
    rows: Optional[np.ndarray] = None,
):
    """Batched literal matcher over ragged byte rows: (matched (R,) bool,
    score (R,) i32, pos (R,) i32 byte offsets), or None when the native
    library is unavailable. Semantics contract: oracle/literal.py
    literal_find per row (the per-row fallback callers keep is the
    differential oracle). ``unit_pairs`` is oracle.literal's
    _needle_variants output — per-unit (orig, flip) byte strings."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "host_literal_batch"):
        return None
    starts = np.ascontiguousarray(starts, np.int64)
    R = len(starts) - 1 if rows is None else len(rows)
    if rows is not None:
        rows = np.ascontiguousarray(rows, np.int64)
    obytes = b"".join(o for o, _ in unit_pairs)
    fbytes = b"".join(f for _, f in unit_pairs)
    ostarts = np.zeros(len(unit_pairs) + 1, np.int64)
    np.cumsum([len(o) for o, _ in unit_pairs], out=ostarts[1:])
    fstarts = np.zeros(len(unit_pairs) + 1, np.int64)
    np.cumsum([len(f) for _, f in unit_pairs], out=fstarts[1:])
    sc = np.ascontiguousarray(scoring9, np.int32)
    matched = np.empty(R, np.uint8)
    score = np.empty(R, np.int32)
    pos = np.empty(R, np.int32)

    def vp(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    lib.host_literal_batch(
        joined, _i64p(starts),
        None if rows is None else _i64p(rows),
        ctypes.c_int64(R),
        obytes, _i64p(ostarts), fbytes, _i64p(fstarts),
        ctypes.c_int64(len(unit_pairs)),
        ctypes.c_int64(_LITERAL_MODES[mode]),
        vp(sc), ctypes.c_int64(needle_len),
        vp(matched), vp(score), vp(pos),
    )
    return matched.astype(bool), score, pos


def host_match_batch_u32(
    joined: bytes, bstarts: np.ndarray,
    joined_u32: np.ndarray, ustarts: np.ndarray,
    orig: np.ndarray, flip: np.ndarray,
    orig_b: np.ndarray, flip_b: np.ndarray,
    scoring9: np.ndarray, max_typos: Optional[int],
    dp_cap: int, min_len: int, needle_bytes: bytes,
    rows: Optional[np.ndarray] = None,
    indices_cap: int = 0,
):
    """Unicode twin of ``host_match_batch``: codepoint units (+ in-pass
    UTF-8 byte context) for the prefilter/SW, raw bytes + byte-level
    needle pairs for the greedy fallback — the oracle's exact split."""
    lib = get_lib()
    if lib is None:
        return None
    bstarts = np.ascontiguousarray(bstarts, np.int64)
    ustarts = np.ascontiguousarray(ustarts, np.int64)
    joined_u32 = np.ascontiguousarray(joined_u32, np.uint32)
    R = len(bstarts) - 1 if rows is None else len(rows)
    if rows is not None:
        rows = np.ascontiguousarray(rows, np.int64)

    def c32(a):
        return np.ascontiguousarray(a, np.int32)

    orig, flip, orig_b, flip_b = map(c32, (orig, flip, orig_b, flip_b))
    sc = c32(scoring9)
    matched = np.empty(R, np.uint8)
    score = np.empty(R, np.int32)
    exact = np.empty(R, np.uint8)
    end_col = np.empty(R, np.int32)
    idx = icnt = None
    if indices_cap:
        idx = np.empty((R, indices_cap), np.int32)
        icnt = np.empty(R, np.int32)

    def vp(a):
        return (
            a.ctypes.data_as(ctypes.c_void_p) if a is not None else None
        )

    lib.host_match_batch_u32(
        joined, _i64p(bstarts),
        joined_u32.ctypes.data_as(ctypes.c_void_p), _i64p(ustarts),
        None if rows is None else _i64p(rows),
        ctypes.c_int64(R),
        vp(orig), vp(flip), ctypes.c_int64(len(orig)),
        vp(orig_b), vp(flip_b), ctypes.c_int64(len(orig_b)),
        vp(sc),
        ctypes.c_int64(-1 if max_typos is None else int(max_typos)),
        ctypes.c_int64(dp_cap), ctypes.c_int64(min_len),
        needle_bytes, ctypes.c_int64(len(needle_bytes)),
        vp(matched), vp(score), vp(exact), vp(end_col),
        vp(idx), vp(icnt), ctypes.c_int64(indices_cap),
    )
    out = (matched.astype(bool), score, exact.astype(bool), end_col)
    return out + (idx, icnt) if indices_cap else out


def utf8_lengths(joined_u32: np.ndarray, starts: np.ndarray
                 ) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    starts = np.ascontiguousarray(starts, np.int64)
    joined_u32 = np.ascontiguousarray(joined_u32, np.uint32)
    n = len(starts) - 1
    out = np.empty(n, np.int64)
    lib.utf8_lengths(
        joined_u32.ctypes.data_as(ctypes.c_void_p), _i64p(starts),
        ctypes.c_int64(n), _i64p(out),
    )
    return out
