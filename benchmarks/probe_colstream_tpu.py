"""Compiled colstream on the real TPU: correctness vs the row-major
kernel + marginal-cost timing at benchmark shapes (linearity-checked)."""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import frizbee_tpu  # noqa: F401,E402
from frizbee_tpu.ops import colstream  # noqa: E402
from frizbee_tpu.ops.kernels import (  # noqa: E402
    DEFAULT_SCORING,
    fuzzy_match_units,
    pack_needle_scalars,
)

SUBL = colstream.SUBL
GR = SUBL * 128
rng = np.random.default_rng(0)


def pack_T(cp, nu, W):
    B = cp.shape[0]
    pad = (-B) % GR
    # int32 storage: int8 tiles are (32, 128)-native on TPU and a
    # (SUBL, 128) int8 block crashes the compiler at SUBL < 32
    cpp = np.pad(cp.astype(np.int32) & 0xFF, ((0, pad), (0, 0)))
    nup = np.pad(nu, (0, pad))
    nG = cpp.shape[0] // GR
    cpT = np.ascontiguousarray(
        cpp.reshape(nG, SUBL, 128, W).transpose(0, 3, 1, 2)
    ).reshape(nG * W, SUBL, 128)
    return jnp.asarray(cpT), jnp.asarray(nup.reshape(-1, 128)), B


def marginal(fn, *arrs, k1=2, k2=10, reps=3):
    def loop(K):
        @jax.jit
        def f(c, *arrs):
            return jax.lax.fori_loop(0, K, lambda i, c: fn(c, *arrs), c)

        np.asarray(f(jnp.int32(0), *arrs))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(jnp.int32(0), *arrs))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (loop(k2) - loop(k1)) / (k2 - k1)


def main():
    # ---- compiled correctness at a small shape -----------------------------
    for (W, n, T, nopre) in ((64, 8, 0, False), (64, 8, 0, True),
                             (64, 5, 1, False), (128, 8, 2, False)):
        B = 4 * GR
        cp = rng.integers(97, 103, (B, W)).astype(np.int8)
        nu = rng.integers(0, W + 1, B).astype(np.int32)
        cp = np.where(np.arange(W)[None, :] < nu[:, None], cp, 0
                      ).astype(np.int8)
        needle = rng.integers(97, 103, n).astype(np.int32)
        npk = jnp.asarray(np.concatenate([needle, needle - 32]))
        want = fuzzy_match_units(
            jnp.asarray(cp), jnp.asarray(nu[:, None]), npk,
            max_typos=T, no_prefilter=nopre, scoring=DEFAULT_SCORING,
            unicode=False, interpret=False,
        )
        cpT, nuT, Breal = pack_T(cp, nu, W)
        got = colstream.match_units_colstream(
            cpT, nuT, pack_needle_scalars(npk, B),
            W=W, n=n, max_typos=T, scoring=DEFAULT_SCORING,
            unicode=False, no_prefilter=nopre, interpret=False,
        )
        m = np.asarray(want[0]).astype(bool)
        ok = bool(np.array_equal(np.asarray(got[0]).astype(bool)[:Breal], m))
        for i in range(1, 5):
            w = np.where(m, np.asarray(want[i]), 0)
            g = np.where(m, np.asarray(got[i])[:Breal], 0)
            ok = ok and bool(np.array_equal(w, g))
        print(json.dumps({"check": [W, n, T, nopre], "ok": ok,
                          "matches": int(m.sum())}), flush=True)

    # ---- timing at benchmark shapes ---------------------------------------
    for W, B, n, T, nopre in (
        (128, 1048576, 8, 0, False),   # all_match_128 profile
        (128, 1048576, 8, 0, True),    # all_scores_128 profile
        (64, 1048576, 8, 2, False),    # typo_2_64 profile
    ):
        cp = rng.integers(97, 105, (B, W)).astype(np.int8)
        nu = np.full(B, W, np.int32)
        needle = rng.integers(97, 105, n).astype(np.int32)
        npk = jnp.asarray(np.concatenate([needle, needle - 32]))
        cpT, nuT, _ = pack_T(cp, nu, W)
        scal = pack_needle_scalars(npk, B)

        def run_cs(c, cpT, nuT, scal):
            out = colstream.match_units_colstream(
                cpT, nuT, scal + (c & 1),
                W=W, n=n, max_typos=T, scoring=DEFAULT_SCORING,
                unicode=False, no_prefilter=nopre, interpret=False,
            )
            return jnp.sum(out[1], dtype=jnp.int32) & 0x7FFFFFFF

        cs_ms = marginal(run_cs, cpT, nuT, scal) * 1e3

        cpd = jnp.asarray(cp)
        nud = jnp.asarray(nu[:, None])

        def run_rm(c, cpd, nud):
            m_, s_, _e, _ec, _g = fuzzy_match_units(
                cpd, nud, npk + (c & 1), max_typos=T,
                no_prefilter=nopre, scoring=DEFAULT_SCORING,
                unicode=False, interpret=False,
            )
            return jnp.sum(s_, dtype=jnp.int32) & 0x7FFFFFFF

        rm_ms = marginal(run_rm, cpd, nud) * 1e3
        print(json.dumps({
            "W": W, "B": B, "n": n, "T": T, "no_prefilter": nopre,
            "colstream_ms": cs_ms, "rowmajor_ms": rm_ms,
            "speedup": rm_ms / cs_ms,
        }), flush=True)


if __name__ == "__main__":
    main()
