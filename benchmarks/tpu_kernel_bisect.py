"""Bisect Mosaic compile failures of ops/kernels.match_units on the real
TPU. Runs the raw kernel (no stage-1/caps) at a small grid with variants."""

import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from frizbee_tpu.ops.kernels import match_units, pack_needle_scalars

    rng = np.random.default_rng(0)
    B, W = 4096, 128
    cp = jnp.asarray(rng.integers(97, 123, (B, W), dtype=np.int8))
    nu = jnp.asarray(
        rng.integers(8, W + 1, (B, 1), dtype=np.int32)
    )
    needle = np.frombuffer(b"deadbeef", dtype=np.uint8).astype(np.int32)
    packed = jnp.asarray(np.concatenate([needle, needle]))
    scalars = pack_needle_scalars(packed, B)

    variants = sys.argv[1:] or ["i32", "i16", "i32_nopre"]
    for v in variants:
        kw = dict(max_typos=0, unicode=False, no_prefilter=False,
                  int16_lanes=False, interpret=False)
        if v == "i16":
            kw["int16_lanes"] = True
        if v == "i32_nopre":
            kw["no_prefilter"] = True
        try:
            out = match_units(cp, nu, scalars, **kw)
            print(f"OK {v}: out sum {int(np.asarray(out[:, 0]).sum())}",
                  flush=True)
        except Exception:
            tb = traceback.format_exc()
            print(f"FAIL {v}:\n{tb[-3000:]}", flush=True)


if __name__ == "__main__":
    main()
