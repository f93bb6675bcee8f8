"""Second-level bisect of the prefilter window tracking."""
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import frizbee_tpu  # noqa: F401,E402
from frizbee_tpu.ops import colstream  # noqa: E402
from frizbee_tpu.ops.kernels import pack_needle_scalars  # noqa: E402

SUBL = colstream.SUBL
GR = SUBL * 128
W, n = 64, 8
B = 2 * GR
rng = np.random.default_rng(0)
cp = (rng.integers(97, 103, (B, W)).astype(np.int32))
nu = rng.integers(0, W + 1, B).astype(np.int32)
nG = B // GR
cpT = jnp.asarray(np.ascontiguousarray(
    cp.reshape(nG, SUBL, 128, W).transpose(0, 3, 1, 2)
).reshape(nG * W, SUBL, 128))
nuT = jnp.asarray(nu.reshape(-1, 128))
needle = rng.integers(97, 103, n).astype(np.int32)
scal = pack_needle_scalars(
    jnp.asarray(np.concatenate([needle, needle - 32])), B)


def run(kernel, n_out=5):
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nG,),
            in_specs=[
                pl.BlockSpec((W, SUBL, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUBL, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((SUBL, 128), lambda i, *_: (i, 0))
                       for _ in range(n_out)],
        ),
        out_shape=[jax.ShapeDtypeStruct((nG * SUBL, 128), jnp.int32)
                   for _ in range(n_out)],
        interpret=False,
    )(scal, cpT, nuT)
    return [np.asarray(o) for o in out]


def make_stage(track_fstart, track_tail, out_carries):
    def kern(scal_ref, cpT_ref, nu_ref, *outs):
        nuv = nu_ref[...]
        z = jnp.zeros((SUBL, 128), jnp.int32)

        def pf_body(j, c):
            (np_, nb, boff, fstart, ffound, e_u, e_found) = c
            hay = cpT_ref[j]
            valid = nuv > j
            blen = valid.astype(jnp.int32)
            hit0 = occ_last = None
            for k in range(n):
                occ_k = valid & (
                    (hay == scal_ref[2 + k]) | (hay == scal_ref[2 + 64 + k])
                )
                if k == 0:
                    hit0 = occ_k
                if k == n - 1:
                    occ_last = occ_k
            if track_fstart:
                fstart = jnp.where((ffound > 0) | ~hit0, fstart, boff)
                ffound = ffound | hit0.astype(jnp.int32)
            np2 = np_ + hit0.astype(jnp.int32)
            if track_tail:
                done = np2 >= n
                tail = occ_last & done
                e_u = jnp.where(tail, boff + blen, e_u)
                e_found = e_found | tail.astype(jnp.int32)
            return (np2, nb + blen, boff + blen, fstart, ffound,
                    e_u, e_found)

        out = jax.lax.fori_loop(0, W, pf_body, (z, z, z, z, z, z, z))
        if out_carries:
            cols = ((out[0] >= n).astype(jnp.int32), out[1], out[3],
                    out[5], out[6])
        else:
            cols = ((out[0] >= n).astype(jnp.int32), out[1], z, z, z)
        for o, c in zip(outs, cols):
            o[...] = c

    return kern


def main():
    cases = [
        ("fstart_only_outz", make_stage(True, False, False)),
        ("tail_only_outz", make_stage(False, True, False)),
        ("both_outz", make_stage(True, True, False)),
        ("none_outcarries", make_stage(False, False, True)),
        ("both_outcarries", make_stage(True, True, True)),
    ]
    for name, kern in cases:
        try:
            run(kern)
            print(json.dumps({"stage": name, "ok": True}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"stage": name, "ok": False,
                              "err": repr(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
