"""Device-mesh parallel matching: shard the corpus, merge top-k globally.

TPU-native counterpart of the reference's thread-parallel path
(reference: src/matcher/parallel.rs:18-89): there, 2048-item chunks are
work-stolen by threads, each locally sorted, then k-way merged. Here the
packed corpus rows are sharded over a 1-D ``jax.sharding.Mesh`` axis with
``shard_map``; each device runs the fused prefilter+DP pipeline on its rows,
sorts locally by the global order key, keeps top-k, and the shards merge via
an ``all_gather`` over ICI followed by a replicated merge sort. Because the
merge key includes the unique global index, the result is the unique total
order — identical to the sequential output (the reference pins this as the
parallel==sequential property, tests/api_properties.rs:79-114).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .ops.batch import order_keys as _order_keys
from .ops.fuzzy import fuzzy_pipeline

DATA_AXIS = "data"

# Sentinel index for padding rows; sorts after every real index
PAD_INDEX = jnp.iinfo(jnp.int32).max


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return jax.make_mesh((n_devices,), (DATA_AXIS,), devices=devs[:n_devices])


def initialize_distributed(**kwargs) -> Mesh:
    """Multi-host setup: join the JAX coordination service and return a
    global 1-D mesh over every chip in the pod slice.

    Call once per host process before building corpora::

        mesh = initialize_distributed(coordinator_address="host0:1234",
                                      num_processes=4, process_id=rank)

    With no kwargs, jax.distributed.initialize autodetects the environment
    (TPU pod metadata / cluster envvars). Smoke-tested at 2 CPU processes
    (tests/test_multihost.py: coordination service + global mesh + one
    collective). The collectives in ``sharded_match_topk`` ride ICI within
    a slice and DCN across slices and keep the deterministic
    (score, index) total order; note that feeding a multi-controller mesh
    additionally requires per-process corpus loading
    (``jax.make_array_from_process_local_data`` instead of
    ``match_corpus_sharded``'s single-controller ``device_put``).
    """
    jax.distributed.initialize(**kwargs)
    return make_mesh()


# _order_keys (imported above from ops/batch.order_keys): (primary,
# secondary) ascending-sort keys realizing (matched first, score desc,
# index asc) — shared with the batch path's wide result keys so the two
# orders can never diverge; the unmatched sentinel INT32_MAX == PAD_INDEX


def _local_match_topk(
    cp, first_byte, prev_last_byte, byte_off, byte_len, n_units, n_bytes,
    row_index, needle_orig, needle_flip, sc, *, max_typos, no_prefilter, k,
):
    """Per-shard pipeline: match rows -> sort by global key -> top-k."""
    matched, score, exact, end_col, needs_greedy, _ws, _we = fuzzy_pipeline(
        cp, first_byte, prev_last_byte, byte_off, byte_len, n_units, n_bytes,
        needle_orig, needle_flip, sc,
        max_typos=max_typos, no_prefilter=no_prefilter,
    )
    # Padding rows carry row_index == PAD_INDEX already; mask them out
    matched = matched & (row_index != PAD_INDEX)
    key1, key2 = _order_keys(matched, score, row_index)
    # exact and needs_greedy share one operand through the sort + gather:
    # greedy rows must reach the host for rescoring (their device score is
    # a window-capped approximation), so the flag can't be dropped here
    aux = (exact.astype(jnp.int32) << 1) | needs_greedy.astype(jnp.int32)
    key1, key2, score, aux, end_col = jax.lax.sort(
        (key1, key2, score, aux, end_col), num_keys=2, is_stable=False
    )
    k = min(k, key1.shape[0])
    return key1[:k], key2[:k], score[:k], aux[:k], end_col[:k]


def _merge_topk(key1, key2, score, aux, end_col, k):
    """Merge gathered per-shard sorted runs into the global top-k."""
    key1, key2, score, aux, end_col = jax.lax.sort(
        (key1.ravel(), key2.ravel(), score.ravel(), aux.ravel(),
         end_col.ravel()),
        num_keys=2,
        is_stable=False,
    )
    k = min(k, key1.shape[0])
    matched = key2[:k] != PAD_INDEX
    return (
        matched, key2[:k], score[:k], (aux[:k] >> 1).astype(jnp.bool_),
        end_col[:k], (aux[:k] & 1).astype(jnp.bool_),
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "max_typos", "no_prefilter", "k"),
)
def sharded_match_topk(
    cp, first_byte, prev_last_byte, byte_off, byte_len, n_units, n_bytes,
    row_index, needle_orig, needle_flip, sc,
    *, mesh: Mesh, max_typos: int = 0, no_prefilter: bool = False, k: int = 64,
):
    """Shard a packed bucket over ``mesh`` and return the global top-k.

    Inputs are the packed bucket arrays (see corpus.PackedBucket) with the
    batch dim padded to a multiple of the mesh size; padding rows must carry
    ``row_index == PAD_INDEX``. Returns replicated
    (matched, index, score, exact, end_col, needs_greedy), each (k,): the
    global top-k rows in (score desc, index asc) order. Rows flagged
    needs_greedy carry a window-capped device score and must be rescored on
    the host (match_corpus_sharded does).
    """

    def shard_fn(cp, fb, plb, boff, blen, nu, nb, ridx, orig, flip, sc):
        key1, key2, score, aux, end_col = _local_match_topk(
            cp, fb, plb, boff, blen, nu, nb, ridx, orig, flip, sc,
            max_typos=max_typos, no_prefilter=no_prefilter, k=k,
        )
        # The collective: per-shard sorted top-k rides ICI to every device
        g = jax.lax.all_gather(
            (key1, key2, score, aux, end_col), DATA_AXIS, tiled=False
        )
        return _merge_topk(*g, k)

    shard = P(DATA_AXIS)
    repl = P()
    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(shard,) * 8 + (repl,) * 3,
        out_specs=(repl,) * 6,
        check_vma=False,
    )(
        cp, first_byte, prev_last_byte, byte_off, byte_len, n_units, n_bytes,
        row_index, needle_orig, needle_flip, sc,
    )


def pad_bucket_for_mesh(bucket, n_shards: int):
    """Pad a PackedBucket's arrays so the batch dim divides the mesh size.

    Returns (arrays..., row_index) as numpy, with padding rows flagged by
    ``row_index == PAD_INDEX`` and zero units so they never match.
    """
    b = bucket.size
    padded = -(-b // n_shards) * n_shards
    pad = padded - b

    def pad_rows(x, fill=0):
        if pad == 0:
            return x
        return np.concatenate(
            [x, np.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    idx = bucket.indices.astype(np.int64)
    idx = np.where(idx < 0, int(PAD_INDEX), idx)  # size-class pad rows
    row_index = pad_rows(idx.astype(np.int32), int(PAD_INDEX))
    cp, first, prev, boff, blen = bucket._full_arrays()
    return (
        pad_rows(cp),
        pad_rows(first),
        pad_rows(prev, -1),
        pad_rows(boff),
        pad_rows(blen),
        pad_rows(bucket.n_units),
        pad_rows(bucket.n_bytes),
        row_index,
    )


def match_corpus_sharded(
    corpus, engine, mesh: Mesh, k: int = 64
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Match every bucket of ``corpus`` on the mesh and merge bucket top-ks.

    Host-side wrapper over ``sharded_match_topk``; greedy/XL rows are
    rescored by the engine's host path, exactly like the single-device
    engine. Returns (index, score, exact, end_col) of the global top-k in
    (score desc, index asc) order.
    """
    no_prefilter = engine.config.max_typos is None
    typos = 0 if no_prefilter else int(engine.config.max_typos)
    orig, flip, sc = engine._device_needle()
    n = mesh.devices.size

    parts = []
    for bucket in corpus.buckets:
        arrs = pad_bucket_for_mesh(bucket, n)
        sharding = NamedSharding(mesh, P(DATA_AXIS))
        repl = NamedSharding(mesh, P())
        dev_arrs = [jax.device_put(a, sharding) for a in arrs]
        matched, index, score, exact, end_col, greedy = [
            np.array(x)  # writable: greedy rows are patched below
            for x in sharded_match_topk(
                *dev_arrs,
                jax.device_put(orig, repl),
                jax.device_put(flip, repl),
                jax.device_put(sc, repl),
                mesh=mesh, max_typos=typos, no_prefilter=no_prefilter, k=k,
            )
        ]
        # Greedy rows (trimmed window > DP cap) carry capped device scores;
        # rescore on the host like the single-device engine does
        keep = matched.copy()
        for j in np.nonzero(matched & greedy)[0]:
            m = engine.match_one(corpus.haystacks[int(index[j])],
                                 int(index[j]))
            if m is None:
                keep[j] = False
            else:
                score[j], exact[j], end_col[j] = m.score, m.exact, m.end_col
        sel = keep
        parts.append(
            (index[sel], score[sel], exact[sel].astype(bool), end_col[sel])
        )
    # XL rows (host path)
    for i in corpus.xl_indices:
        m = engine.match_one(corpus.haystacks[int(i)], int(i))
        if m is not None:
            parts.append(
                (np.array([m.index]), np.array([m.score]),
                 np.array([m.exact]), np.array([m.end_col]))
            )
    if not parts:
        z = np.zeros(0, np.int64)
        return z, z, z.astype(bool), z
    index = np.concatenate([p[0] for p in parts])
    score = np.concatenate([p[1] for p in parts])
    exact = np.concatenate([p[2] for p in parts])
    end_col = np.concatenate([p[3] for p in parts])
    order = np.lexsort((index, -score))[:k]
    return index[order], score[order], exact[order], end_col[order]
