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
from .ops.kernels import fuzzy_match_units

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


def put_global_sharded(arr, mesh: Mesh, spec=None):
    """Build a mesh-global device array from host data, working in BOTH
    controller modes. Single-controller (one process owns every device):
    a plain ``device_put``. Multi-controller (``jax.distributed`` — each
    process owns a slice of the mesh): every process passes the full host
    array and feeds only its own devices' rows through
    ``jax.make_array_from_process_local_data``, the documented multi-host
    data path. Row-sharded specs require the leading dim to divide the
    process count (pad_bucket_for_mesh guarantees a mesh-size multiple).
    """
    spec = P(DATA_AXIS) if spec is None else spec
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    if spec == P():
        local = arr  # replicated: every process feeds the full copy
    else:
        pc, pi = jax.process_count(), jax.process_index()
        chunk = arr.shape[0] // pc
        local = arr[pi * chunk : (pi + 1) * chunk]
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local), arr.shape
    )


def match_corpus_sharded(
    corpus, engine, mesh: Mesh, k: int = 64
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Match every bucket of ``corpus`` on the mesh and merge bucket top-ks.

    Host-side wrapper over ``sharded_match_topk``; greedy/XL rows are
    rescored by the engine's host path, exactly like the single-device
    engine. Returns (index, score, exact, end_col) of the global top-k in
    (score desc, index asc) order. Works single- and multi-controller:
    every process packs the same corpus and the data feed goes through
    ``put_global_sharded`` (2-process end-to-end equality is test-pinned,
    tests/test_multihost.py).
    """
    no_prefilter = engine.config.max_typos is None
    typos = 0 if no_prefilter else int(engine.config.max_typos)
    orig, flip, sc = engine._device_needle()
    n = mesh.devices.size

    parts = []
    for bucket in corpus.buckets:
        arrs = pad_bucket_for_mesh(bucket, n)
        dev_arrs = [put_global_sharded(a, mesh) for a in arrs]
        matched, index, score, exact, end_col, greedy = [
            np.array(x)  # writable: greedy rows are patched below
            for x in sharded_match_topk(
                *dev_arrs,
                put_global_sharded(np.asarray(orig), mesh, P()),
                put_global_sharded(np.asarray(flip), mesh, P()),
                put_global_sharded(np.asarray(sc), mesh, P()),
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


# -- batched (multi-query) sharded serving -----------------------------------


def _pad_rows(x, pad: int, fill=0):
    if pad == 0:
        return x
    cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, cfg, constant_values=fill)


def _mesh_pad_buckets(corpus, use_kernel: bool, n_shards: int):
    """Mesh-pad every bucket's device arrays for the sharded general body:
    kernel 5-tuples or jnp 8-tuples with rows padded to a shard multiple
    (zero units, index -1 — the same can't-match convention as the
    corpus's own size-class padding, ops/batch._fused_match_body)."""
    out = []
    for b in corpus.buckets:
        if use_kernel:
            arrs = (
                b.device_arrays_units()
                if corpus.unicode
                else b.device_arrays_ascii()
            )
            cp, nu, idx, mask4, bits8 = arrs
            pad = (-cp.shape[0]) % n_shards
            out.append((
                _pad_rows(cp, pad), _pad_rows(nu, pad),
                _pad_rows(idx, pad, -1), _pad_rows(mask4, pad),
                _pad_rows(bits8, pad),
            ))
        else:
            cp, fb, plb, boff, blen, nu, nb, idx = b.device_arrays()
            pad = (-cp.shape[0]) % n_shards
            out.append((
                _pad_rows(cp, pad), _pad_rows(fb, pad),
                _pad_rows(plb, pad, -1), _pad_rows(boff, pad),
                _pad_rows(blen, pad), _pad_rows(nu, pad),
                _pad_rows(nb, pad), _pad_rows(idx, pad, -1),
            ))
    return tuple(out)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "n", "pattern_statics", "sort_by_score", "use_kernel",
        "unicode", "score_bound", "fetch_rows",
    ),
)
def sharded_match_sorted_batch(
    buckets, stacked_patterns,
    *, mesh: Mesh, n: int, pattern_statics: Tuple,
    sort_by_score: bool, use_kernel: bool, unicode: bool,
    score_bound, fetch_rows: int,
):
    """Q-query mesh-sharded serving over the FULL query syntax: the
    multi-chip form of ops/batch.fused_match_sorted_batch.

    Each device runs the general single-chip match body
    (ops/batch._fused_match_body — multi-pattern combine with negation
    veto, literal modes, fuzzy kernels with stage-1 compaction, every
    sort strategy) over its shard of every bucket, keeps its local
    sorted top-``fetch_rows`` [index, meta] rows, and the shards merge
    with one ``all_gather`` over ICI plus a replicated sort on keys
    rebuilt from the rows (score rides meta; the unique global index
    makes the order total, so the merged result is identical to the
    sequential one — the reference's parallel==sequential property,
    tests/api_properties.rs:79-114). Exact per-query match counts
    ``psum`` across the mesh.

    Returns a replicated (Q, 1 + fetch_rows, 2) int32 array with the
    same layout as the single-chip batch program: row 0 is
    [total_count, 0], rows 1.. are [index, meta] (meta as in
    ops/batch._pack_meta). Callers apply the same host fixups as the
    single-chip path (matcher._finalize_topk).
    """
    from .ops.batch import _fused_match_body

    def shard_fn(buckets, stacked):
        b_local = sum(
            b[2 if len(b) == 5 else 7].shape[0] for b in buckets
        )
        kl = max(1, min(fetch_rows, b_local))

        def body(carry, patterns):
            out = _fused_match_body(
                buckets, patterns, None, n, pattern_statics,
                sort_by_score, use_kernel, unicode, score_bound,
            )
            return carry, out[: 1 + kl]

        _, outs = jax.lax.scan(body, jnp.int32(0), stacked)
        q = outs.shape[0]
        cl = outs[:, 0, 0]  # local match counts
        counts = jax.lax.psum(cl, DATA_AXIS)
        index_l = outs[:, 1:, 0]
        meta_l = outs[:, 1:, 1]
        pos = jax.lax.broadcasted_iota(jnp.int32, (q, kl), 1)
        valid = pos < cl[:, None]
        # Merge keys rebuilt from the rows: the device-side order is
        # ALWAYS (matched first, score desc, index asc) for score sorts
        # and index asc otherwise — exactly _select_sorted's order; any
        # reversed-strategy transform happens on the host afterward,
        # like the single-chip path (matcher._host_fixups).
        score = jax.lax.shift_right_logical(meta_l, 16)
        if sort_by_score:
            key1 = jnp.where(valid, -score, PAD_INDEX)
            key2 = jnp.where(valid, index_l, PAD_INDEX)
        else:
            key1 = jnp.where(valid, index_l, PAD_INDEX)
            key2 = key1
        meta_m = jnp.where(valid, meta_l, 0)
        g1, g2, gm = jax.lax.all_gather(
            (key1, key2, meta_m), DATA_AXIS, tiled=False
        )  # each (shards, Q, kl)
        ops = tuple(
            jnp.swapaxes(x, 0, 1).reshape(q, -1) for x in (g1, g2, gm)
        )
        k1, k2, mm = jax.lax.sort(
            ops, dimension=1, num_keys=2, is_stable=False
        )
        f = min(fetch_rows, k2.shape[1])
        matched_m = k2[:, :f] != PAD_INDEX
        idx_m = jnp.where(matched_m, k2[:, :f], 0)
        mm = jnp.where(matched_m, mm[:, :f], 0)
        rows = jnp.stack([idx_m, mm], axis=2)
        if f < fetch_rows:
            rows = jnp.pad(rows, ((0, 0), (0, fetch_rows - f), (0, 0)))
        header = jnp.stack(
            [counts, jnp.zeros_like(counts)], axis=1
        )[:, None, :]
        return jnp.concatenate([header, rows], axis=1)

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(DATA_AXIS), buckets),
            jax.tree.map(lambda _: P(), stacked_patterns),
        ),
        out_specs=P(),
        check_vma=False,
    )(buckets, stacked_patterns)


def match_topk_batch_sharded(
    queries, corpus, mesh: Mesh, config=None, k: int = 64
):
    """Multi-query mesh-sharded top-k serving: the multi-chip form of
    ``matcher.match_topk_batch``, covering the FULL query syntax —
    multi-pattern combine (sum/OR/max, negation veto), literal modes,
    typo budgets, every sort strategy (reference parallel path:
    src/matcher/parallel.rs:18-89 over every pattern type).

    Q queries run against a corpus sharded data-parallel over ``mesh``,
    grouped into one device program per query shape (pattern count,
    needle lengths, statics); each returns ``(total_count, index, score,
    exact, end_col)`` with at most ``k`` rows — content identical to the
    single-device serving path (test-pinned at 2/4/8 shards). Greedy/XL
    rows are handled by the same ``_finalize_topk`` host fixups the
    single-device path runs, applied to the same globally-ordered
    fetched set, so outputs can't diverge. Queries the fused device path
    can't serve (empty needles, unit-mode mismatch with the corpus
    packing) fall back to the single-device path transparently.
    """
    from .config import Config
    from .matcher import Matcher, _finalize_topk, _resolve_batch

    config = config or Config()
    matchers, corpus = _resolve_batch(queries, corpus, config)
    n_shards = int(mesh.devices.size)
    kfetch = max(1, min(k, len(corpus)))

    groups = {}
    raw = [None] * len(matchers)
    prepared = {}
    for i, m in enumerate(matchers):
        if not m._fused_supported() or not m._compiled:
            continue
        if m._compiled[0].engine.unicode != corpus.unicode:
            continue
        if not corpus.buckets:
            continue  # XL/empty corpus: nothing to shard, host path only
        _b, _p, statics, use_kernel, _bst = m._fused_device_args(corpus)
        patterns_host = tuple(
            cp.engine._host_needle() for cp in m._compiled
        )
        key = (
            statics,
            tuple(p[0].shape[0] for p in patterns_host),
            use_kernel,
        )
        groups.setdefault(key, []).append(i)
        prepared[i] = patterns_host

    padded_cache = {}
    shard_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl_sh = NamedSharding(mesh, P())
    pending = []
    for (statics, _lens, use_kernel), members in groups.items():
        if use_kernel not in padded_cache:
            padded_cache[use_kernel] = jax.tree.map(
                lambda a: jax.device_put(a, shard_sh),
                _mesh_pad_buckets(corpus, use_kernel, n_shards),
            )
        buckets = padded_cache[use_kernel]
        n_pat = len(statics)
        stacked = tuple(
            tuple(
                jax.device_put(
                    jnp.asarray(
                        np.stack([prepared[i][p][a] for i in members])
                    ),
                    repl_sh,
                )
                for a in range(3)
            )
            for p in range(n_pat)
        )
        out = sharded_match_sorted_batch(
            buckets, stacked,
            mesh=mesh, n=len(corpus), pattern_statics=statics,
            sort_by_score=config.sort.is_by_score, use_kernel=use_kernel,
            unicode=corpus.unicode,
            score_bound=matchers[members[0]]._score_bound(),
            fetch_rows=kfetch,
        )
        try:
            out.copy_to_host_async()
        except AttributeError:
            pass
        pending.append((out, members))

    for out, members in pending:
        all_rows = np.asarray(out)  # one fetch per group
        for qi, i in enumerate(members):
            block = all_rows[qi]
            count = int(block[0, 0])
            rows = block[1 : 1 + min(count, block.shape[0] - 1)]
            raw[i] = (count,) + Matcher._decode_rows(rows)
    # _finalize_topk applies the same host fixups + greedy-overflow
    # fallback + per-query single-device fallback as match_topk_batch
    return _finalize_topk(matchers, corpus, raw, k)
