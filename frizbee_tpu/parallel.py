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


# -- batched (multi-query) sharded serving -----------------------------------


def _pad_kernel_bucket_for_mesh(bucket, n_shards: int, unicode: bool):
    """Mesh-pad a bucket's kernel-path arrays (rows padded to a multiple
    of the shard count): zero units, -1 indices (can never match), zero
    presence masks. Returns (cp, n_units, indices, mask4) jnp arrays."""
    arrs = (
        bucket.device_arrays_units()
        if unicode
        else bucket.device_arrays_ascii()
    )
    cp, nu, idx, mask4, _bits8 = arrs
    pad = (-cp.shape[0]) % n_shards
    if pad:
        cp = jnp.pad(cp, ((0, pad), (0, 0)))
        nu = jnp.pad(nu, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, (0, pad), constant_values=-1)
        mask4 = jnp.pad(mask4, ((0, pad), (0, 0)))
    return cp, nu, idx, mask4


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "max_typos", "no_prefilter", "unicode", "scoring", "k",
    ),
)
def sharded_batch_topk(
    cp, n_units, row_index, mask4, needles_q,
    *, mesh: Mesh, max_typos: int, no_prefilter: bool, unicode: bool,
    scoring: Tuple[int, ...], k: int,
):
    """Q-query mesh-sharded bucket top-k: the multi-chip form of the
    single-chip serving fast path (ops/batch._fused_match_batch_fast).

    The bucket's kernel arrays are sharded data-parallel over ``mesh``;
    each device scans the Q stacked needles through the fused stage-1 +
    prefilter + Smith-Waterman kernel path (ops/kernels.fuzzy_match_units
    — the same kernels the single-chip path runs), sorts its local rows
    by the shared global order key (ops/batch.order_keys), and keeps a
    local top-k per query. Exact per-query match counts ``psum`` over the
    mesh; local top-ks ``all_gather`` over ICI and merge with one
    replicated sort — because keys embed the unique global row index the
    merged order is total, so the result is identical to the sequential
    one (the reference's parallel==sequential property,
    tests/api_properties.rs:79-114).

    Inputs: cp (B, W) units, n_units (B, 1), row_index (B,) with -1 on
    padding rows, mask4 (B, 4) presence masks — B a multiple of the mesh
    size — and needles_q (Q, 2n) stacked [orig | flip] needles,
    replicated. Returns replicated (counts (Q,), index (Q, k), score,
    exact, end_col, needs_greedy); index -1 marks empty slots. Rows
    flagged needs_greedy carry window-capped device scores and must be
    host-rescored (match_topk_batch_sharded does).
    """

    def shard_fn(cp, nu, idx, mask4, needles_q):
        kk = min(k, cp.shape[0])

        def body(carry, needle_q):
            m, s, e, ec, g = fuzzy_match_units(
                cp, nu, needle_q, max_typos=max_typos,
                no_prefilter=no_prefilter, scoring=scoring,
                unicode=unicode, mask4=mask4,
            )
            matched = m & (idx >= 0)
            key1, key2 = _order_keys(matched, s, idx)
            aux = (e.astype(jnp.int32) << 1) | g.astype(jnp.int32)
            # keys embed the unique row index -> total order, so the
            # sort need not be stable; score rides key1 (= -score on
            # matched rows) and is recovered after the merge
            key1, key2, aux, ec = jax.lax.sort(
                (key1, key2, aux, ec), num_keys=2, is_stable=False
            )
            cnt = jnp.sum(matched).astype(jnp.int32)
            if kk < k:  # shard smaller than k: pad with unmatched slots
                key1 = jnp.pad(key1[:kk], (0, k - kk), constant_values=1)
                key2 = jnp.pad(
                    key2[:kk], (0, k - kk), constant_values=PAD_INDEX
                )
                aux = jnp.pad(aux[:kk], (0, k - kk))
                ec = jnp.pad(ec[:kk], (0, k - kk))
            else:
                key1, key2, aux, ec = key1[:k], key2[:k], aux[:k], ec[:k]
            return carry, (key1, key2, aux, ec, cnt)

        _, (key1, key2, aux, ec, cnt) = jax.lax.scan(
            body, jnp.int32(0), needles_q
        )
        counts = jax.lax.psum(cnt, DATA_AXIS)
        gathered = jax.lax.all_gather(
            (key1, key2, aux, ec), DATA_AXIS, tiled=False
        )  # each (shards, Q, k)
        q = needles_q.shape[0]
        ops = tuple(
            jnp.swapaxes(x, 0, 1).reshape(q, -1) for x in gathered
        )
        k1m, k2m, auxm, ecm = jax.lax.sort(
            ops, dimension=1, num_keys=2, is_stable=False
        )
        return counts, k1m[:, :k], k2m[:, :k], auxm[:, :k], ecm[:, :k]

    shard = P(DATA_AXIS)
    repl = P()
    counts, key1, key2, aux, ec = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(shard, shard, shard, shard, repl),
        out_specs=(repl,) * 5,
        check_vma=False,
    )(cp, n_units, row_index, mask4, needles_q)
    matched = key2 != PAD_INDEX
    index = jnp.where(matched, key2, -1)
    score = jnp.where(matched, -key1, 0)
    exact = matched & ((aux >> 1) == 1)
    greedy = matched & ((aux & 1) == 1)
    return counts, index, score, exact, ec, greedy


def match_topk_batch_sharded(
    queries, corpus, mesh: Mesh, config=None, k: int = 64
):
    """Multi-query mesh-sharded top-k serving: the multi-chip form of
    ``matcher.match_topk_batch``. Q queries run against a corpus sharded
    data-parallel over ``mesh``, one device program per (bucket, query
    group); each returns ``(total_count, index, score, exact, end_col)``
    with at most ``k`` rows in (score desc, index asc) order — content
    identical to the single-device serving path (test-pinned).

    Queries the sharded kernel path can't serve (multi-pattern, literal
    modes, negation, empty or unit-mode-mismatched needles, non-default
    sort) fall back to the single-device path transparently, like
    ``match_arrays_batch`` does. Greedy/XL rows are handled by the same
    ``_host_fixups`` the single-device serving path runs, applied to the
    same globally-ordered fetched set, so the outputs can't diverge.
    """
    from .config import Config, SortStrategy
    from .matcher import _finalize_topk, _resolve_batch

    config = config or Config()
    matchers, corpus = _resolve_batch(queries, corpus, config)
    n_shards = int(mesh.devices.size)

    groups = {}
    results = [None] * len(matchers)
    for i, m in enumerate(matchers):
        if not (
            m._fused_supported()
            and len(m._compiled) == 1
            and not m._compiled[0].negated
            and m._compiled[0].config.matching.is_fuzzy
            and m._compiled[0].engine.unicode == corpus.unicode
            and m._config.sort == SortStrategy.SCORE_THEN_INDEX_ASC
        ):
            continue
        _b, _p, statics, use_kernel, _bst = m._fused_device_args(corpus)
        if not use_kernel:
            continue
        n_len = len(m._compiled[0].engine.units.orig)
        groups.setdefault((statics[0], n_len), []).append(i)

    repl_sh = NamedSharding(mesh, P())
    shard_sh = NamedSharding(mesh, P(DATA_AXIS))
    # Mesh-pad + shard each bucket once (group-independent), and dispatch
    # every (group, bucket) program before fetching anything: each fetch
    # pays a host-link round trip, so all device work launches first
    sharded_buckets = [
        [
            jax.device_put(a, shard_sh)
            for a in _pad_kernel_bucket_for_mesh(
                bucket, n_shards, corpus.unicode
            )
        ]
        for bucket in (corpus.buckets if groups else [])
    ]
    pending = []
    for (statics, _n_len), members in groups.items():
        typos, nopre, _neg, scoring, _mode, _nbl = statics
        needles = np.stack([
            np.concatenate(
                matchers[i]._compiled[0].engine._host_needle()[:2]
            )
            for i in members
        ]).astype(np.int32)
        needles_d = jax.device_put(needles, repl_sh)
        per_bucket = []
        for arrs in sharded_buckets:
            out = sharded_batch_topk(
                *arrs, needles_d,
                mesh=mesh, max_typos=typos, no_prefilter=nopre,
                unicode=corpus.unicode, scoring=scoring, k=k,
            )
            for x in out:
                try:
                    x.copy_to_host_async()
                except AttributeError:
                    pass
            per_bucket.append(out)
        pending.append((members, per_bucket))

    kfetch = min(k, len(corpus))
    for members, per_bucket in pending:
        per_bucket = [[np.asarray(x) for x in out] for out in per_bucket]
        for qi, i in enumerate(members):
            # Merge per-bucket candidates into the globally-ordered
            # fetched set (per-bucket top-k is a superset of each
            # bucket's members of the global top-k), then hand it to the
            # same host fixups the single-device serving path applies —
            # greedy rescoring and (presence-gated) XL rows included
            count, parts = 0, []
            for counts, index, score, exact, ec, greedy in per_bucket:
                count += int(counts[qi])
                sel = index[qi] >= 0
                parts.append((
                    index[qi][sel], score[qi][sel], exact[qi][sel],
                    ec[qi][sel], greedy[qi][sel],
                ))
            cols = [
                np.concatenate([p[c] for p in parts])
                if parts
                else np.zeros(0, np.int64)
                for c in range(5)
            ]
            order = np.lexsort((cols[0], -cols[1]))[:kfetch]
            bi, bs, be, bec, bg = (c[order] for c in cols)
            fetched = len(bi)
            index, score, exact, end_col = matchers[i]._host_fixups(
                corpus,
                bi.astype(np.int64), bs.astype(np.int64),
                be.astype(bool), bec.astype(np.int64), bg.astype(bool),
            )
            # keep the exact total in sync with the fixups' delta, as
            # the single-device _finalize_topk does
            count += len(index) - fetched
            results[i] = (
                count, index[:k], score[:k], exact[:k], end_col[:k]
            )

    # Single-device fallback for everything the sharded path skipped
    # (same branch _finalize_topk takes for unserved queries)
    leftover = [i for i in range(len(matchers)) if results[i] is None]
    if leftover:
        fb = _finalize_topk(
            [matchers[i] for i in leftover], corpus,
            [None] * len(leftover), k,
        )
        for j, i in enumerate(leftover):
            results[i] = fb[j]
    return results
