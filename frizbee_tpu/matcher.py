"""Matcher orchestration: pattern compilation, dispatch, multi-pattern
composition, sorting, and the public matching APIs.

Mirrors the reference's Matcher surface (reference: src/matcher/mod.rs:80-371,
src/matcher/multi.rs) on top of the TPU batch engines. Where the reference
dispatches to monomorphized SIMD backends, this build dispatches to jitted
bucket kernels keyed on (bucket width, needle length, typo budget).
"""

from __future__ import annotations

from itertools import islice
from typing import Iterable, Iterator, List, Optional, Sequence, Union

import numpy as np

from .config import Config, SortStrategy, U16_MAX, sat_add_u16
from .corpus import Corpus, pack_corpus
from .engine import MatchResult, make_engine
from .pattern import Pattern
from .types import Match, MatchIndices, MatchList

PatternLike = Union[str, Pattern]

# Tiered Q=1 result-window floor (rows): the single-query fast path
# serves max(this, N/8) result rows and re-dispatches with the full
# window on count overflow (see Matcher._fused_dispatch). Module-level
# so tests can exercise the overflow path on small corpora.
Q1_WINDOW_MIN = 65536


class _CompiledPattern:
    __slots__ = ("negated", "needle", "config", "engine")

    def __init__(self, source: Pattern, config: Config, use_device: bool):
        resolved = source.config.resolve(config)
        self.negated = source.negated
        self.needle = source.needle
        self.config = resolved
        self.engine = make_engine(source.needle, resolved, use_device)


def _as_pattern(p: PatternLike) -> Pattern:
    if isinstance(p, Pattern):
        return p
    return Pattern.literal(str(p))


class Matcher:
    """Compile once, match many (reference: src/matcher/mod.rs:80-111).

    ``use_device=False`` selects the pure-host oracle engines (useful for
    differential testing; identical semantics).
    """

    # Rows fetched eagerly alongside the match count; larger result sets
    # cost one extra device->host roundtrip
    fetch_rows: int = 8192

    def __init__(
        self,
        pattern: Union[PatternLike, Sequence[Pattern]],
        config: Optional[Config] = None,
        use_device: bool = True,
    ):
        self._config = config or Config()
        self._use_device = use_device
        if isinstance(pattern, (list, tuple)):
            self._raw_patterns = [_as_pattern(p) for p in pattern]
        else:
            self._raw_patterns = [_as_pattern(pattern)]
        self._compiled = self._build()

    @classmethod
    def from_query(cls, query: str, config: Optional[Config] = None, **kw) -> "Matcher":
        return cls(Pattern.parse_query(query), config, **kw)

    @classmethod
    def from_patterns(
        cls, patterns: Sequence[Pattern], config: Optional[Config] = None, **kw
    ) -> "Matcher":
        return cls(list(patterns), config, **kw)

    # -- config management ---------------------------------------------------

    @property
    def patterns(self) -> List[Pattern]:
        return list(self._raw_patterns)

    @property
    def config(self) -> Config:
        return self._config

    def set_config(self, config: Config) -> None:
        if config == self._config:
            return
        self._config = config
        self._compiled = self._build()

    def set_pattern(self, pattern: PatternLike) -> None:
        self.set_patterns([_as_pattern(pattern)])

    def set_patterns(self, patterns: Sequence[Pattern]) -> None:
        patterns = [_as_pattern(p) for p in patterns]
        if patterns == self._raw_patterns:
            return
        self._raw_patterns = patterns
        self._compiled = self._build()

    def _build(self) -> List[_CompiledPattern]:
        # compiled needles feed the per-corpus dispatch cache: any
        # pattern/config rebuild invalidates it
        self._dispatch_cache = {}
        return [
            _CompiledPattern(p, self._config, self._use_device)
            for p in self._raw_patterns
            if p.needle
        ]

    # -- core batch path -------------------------------------------------------

    def _pack(self, haystacks: Sequence[str], unicode: bool) -> Corpus:
        return pack_corpus(haystacks, unicode=unicode)

    def _match_result(
        self, haystacks: Union[Sequence[str], Corpus]
    ) -> MatchResult:
        """Combined per-haystack result across all patterns, in input order.

        Multi-pattern composition: all non-negated must match (scores sum,
        exact ORs, end_col maxes), no negated may match
        (reference: src/matcher/multi.rs:84-152)."""
        n = len(haystacks)
        combined: Optional[MatchResult] = None
        corpora = {}
        if isinstance(haystacks, Corpus):
            corpora[haystacks.unicode] = haystacks
            haystacks = haystacks.haystacks

        def corpus_for(unicode: bool) -> Corpus:
            if unicode not in corpora:
                corpora[unicode] = self._pack(haystacks, unicode)
            return corpora[unicode]

        for cp in self._compiled:
            res = cp.engine.match_corpus(corpus_for(cp.engine.unicode))
            if cp.negated:
                if combined is None:
                    combined = MatchResult(n)
                    combined.matched[:] = True
                combined.matched &= ~res.matched
            else:
                if combined is None:
                    combined = MatchResult(n)
                    combined.matched[:] = True
                combined.matched &= res.matched
                combined.score = np.minimum(
                    combined.score + res.score * res.matched, 0xFFFF
                )
                combined.exact |= res.exact & res.matched
                combined.end_col = np.maximum(
                    combined.end_col, res.end_col * res.matched
                )
        if combined is None:
            combined = MatchResult(n)  # no patterns: handled by caller
        return combined

    # -- public APIs -----------------------------------------------------------

    def _fused_supported(self) -> bool:
        """The one-call device path covers fuzzy and literal patterns with
        one shared unicode packing."""
        if not self._use_device or not self._compiled:
            return False
        modes = set()
        for cp in self._compiled:
            if not cp.engine.units.orig:
                return False
            modes.add(cp.engine.unicode)
        return len(modes) == 1

    def _fused_device_args(self, corpus: Corpus):
        """(buckets, patterns, statics, use_kernel) for the fused jits."""
        from .ops.kernels import MAX_KERNEL_NEEDLE
        from .ops.fuzzy import SCORING_FIELDS

        # end_col travels in a 14-bit meta field (ops/batch._pack_meta);
        # it is a byte offset within one window, <= 4 bytes/unit x width.
        # Every default bucket fits (1024 units -> 4096 bytes); a wider
        # custom bucket would silently clamp end_col.
        assert all(b.width * 4 <= 0x3FFF for b in corpus.buckets), (
            "bucket width exceeds the 14-bit end_col meta field "
            "(max 4095 units; see ops/batch._pack_meta)"
        )
        use_kernel = (
            all(
                (b.width % 128 == 0 or 128 % b.width == 0)
                and b.width <= 1024
                for b in corpus.buckets
            )
            and all(
                len(cp.engine.units.orig) <= MAX_KERNEL_NEEDLE
                for cp in self._compiled
            )
            # the kernel unrolls (T+1) DP states; keep outlandish budgets
            # (reference sane range is 0-3) off the Mosaic compiler. The
            # budget is clamped to the needle length inside the kernel
            # wrapper (a budget >= needle length auto-passes either way).
            and all(
                min(
                    cp.config.max_typos or 0,
                    len(cp.engine.units.orig),
                ) <= 8
                for cp in self._compiled
            )
        )
        if use_kernel and corpus.unicode:
            buckets = tuple(b.device_arrays_units() for b in corpus.buckets)
        elif use_kernel:
            buckets = tuple(b.device_arrays_ascii() for b in corpus.buckets)
        else:
            buckets = tuple(b.device_arrays() for b in corpus.buckets)
        # Per-bucket (ident_base, n_real): when a bucket's real rows are a
        # contiguous corpus index range, the serving fast path recovers
        # indices arithmetically instead of gathering them (ops/batch.py)
        bucket_statics = tuple(b.ident_static() for b in corpus.buckets)
        patterns = tuple(cp.engine._device_needle() for cp in self._compiled)
        statics = tuple(
            (
                0 if cp.config.max_typos is None else int(cp.config.max_typos),
                cp.config.max_typos is None,
                cp.negated,
                tuple(
                    int(getattr(cp.config.scoring, f)) for f in SCORING_FIELDS
                ),
                cp.config.matching.value if not cp.config.matching.is_fuzzy
                else "fuzzy",
                len(cp.engine.needle_bytes),
            )
            for cp in self._compiled
        )
        return buckets, patterns, statics, use_kernel, bucket_statics

    def _score_bound(self) -> int:
        """Strict static upper bound on any combined match score; lets the
        device sort pack (score, index) into one int32 key. Per char a
        match can earn at most match + matching_case + max(capitalization,
        delimiter) (the two context bonuses are mutually exclusive), plus
        the one-time prefix and exact bonuses per pattern."""
        total = 0
        for cp in self._compiled:
            if cp.negated:
                continue
            s = cp.config.scoring
            per_char = (
                s.match_score
                + s.matching_case_bonus
                + max(s.capitalization_bonus, s.delimiter_bonus)
            )
            n_units = len(cp.engine.units.orig)
            total += (
                n_units * per_char + s.prefix_bonus + s.exact_match_bonus
            )
        return min(total, 0xFFFF)

    @staticmethod
    def _decode_rows(rows: np.ndarray) -> tuple:
        """Unpack fetched [index, meta] rows (meta = score<<16 | exact<<15
        | greedy<<14 | end_col; see ops/batch._pack_meta)."""
        index = rows[:, 0].astype(np.int64)
        meta = rows[:, 1].astype(np.uint32)
        score = (meta >> np.uint32(16)).astype(np.int64)
        exact = ((meta >> np.uint32(15)) & np.uint32(1)).astype(bool)
        greedy = ((meta >> np.uint32(14)) & np.uint32(1)).astype(bool)
        end_col = (meta & np.uint32(0x3FFF)).astype(np.int64)
        return index, score, exact, end_col, greedy

    def _fused_dispatch(self, corpus: Corpus, full_window: bool = False):
        """Launch the fused device program and start the fetch; returns
        an opaque pending handle for ``_fused_collect``. Splitting
        dispatch from collection lets callers keep several corpora in
        flight so the host-link round trip overlaps device execution
        (match_iter's chunk pipeline).

        Single fuzzy non-negated queries route through the batched fast
        engine at Q=1 (stage-1 MXU presence + capacity tiers + the
        column-stream kernel) — the same program family serving uses —
        instead of the generic one-query program; on in-place workloads
        that engine is ~10-20x faster per query.

        The fast path serves a TIERED result window (max(64k, N/8) rows
        unless ``full_window``): a full-corpus window forces the full
        result sort plus a corpus-sized decode — measured +13 ms of
        device time at 1M rows (probe_q1 ablation) — while almost every
        real query's matches fit the tier. A count overflow
        re-dispatches once with the full window (_fused_collect).
        Device args, stacked needles, colstream blocks and the finalize
        cap are cached per (corpus, window): recomputing them cost
        ~10 ms of host work per single-query call."""
        from .ops.batch import (
            fused_match_sorted,
            fused_match_sorted_batch,
        )

        strategy = self._config.sort
        cache = getattr(self, "_dispatch_cache", None)
        ck = (id(corpus), bool(full_window))
        if (
            cache is not None
            and ck in cache
            and cache[ck][0]() is corpus
        ):
            _c, fast, prep = cache[ck]
        else:
            from .ops.batch import colstream_eligible_all

            buckets, patterns, statics, use_kernel, bst = (
                self._fused_device_args(corpus)
            )
            # the batched engine serves single fuzzy AND literal
            # patterns at Q=1 (fused_match_sorted_batch routes by
            # mode), plus any multi-pattern / negated combination whose
            # every pattern fits the column-stream kernel
            pats_host = [
                cp.engine._host_needle() for cp in self._compiled
            ]
            lens = [p[0].shape[0] for p in pats_host]
            single = len(statics) == 1 and not statics[0][2]
            fast = (
                use_kernel
                and strategy.is_by_score
                and (single or colstream_eligible_all(statics, lens))
            )
            if fast:
                import jax.numpy as jnp

                window = (
                    len(corpus)
                    if full_window
                    else min(
                        len(corpus),
                        max(Q1_WINDOW_MIN, len(corpus) // 8),
                    )
                )
                stacked = tuple(
                    tuple(jnp.asarray(a[None]) for a in p)
                    for p in pats_host
                )
                buckets_T, fin_cap, _perm = _colstream_blocks_and_cap(
                    corpus, statics, lens,
                    [np.concatenate(p[:2])[None, :] for p in pats_host],
                    window, single,
                )  # perm is trivially identity at Q=1
                prep = (buckets, statics, bst, stacked, buckets_T,
                        fin_cap, window)
            else:
                prep = (buckets, patterns, statics, bst, use_kernel)
            if cache is None:
                cache = self._dispatch_cache = {}
            if len(cache) >= 4:
                # entries hold device-block references: bound the cache
                # so cycling matchers over many corpora can't pin old
                # device arrays in HBM
                cache.clear()
            import weakref

            # weakref + eviction callback: a corpus the caller dropped
            # must not stay pinned (the prep tuples hold its device
            # blocks) until a 4th entry happens to arrive
            cache[ck] = (
                weakref.ref(
                    corpus,
                    lambda _r, c=cache, k=ck: c.pop(k, None),
                ),
                fast, prep,
            )
        if fast:
            (buckets, statics, bst, stacked, buckets_T, fin_cap,
             window) = prep
            out = fused_match_sorted_batch(
                buckets,
                stacked,
                corpus.device_xl_mask(),
                n=len(corpus),
                pattern_statics=statics,
                sort_by_score=True,
                use_kernel=True,
                unicode=corpus.unicode,
                score_bound=self._score_bound(),
                fetch_rows=window,
                bucket_statics=bst,
                buckets_T=buckets_T,
                finalize_cap=fin_cap,
            )[0]
        else:
            buckets, patterns, statics, bst, use_kernel = prep
            out = fused_match_sorted(
                buckets,
                patterns,
                corpus.device_xl_mask(),
                n=len(corpus),
                pattern_statics=statics,
                sort_by_score=strategy.is_by_score,
                use_kernel=use_kernel,
                unicode=corpus.unicode,
                score_bound=self._score_bound(),
            )
        # Start ONLY the head slice (count + first fetch_rows matches)
        # toward the host — async-copying the full (1+N, 2) result would
        # ship the whole matrix over the link (~11 MB at 1.4M rows) when
        # the common case reads a few thousand rows of it.
        head = out[: 1 + min(self.fetch_rows, len(corpus))]
        try:
            head.copy_to_host_async()
        except AttributeError:
            pass
        return corpus, out, head

    def _fused_collect(self, pending) -> tuple:
        corpus, out, head_dev = pending
        # One fetch covers the count + the first fetch_rows matches; a
        # second fetch only happens for very large result sets
        k = min(self.fetch_rows, len(corpus))
        head = np.asarray(head_dev)
        count = int(head[0, 0])
        if count > out.shape[0] - 1:
            # the tiered result window overflowed (count beyond
            # max(64k, N/8) matches): one re-dispatch with the
            # full-corpus window serves everything
            return self._fused_collect(
                self._fused_dispatch(corpus, full_window=True)
            )
        if count > k:
            rows = np.concatenate(
                [head[1:], np.asarray(out[1 + k : 1 + count])], axis=0
            )
        else:
            rows = head[1 : 1 + count]
        index, score, exact, end_col, greedy = self._decode_rows(rows)
        return self._host_fixups(
            corpus, index, score, exact, end_col, greedy
        )

    def _fused_match_arrays(self, corpus: Corpus) -> tuple:
        """One device call for the whole query; usually one fetch back.
        See ops/batch.py for the fused program."""
        return self._fused_collect(self._fused_dispatch(corpus))

    def _match_many_host(self, rows, xl=None) -> tuple:
        """Batched host equivalent of ``match_one`` over many haystacks:
        (matched, score, exact, end_col) arrays with the multi-pattern
        combine (sum/OR/max, negation veto — reference:
        src/matcher/multi.rs:84-152). Fuzzy engines run the native
        OpenMP batch (engine.match_many); the per-row ``match_one`` loop
        stays as the fallback and the differential oracle.

        ``rows`` may be a callable returning the haystack list (invoked
        at most once) when ``xl=(corpus, positions)`` is given — then
        engines with a blob path (engine.match_xl_rows) score straight
        off the corpus's resident encoded XL blob and the strings are
        never materialized."""
        mat_rows = None if callable(rows) else rows

        def get_rows():
            nonlocal mat_rows
            if mat_rows is None:
                mat_rows = rows()
            return mat_rows

        R = len(xl[1]) if xl is not None else len(get_rows())
        matched = np.ones(R, bool)
        score = np.zeros(R, np.int64)
        exact = np.zeros(R, bool)
        end_col = np.zeros(R, np.int64)
        for cp in self._compiled:
            eng = cp.engine
            res = None
            if xl is not None:
                fn = getattr(eng, "match_xl_rows", None)
                if fn is not None:
                    res = fn(*xl)
            if res is None:
                fn = getattr(eng, "match_many", None)
                if fn is not None:
                    res = fn(get_rows())
            if res is not None:
                m, s, e, ec = res
            else:
                m = np.zeros(R, bool)
                s = np.zeros(R, np.int64)
                e = np.zeros(R, bool)
                ec = np.zeros(R, np.int64)
                for r, h in enumerate(get_rows()):
                    mm = eng.match_one(h, r)
                    if mm is not None:
                        m[r] = True
                        s[r], e[r], ec[r] = mm.score, mm.exact, mm.end_col
            if cp.negated:
                matched &= ~m
            else:
                matched &= m
                score = np.minimum(score + np.where(m, s, 0), U16_MAX)
                exact |= e & m
                end_col = np.maximum(end_col, np.where(m, ec, 0))
        return matched, score, exact, end_col

    def _host_fixups(
        self, corpus, index, score, exact, end_col, greedy
    ) -> tuple:
        """Greedy/XL host rescoring + final strategy ordering."""
        strategy = self._config.sort
        resort = False
        # Greedy rows (trimmed window > DP cap): rescore on the host
        if greedy.any():
            gj = np.nonzero(greedy)[0]
            gm, gs, ge, gec = self._match_many_host(
                [corpus.haystacks[int(index[j])] for j in gj]
            )
            score[gj], exact[gj], end_col[gj] = gs, ge, gec
            keep = np.ones(len(index), dtype=bool)
            keep[gj] = gm
            index, score, exact, end_col = (
                index[keep], score[keep], exact[keep], end_col[keep]
            )
            resort = True
        # XL rows (longer than the largest bucket): full host pipeline,
        # gated by a presence reject so corpora with many oversized rows
        # only pay the per-row pipeline for plausible candidates
        if len(corpus.xl_indices):
            pos = np.nonzero(self._xl_candidates(corpus))[0]
            cand = corpus.xl_indices[pos]
            if len(cand):
                xm, xs, xe, xec = self._match_many_host(
                    lambda: [corpus.haystacks[int(i)] for i in cand],
                    xl=(corpus, pos),
                )
                if xm.any():
                    index = np.concatenate(
                        [index, cand[xm].astype(np.int64)]
                    )
                    score = np.concatenate([score, xs[xm]])
                    exact = np.concatenate([exact, xe[xm]])
                    end_col = np.concatenate([end_col, xec[xm]])
                    resort = True

        if resort:
            if strategy.is_by_score:
                order = np.lexsort((index, -score))
            else:
                order = np.argsort(index, kind="stable")
            index, score, exact, end_col = (
                index[order], score[order], exact[order], end_col[order]
            )
        if strategy is SortStrategy.SCORE_THEN_INDEX_DESC:
            order = np.lexsort((-index, -score))
            index, score, exact, end_col = (
                index[order], score[order], exact[order], end_col[order]
            )
        elif strategy is SortStrategy.INDEX_DESC:
            index, score, exact, end_col = (
                index[::-1], score[::-1], exact[::-1], end_col[::-1]
            )
        return index, score, exact, end_col

    def _xl_candidates(self, corpus) -> np.ndarray:
        """Boolean mask over corpus.xl_indices: rows that could possibly
        satisfy every non-negated pattern's fold-bit multiset within its
        typo budget (the host twin of the device stage-1; sound superset,
        see ops/presence.py). Negated patterns never pre-reject."""
        n_xl = len(corpus.xl_indices)
        keep = np.ones(n_xl, bool)
        counts = None
        for cp in self._compiled:
            if cp.negated or not cp.engine.units.orig:
                continue
            units = cp.engine.units
            t = cp.config.max_typos
            if t is None:
                continue  # unconditional scoring: every row is a candidate
            if counts is None:
                counts = corpus.xl_presence()
            need = np.zeros(128, np.int64)
            for o, f in zip(units.orig, units.flip):
                fo = (o + 0x20 if 0x41 <= o <= 0x5A else o) & 127
                ff = (f + 0x20 if 0x41 <= f <= 0x5A else f) & 127
                if fo == ff:
                    need[fo] += 1
            need = np.minimum(need, 3)
            # only the needle's fold bits matter (<= 16 columns of 128),
            # and the small slice avoids re-casting the whole presence
            # matrix per query
            cols = np.nonzero(need)[0]
            sub = counts[:, cols].astype(np.int16)
            hits = np.minimum(
                sub, need[cols][None, :].astype(np.int16)
            ).sum(axis=1, dtype=np.int32)
            keep &= hits >= int(need.sum()) - int(t)
        return keep

    def match_arrays(
        self, haystacks: Union[Sequence[str], Corpus]
    ) -> tuple:
        """Column-oriented batch matching: the zero-Python-overhead core.

        Returns (index, score, exact, end_col) numpy arrays of all matching
        haystacks, ordered by the configured sort strategy — the exact
        content of the reference's sorted ``Vec<Match>`` (reference:
        src/matcher/mod.rs:205-222) as columns instead of structs. Accepts a
        pre-packed (device-resident) ``Corpus`` to amortize packing across
        queries."""
        n = len(haystacks)
        if not self._compiled:
            idx = np.arange(n, dtype=np.int64)
            if self._config.sort.is_reversed:
                idx = idx[::-1]
            z = np.zeros(n, dtype=np.int64)
            return idx, z, z.astype(bool), z

        if self._fused_supported():
            unicode = self._compiled[0].engine.unicode
            if isinstance(haystacks, Corpus):
                corpus = (
                    haystacks
                    if haystacks.unicode == unicode
                    else self._pack(haystacks.haystacks, unicode)
                )
            else:
                corpus = self._pack(haystacks, unicode)
            return self._fused_match_arrays(corpus)

        res = self._match_result(haystacks)
        idxs = np.nonzero(res.matched)[0]
        score = res.score[idxs]
        strategy = self._config.sort
        if strategy is SortStrategy.SCORE_THEN_INDEX_ASC:
            order = np.lexsort((idxs, -score))
        elif strategy is SortStrategy.SCORE_THEN_INDEX_DESC:
            order = np.lexsort((-idxs, -score))
        elif strategy is SortStrategy.INDEX_ASC:
            order = np.arange(len(idxs))
        else:
            order = np.arange(len(idxs))[::-1]
        idxs = idxs[order]
        return (
            idxs,
            score[order],
            res.exact[idxs],
            res.end_col[idxs],
        )

    def match_list(
        self, haystacks: Union[Sequence[str], Corpus]
    ) -> Sequence[Match]:
        """Batch matching; the most performant path
        (reference: src/matcher/mod.rs:205-222). Returns an array-backed
        lazy :class:`MatchList` (a ``Sequence[Match]``): per-element
        ``Match`` objects are built on access, so huge result sets — and
        the empty-needle copy path, a 16 us memcpy in the reference
        (BENCHMARKS.md:187-205) — cost O(1) Python objects."""
        if not self._compiled:
            # copy path (reference: src/matcher/mod.rs:205-210)
            idx = np.arange(len(haystacks), dtype=np.int64)
            if self._config.sort.is_reversed:
                idx = idx[::-1]
            return MatchList(idx)

        return MatchList(*self.match_arrays(haystacks))

    def match_list_indices(
        self, haystacks: Union[Sequence[str], Corpus]
    ) -> List[MatchIndices]:
        """Batch matching with matched-character indices; not the hot path
        (reference: src/matcher/mod.rs:229-270).

        The device pass selects and orders the matches; the traceback walk
        (host-side, like the reference's alignment_iter) only runs on the
        matching rows."""
        if not self._compiled:
            matches = [MatchIndices(0, i) for i in range(len(haystacks))]
            if self._config.sort.is_reversed:
                matches.reverse()
            return matches
        hay = (
            haystacks.haystacks
            if isinstance(haystacks, Corpus)
            else haystacks
        )
        if self._use_device:
            index = sorted(int(i) for i in self.match_arrays(haystacks)[0])
        else:
            index = [
                i for i in range(len(hay))
                if self.match_one(hay[i], i) is not None
            ]
        if self._config.sort.is_reversed:
            index = index[::-1]
        batched = self._batched_indices(hay, index)
        out: List[MatchIndices] = []
        for i in index:
            m = batched.get(int(i)) if batched else None
            if m is None:
                m = self.match_one_indices(hay[int(i)], int(i))
            if m is not None:
                out.append(m)
        if self._config.sort.is_by_score:
            out.sort(key=lambda m: -m.score)  # stable, score only
        return out

    def _batched_indices(self, hay, index) -> Optional[dict]:
        """Vectorized traceback for the selected matches (single fuzzy
        pattern, device mode); rows the batched walk doesn't cover fall
        back to the per-row oracle. See frizbee_tpu/traceback.py."""
        if (
            not self._use_device
            or len(self._compiled) != 1
            or self._compiled[0].negated
            or not self._compiled[0].config.matching.is_fuzzy
            or len(index) < 32
        ):
            return None
        from .traceback import batched_match_indices

        cp = self._compiled[0]
        rows = [hay[int(i)] for i in index]
        res = batched_match_indices(cp.engine, rows)
        out = {}
        for i, r in zip(index, res):
            if r is not None:
                score, exact, inds = r
                out[int(i)] = MatchIndices(
                    score=score, index=int(i), exact=exact,
                    indices=list(inds),
                )
        return out

    def match_one(self, haystack: str, index: int = 0) -> Optional[Match]:
        if not self._compiled:
            return Match.from_index(index)
        combined = Match.from_index(index)
        for cp in self._compiled:
            m = cp.engine.match_one(haystack, index)
            if cp.negated:
                if m is not None:
                    return None
            else:
                if m is None:
                    return None
                combined.score = sat_add_u16(combined.score, m.score)
                combined.exact |= m.exact
                combined.end_col = max(combined.end_col, m.end_col)
        return combined

    def match_one_indices(
        self, haystack: str, index: int = 0
    ) -> Optional[MatchIndices]:
        if not self._compiled:
            return MatchIndices.from_index(index)
        combined = MatchIndices.from_index(index)
        for cp in self._compiled:
            if cp.negated:
                if cp.engine.match_one(haystack, index) is not None:
                    return None
            else:
                m = cp.engine.match_one_indices(haystack, index)
                if m is None:
                    return None
                combined.score = sat_add_u16(combined.score, m.score)
                combined.exact |= m.exact
                combined.indices.extend(m.indices)
        # reverse order, deduped across patterns
        # (reference: src/matcher/multi.rs:74-77)
        combined.indices = sorted(set(combined.indices), reverse=True)
        return combined

    # Rows per lazy iterator chunk: large enough that the batched engine's
    # fixed per-call cost amortizes (the reference's iterator is ~10% off
    # its list path, src/matcher/mod.rs:272-273; here the same batched
    # engine serves both, so the gap is one chunk's worth of padding)
    # steady-state chunk for the raw-string iterator path: big enough
    # that per-chunk fixed costs (pack dispatch + one link round trip)
    # amortize; corpus size classes keep the program count small
    iter_chunk: int = 65536

    def _iter_chunks(self, haystacks: Iterable[str]):
        """(base_index, chunk) blocks with geometrically growing sizes, so
        the first match from a slow/unbounded stream appears after tens of
        items (per-item-lazy-like), while steady state amortizes the batch
        engine over full-size chunks. Sized inputs (lists) skip the
        small warm-up chunks — the caller already materialized
        everything, so first-match latency is not on the line."""
        it = iter(haystacks)
        base = 0
        try:
            known = len(haystacks)
        except TypeError:
            known = None
        size = self.iter_chunk if known is not None else 32
        while True:
            chunk = list(islice(it, size))
            if not chunk:
                return
            yield base, chunk
            base += len(chunk)
            size = min(size * 4, self.iter_chunk)

    def match_iter(
        self, haystacks: Union[Iterable[str], Corpus]
    ) -> Iterator[Match]:
        """Lazy matching in input order. Streams growing chunks through
        the batched engine (reference: src/matcher/iter.rs semantics —
        unsorted, yields as it goes — at batch-engine throughput).

        A pre-packed resident ``Corpus`` runs as ONE device program
        (laziness in packing is moot — it's already packed) and yields
        lazily from the single fetched result set. Raw-string input
        packs + uploads per chunk with up to two chunks in flight, so
        the host-link round trip overlaps the next chunk's packing —
        on remote-device links the string path is inherently bound by
        shipping the corpus over the link."""
        if not self._use_device or not self._compiled:
            rows = (
                haystacks.haystacks
                if isinstance(haystacks, Corpus)
                else haystacks
            )
            for i, h in enumerate(rows):
                m = self.match_one(h, i)
                if m is not None:
                    yield m
            return
        if isinstance(haystacks, Corpus):
            yield from _yield_matches(*self.match_arrays(haystacks))
            return

        unicode = self._compiled[0].engine.unicode
        fused = self._fused_supported()

        def emit(base, res):
            cols = self._fused_collect(res) if fused else res
            yield from _yield_matches(*cols, base=base)

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        if not fused:
            inflight = deque()
            for base, chunk in self._iter_chunks(haystacks):
                inflight.append((base, self.match_arrays(chunk)))
                if len(inflight) >= 2:
                    b, res = inflight.popleft()
                    yield from emit(b, res)
            while inflight:
                b, res = inflight.popleft()
                yield from emit(b, res)
            return

        # Three-stage pipeline: host pack (thread pool — the native
        # packer releases the GIL) | device dispatch + upload | fetch +
        # yield. Chunk N+2 packs while N+1 runs on device and N's
        # results stream back, so the string path's serial
        # pack->upload->fetch chain overlaps end to end.
        with ThreadPoolExecutor(max_workers=2) as pool:
            packing = deque()   # (base, Future[Corpus])
            inflight = deque()  # (base, pending device handle)

            def drain_packed(block):
                while packing and (block or packing[0][1].done()):
                    b, fut = packing.popleft()
                    inflight.append((b, self._fused_dispatch(fut.result())))
                    block = False

            for base, chunk in self._iter_chunks(haystacks):
                packing.append(
                    (base, pool.submit(self._pack, chunk, unicode))
                )
                drain_packed(block=len(packing) >= 2)
                while len(inflight) >= 3:
                    b, res = inflight.popleft()
                    yield from emit(b, res)
            while packing:
                drain_packed(block=True)
                while len(inflight) >= 3:
                    b, res = inflight.popleft()
                    yield from emit(b, res)
            while inflight:
                b, res = inflight.popleft()
                yield from emit(b, res)

    def match_iter_indices(
        self, haystacks: Union[Iterable[str], Corpus]
    ) -> Iterator[MatchIndices]:
        """Lazy matching with matched-byte indices, in input order. Match
        selection rides the chunked batch engine and the traceback reuses
        the vectorized batched walk (reference: src/matcher/iter.rs).
        A pre-packed ``Corpus`` selects matches in one device program."""
        if not self._use_device or not self._compiled:
            rows = (
                haystacks.haystacks
                if isinstance(haystacks, Corpus)
                else haystacks
            )
            for i, h in enumerate(rows):
                m = self.match_one_indices(h, i)
                if m is not None:
                    yield m
            return
        if isinstance(haystacks, Corpus):
            rows = haystacks.haystacks
            index = sorted(int(i) for i in self.match_arrays(haystacks)[0])
            batched = self._batched_indices(rows, index)
            for i in index:
                m = batched.get(int(i)) if batched else None
                if m is None:
                    m = self.match_one_indices(rows[int(i)], int(i))
                if m is not None:
                    yield m
            return
        for base, chunk in self._iter_chunks(haystacks):
            index = sorted(int(i) for i in self.match_arrays(chunk)[0])
            batched = self._batched_indices(chunk, index)
            for i in index:
                m = batched.get(int(i)) if batched else None
                if m is not None and m.index != int(i) + base:
                    m = MatchIndices(
                        score=m.score, index=int(i) + base, exact=m.exact,
                        indices=m.indices,
                    )
                if m is None:
                    m = self.match_one_indices(chunk[int(i)], int(i) + base)
                if m is not None:
                    yield m

    def match_list_parallel(
        self, haystacks: Sequence[str], shards: int
    ) -> List[Match]:
        """Shard/merge SEMANTICS shim: splits the input, matches each shard
        through the same single-device engine SEQUENTIALLY, and k-merges —
        result-identical to ``match_list`` and to the reference's
        rayon-parallel path (src/matcher/parallel.rs:18-89), but NOT a
        parallel execution (one accelerator serializes device programs
        anyway). The real parallel path — shard_map over a device mesh
        with an all_gather top-k merge — is ``frizbee_tpu.parallel``
        (match_topk_batch_sharded / match_corpus_sharded)."""
        if shards <= 0:
            raise ValueError("shards must be positive")
        shards = max(min(shards, -(-len(haystacks) // 2000)), 1)
        if not haystacks or not self._compiled or shards == 1:
            return self.match_list(haystacks)

        chunk = -(-len(haystacks) // shards)
        runs: List[List[Match]] = []
        for s in range(0, len(haystacks), chunk):
            sub = haystacks[s : s + chunk]
            index, score, exact, end_col = self.match_arrays(sub)
            runs.append([
                Match(
                    score=int(score[j]),
                    index=int(index[j]) + s,
                    exact=bool(exact[j]),
                    end_col=int(end_col[j]),
                )
                for j in range(len(index))
            ])
        return k_merge(runs, self._config.sort)


def k_merge(runs: List[List[Match]], strategy: SortStrategy) -> List[Match]:
    """Merge pre-sorted runs (reference: src/k_merge.rs). Because the merge
    key includes the unique index, the result is the unique total order —
    a flat merge via sort reproduces the loser-heap exactly."""
    merged = [m for run in runs for m in run]
    if strategy is SortStrategy.SCORE_THEN_INDEX_ASC:
        merged.sort(key=lambda m: (-m.score, m.index))
    elif strategy is SortStrategy.SCORE_THEN_INDEX_DESC:
        merged.sort(key=lambda m: (-m.score, -m.index))
    elif strategy is SortStrategy.INDEX_ASC:
        merged.sort(key=lambda m: m.index)
    else:
        merged.sort(key=lambda m: -m.index)
    return merged


def match_list(
    needle: str, haystacks: Sequence[str], config: Optional[Config] = None, **kw
) -> List[Match]:
    """One-shot convenience API (reference: src/lib.rs:60-68)."""
    return Matcher(needle, config, **kw).match_list(haystacks)


def match_list_indices(
    needle: str, haystacks: Sequence[str], config: Optional[Config] = None, **kw
) -> List[MatchIndices]:
    return Matcher(needle, config, **kw).match_list_indices(haystacks)


def match_list_parallel(
    needle: str,
    haystacks: Sequence[str],
    shards: int,
    config: Optional[Config] = None,
    **kw,
) -> List[Match]:
    return Matcher(needle, config, **kw).match_list_parallel(haystacks, shards)


def fuzzy_match(
    haystacks: Iterable[str],
    needle: str,
    config: Optional[Config] = None,
    **kw,
) -> Iterator[Match]:
    """Lazy matching over any string iterable (reference:
    src/matcher/iter.rs FuzzyMatchExt::fuzzy_match). Unsorted; yields in
    input order."""
    return Matcher(needle, config, **kw).match_iter(haystacks)


def fuzzy_match_indices(
    haystacks: Iterable[str],
    needle: str,
    config: Optional[Config] = None,
    **kw,
) -> Iterator[MatchIndices]:
    """Lazy matching with matched-byte indices (reference:
    src/matcher/iter.rs FuzzyMatchExt::fuzzy_match_indices)."""
    return Matcher(needle, config, **kw).match_iter_indices(haystacks)


def _colstream_blocks_and_cap(
    corpus, statics, lens, needles_np, fetch_rows, single
):
    """(buckets_T, finalize_cap) for a fused serving group: transposed
    corpus blocks when the column-stream kernels can serve the pattern
    set, plus the host-chosen static capped-sort budget from the
    stage-1-contributing patterns. ``needles_np`` holds one (Q, 2n)
    host needle array per pattern; ``single`` marks the one-pattern
    non-negated groups that may also take the row-major tier chain
    (they run the batch fast path even without colstream blocks).

    Returns (buckets_T, finalize_cap, perm): finalize_cap is the
    STATIC (cap_blocks, n_sel) pair for the device finalize (None =
    full sort) and perm (None = identity) is the selective-first query
    reordering the caller must apply to its batch BEFORE stacking
    needles — queries [0:n_sel] of that order take the capped sort,
    the rest the full sort (the per-query mixed finalize)."""
    from .ops.batch import (
        FUZZY_MODE,
        _pattern_s1_contributes,
        colstream_eligible_all,
    )
    from .ops.colstream import (
        colstream_literal_supported,
        colstream_supported,
    )

    if single:
        st = statics[0]
        if st[4] != FUZZY_MODE:
            needs_cs = colstream_literal_supported(lens[0])
        else:
            needs_cs = colstream_supported(
                lens[0], min(st[0], lens[0]), st[1]
            )
    else:
        needs_cs = colstream_eligible_all(statics, lens)
    if not needs_cs:
        return None, None, None
    buckets_T = tuple(
        b.device_arrays_colstream() for b in corpus.buckets
    )
    entries = []
    for st, ln, nd in zip(statics, lens, needles_np):
        if _pattern_s1_contributes(st, ln):
            t = 0 if st[4] != FUZZY_MODE else min(st[0], ln)
            entries.append((nd, t))
    res = _colstream_finalize_cap(corpus, entries, fetch_rows)
    if res is None:
        return buckets_T, None, None
    cap, n_sel, perm = res
    return buckets_T, (cap, n_sel), perm


# Mixed-finalize group-count gate: see the comment inside
# _colstream_finalize_cap (measured A/B on the arabic profile)
MIXED_FINALIZE_MIN_GROUPS = 512


def _colstream_finalize_cap(corpus, pattern_needles, fetch_rows):
    """STATIC capped-sort group budget for the in-place serving flow,
    chosen HOST-side: per-group stage-1 alive counts from the corpus's
    NumPy block presence planes x each contributing pattern's needle
    need-matrix, AND-ed across patterns (the exact math the device
    flags use — ops/batch._pattern_s1_contributes decides the list —
    so the cap is sound). ``pattern_needles`` is a list of
    (needles_np (Q, 2n), typos) pairs, one per contributing pattern.
    Returns None (full sort for every query) or ``(cap_blocks, n_sel,
    perm)``: the smallest of {1/4, 1/2} of the total group count such
    that the first ``n_sel`` queries of the ``perm`` ordering
    (selective-needles-first; perm None = identity) fit every alive
    group within ``cap_blocks``. Queries past ``n_sel`` (broad needles
    — e.g. common-particle unicode queries keeping ~94% of groups
    alive) take the full result sort IN THE SAME BATCH (the per-query
    mixed finalize); n_sel quantizes to multiples of 8 so the
    (Q, n_sel) program-shape count stays small. Host-side because an
    in-program lax.cond around the capped gather+sort faults the TPU
    backend (see ops/batch finalize notes)."""
    from .ops.colstream import SUBL
    from .ops.presence import needle_need_matrix_np

    gr = SUBL * 128
    if not pattern_needles:
        return None
    needs = [
        (needle_need_matrix_np(nd), t) for nd, t in pattern_needles
    ]
    Q = pattern_needles[0][0].shape[0]
    alive_tot = np.zeros(Q, np.int64)
    n_gtot = 0
    for b in corpus.buckets:
        blk = b.host_blk_bits().astype(np.int32)  # (nG, PLANES*128)
        n_g = blk.shape[0]
        n_gtot += n_g
        if b.cp.shape[1] <= 1024:  # colstream-served: real flags
            mask = np.ones((n_g, Q), bool)
            for (need, tot), typos in needs:
                mask &= (blk @ need) >= (tot - typos)[None, :]
            alive_tot += mask.sum(axis=0)
        else:  # row-major fallback bucket: flags are all-ones
            alive_tot += n_g
    min_blocks = min(-(-fetch_rows // gr) + 1, n_gtot)
    if min_blocks >= -(-n_gtot // 2):
        return None
    for div in (4, 2):
        cap = max(-(-n_gtot // div), min_blocks)
        if np.all(alive_tot <= cap):
            return int(cap), Q, None
    # mixed finalize: capped sort for the selective queries, full sort
    # for the broad ones, one batch. Quantizing n_sel DOWN moves
    # borderline queries to the (always-correct) full-sort side.
    # Only worth it at scale: below ~512 groups (~500k rows) the full
    # batched sort costs about the same as the flag-argsort + block
    # gather + capped sort it would replace (measured A/B on the
    # 306-group arabic corpus: 1.5-1.7 ms/q either way), so smaller
    # corpora skip the extra program shapes. (Module constant so tests
    # exercise the split on small corpora.)
    if n_gtot < MIXED_FINALIZE_MIN_GROUPS:
        return None
    cap = max(-(-n_gtot // 2), min_blocks)
    fit = alive_tot <= cap
    gran = 8 if Q > 8 else 1
    n_sel = (int(fit.sum()) // gran) * gran
    if n_sel == 0:
        return None
    perm = np.argsort(~fit, kind="stable")
    return int(cap), n_sel, perm


def _yield_matches(index, score, exact, end_col, base=0):
    """Yield Match objects in input (index-ascending) order from result
    columns. With the fastmatch extension the whole column->object
    conversion is ONE C loop (~60 ns/object); the fallback still
    amortizes numpy-scalar unboxing via tolist()."""
    from .types import build_matches

    order = np.argsort(index, kind="stable")
    idx = index[order]
    if base:
        idx = idx + base
    if build_matches is not None:
        yield from build_matches(
            np.ascontiguousarray(idx, np.int64),
            np.ascontiguousarray(score[order], np.int64),
            np.ascontiguousarray(exact[order], np.uint8),
            np.ascontiguousarray(end_col[order], np.int64),
        )
        return
    idx_l = idx.tolist()
    sc_l = score[order].tolist()
    ex_l = exact[order].tolist()
    ec_l = end_col[order].tolist()
    for i in range(len(idx_l)):
        yield Match(
            score=sc_l[i], index=idx_l[i], exact=ex_l[i], end_col=ec_l[i]
        )


def _dispatch_batch_groups(
    matchers: List[Matcher],
    corpus: Corpus,
    config: Config,
    fetch_rows: int,
):
    """Dispatch half of the pipelined-serving engine: group shape-uniform
    queries (same pattern count, per-pattern needle lengths and statics)
    into one scanned device program each and launch them all (async — no
    fetch happens here). Per-query needles are stacked on HOST and shipped
    as one array per group: per-needle jnp ops would each pay a device
    RPC on remote-device links. Returns (pending, results) where pending
    is [(device_out, members), ...] and results is pre-seeded with None
    (queries the fused path can't serve stay None for the per-query
    fallback)."""
    import jax.numpy as jnp

    from .ops.batch import fused_match_sorted_batch

    groups = {}
    results: List[Optional[tuple]] = [None] * len(matchers)
    prepared = {}
    for i, m in enumerate(matchers):
        if not m._fused_supported() or not m._compiled:
            continue
        # Unit-mode mismatch (e.g. ASCII query over a unicode-packed
        # corpus): the fused path would score in the wrong units — leave
        # it to the per-query fallback, which repacks per the reference's
        # dispatch-by-needle rule (src/matcher/mod.rs respects_unicode)
        if m._compiled[0].engine.unicode != corpus.unicode:
            continue
        buckets, _patterns, statics, use_kernel, bst = (
            m._fused_device_args(corpus)
        )
        patterns_host = tuple(
            cp.engine._host_needle() for cp in m._compiled
        )
        key = (
            statics,
            tuple(p[0].shape[0] for p in patterns_host),
            use_kernel,
            bst,
        )
        groups.setdefault(key, []).append(i)
        prepared[i] = (buckets, patterns_host)

    pending = []
    for (statics, _lens, use_kernel, bst), members in groups.items():
        buckets = prepared[members[0]][0]
        n_pat = len(statics)
        # Transposed corpus blocks for the column-stream kernel: built
        # (cached per corpus) only when this group's fast flow can take
        # it (all patterns within the colstream needle/typo budgets)
        buckets_T, fin_cap = (None, None)
        if use_kernel and config.sort.is_by_score:
            needles_np = [
                np.stack([
                    np.concatenate(prepared[i][1][p][:2])
                    for i in members
                ])
                for p in range(n_pat)
            ]
            buckets_T, fin_cap, perm = _colstream_blocks_and_cap(
                corpus, statics, list(_lens), needles_np,
                min(fetch_rows, len(corpus)),
                single=(n_pat == 1 and not statics[0][2]),
            )
            if perm is not None:
                # mixed finalize: selective-needle queries first (the
                # needle stack below follows); the members list carries
                # the new order so result decode needs no un-permute
                members = [members[j] for j in perm]
        stacked = tuple(
            tuple(
                jnp.asarray(
                    np.stack([prepared[i][1][p][a] for i in members])
                )
                for a in range(3)
            )
            for p in range(n_pat)
        )
        out = fused_match_sorted_batch(
            buckets,
            stacked,
            corpus.device_xl_mask(),
            n=len(corpus),
            pattern_statics=statics,
            sort_by_score=config.sort.is_by_score,
            use_kernel=use_kernel,
            unicode=corpus.unicode,
            score_bound=matchers[members[0]]._score_bound(),
            fetch_rows=min(fetch_rows, len(corpus)),
            bucket_statics=bst,
            buckets_T=buckets_T,
            finalize_cap=fin_cap,
        )
        try:
            out.copy_to_host_async()  # start the transfer behind later work
        except AttributeError:
            pass
        pending.append((out, members))
    return pending, results


def _collect_batch_groups(pending, results) -> List[Optional[tuple]]:
    """Fetch half: one device->host read per dispatched group, then decode
    per-query (count, index, score, exact, end_col, greedy) rows."""
    for out, members in pending:
        all_rows = np.asarray(out)  # ONE fetch for the whole group
        for qi, i in enumerate(members):
            block = all_rows[qi]
            count = int(block[0, 0])
            rows = block[1 : 1 + min(count, block.shape[0] - 1)]
            results[i] = (count,) + Matcher._decode_rows(rows)
    return results


def _run_batch_groups(
    matchers: List[Matcher],
    corpus: Corpus,
    config: Config,
    fetch_rows: int,
) -> List[Optional[tuple]]:
    """Dispatch + fetch in one blocking call (the simple serving shape).
    Returns per-query (count, index, score, exact, end_col, greedy) of
    the top ``fetch_rows`` device rows, or None for queries the fused
    device path can't serve (those fall back to the per-query path)."""
    pending, results = _dispatch_batch_groups(
        matchers, corpus, config, fetch_rows
    )
    return _collect_batch_groups(pending, results)


def _resolve_batch(queries, corpus, config):
    matchers = [
        q if isinstance(q, Matcher) else Matcher.from_query(q, config)
        for q in queries
    ]
    if not isinstance(corpus, Corpus):
        unicode = any(
            cp.engine.unicode for m in matchers for cp in m._compiled
        )
        corpus = pack_corpus(corpus, unicode=unicode)
    return matchers, corpus


def match_arrays_batch(
    queries: Sequence[Union[str, "Matcher"]],
    corpus: Union[Sequence[str], Corpus],
    config: Optional[Config] = None,
    fetch_rows: int = 6144,
) -> List[tuple]:
    """Pipelined serving: Q independent queries (strings or prebuilt
    Matchers) against one resident corpus in one device program + one
    fetch. Returns per-query (index, score, exact, end_col) arrays of ALL
    matches, each ordered like ``Matcher.match_arrays``.

    This is the TPU production pattern the per-query API can't reach when
    the host link has latency: dispatch once, stream results once. Queries
    whose result set exceeds ``fetch_rows`` (rare) are transparently re-run
    through the per-query path.
    """
    config = config or Config()
    matchers, corpus = _resolve_batch(queries, corpus, config)
    raw = _run_batch_groups(
        matchers, corpus, config, min(fetch_rows, len(corpus))
    )
    results: List[Optional[tuple]] = [None] * len(queries)
    for i, r in enumerate(raw):
        if r is None:
            continue
        count, index, score, exact, end_col, greedy = r
        if count > len(index):
            continue  # overflow: per-query path below fetches everything
        results[i] = matchers[i]._host_fixups(
            corpus, index, score, exact, end_col, greedy
        )
    for i in range(len(queries)):
        if results[i] is None:
            results[i] = matchers[i].match_arrays(corpus)
    return results


def match_topk_batch(
    queries: Sequence[Union[str, "Matcher"]],
    corpus: Union[Sequence[str], Corpus],
    config: Optional[Config] = None,
    k: int = 2048,
) -> List[tuple]:
    """Top-k pipelined serving: like ``match_arrays_batch`` but each query
    returns ``(total_count, index, score, exact, end_col)`` with at most
    the best ``k`` matches materialized on the host (the full sorted match
    list stays device-resident). The exact total match count always comes
    back; only the transported rows are capped — the serving shape for
    result consumers that page or display top-k, where shipping the full
    match list over a latency/bandwidth-limited host link buys nothing."""
    config = config or Config()
    matchers, corpus = _resolve_batch(queries, corpus, config)
    raw = _run_batch_groups(matchers, corpus, config, min(k, len(corpus)))
    return _finalize_topk(matchers, corpus, raw, k)


def _finalize_topk(matchers, corpus, raw, k) -> List[tuple]:
    results: List[Optional[tuple]] = [None] * len(matchers)
    for i, r in enumerate(raw):
        # Unfetched device rows can hide greedy-flagged matches, and
        # greedy host rescoring can DROP rows — so when matches overflow
        # the fetch window on a corpus that can produce greedy rows, the
        # truncated fetch can't guarantee an exact total or exact near-k
        # ordering. Take the per-query full-fetch path instead (same
        # guard match_arrays_batch applies on overflow).
        if (
            r is not None
            and r[0] > len(r[1])
            and corpus.greedy_risk()
        ):
            r = None
        if r is None:
            index, score, exact, end_col = matchers[i].match_arrays(corpus)
            results[i] = (
                len(index), index[:k], score[:k], exact[:k], end_col[:k]
            )
            continue
        count, index, score, exact, end_col, greedy = r
        fetched = len(index)
        index, score, exact, end_col = matchers[i]._host_fixups(
            corpus, index, score, exact, end_col, greedy
        )
        # greedy rescoring can drop rows and XL rows can add some; keep
        # the exact total in sync with the host fixups' delta
        count += len(index) - fetched
        results[i] = (count, index[:k], score[:k], exact[:k], end_col[:k])
    return results


class BatchFuture:
    """An in-flight ``match_topk_batch_async`` result. The device program
    and the device->host transfer proceed while the caller does other
    work — typically dispatching the next batch, so link round-trip time
    overlaps device execution instead of adding to every batch."""

    def __init__(self, matchers, corpus, k, pending, raw):
        self._matchers = matchers
        self._corpus = corpus
        self._k = k
        self._pending = pending
        self._raw = raw
        self._result = None

    def result(self) -> List[tuple]:
        """Block until ready; same return shape as ``match_topk_batch``."""
        if self._result is None:
            raw = _collect_batch_groups(self._pending, self._raw)
            self._result = _finalize_topk(
                self._matchers, self._corpus, raw, self._k
            )
            self._pending = None
        return self._result


def match_topk_batch_async(
    queries: Sequence[Union[str, "Matcher"]],
    corpus: Union[Sequence[str], Corpus],
    config: Optional[Config] = None,
    k: int = 2048,
) -> BatchFuture:
    """Pipelined serving: dispatch a top-k batch WITHOUT fetching. Keeping
    2-3 batches in flight hides the host-link round trip behind device
    execution (the steady-state production shape on remote accelerators):

        futures = deque()
        for batch in stream:
            futures.append(match_topk_batch_async(batch, corpus, cfg))
            if len(futures) >= DEPTH:
                consume(futures.popleft().result())
    """
    config = config or Config()
    matchers, corpus = _resolve_batch(queries, corpus, config)
    pending, raw = _dispatch_batch_groups(
        matchers, corpus, config, min(k, len(corpus))
    )
    return BatchFuture(matchers, corpus, k, pending, raw)
