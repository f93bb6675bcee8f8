"""Per-pattern match engines.

``FuzzyEngine`` drives packed corpus buckets through the fused device
pipeline (ops/fuzzy.py) and falls back to the host oracle for rows the
device path does not cover: haystacks longer than the largest bucket and
trimmed windows beyond MAX_HAYSTACK_LEN (the greedy path — non-hot by
design, exactly as in the reference where it exists to bound the DP matrix,
src/smith_waterman/greedy.rs:1-4).

``LiteralEngine`` implements exact/prefix/suffix/substring matching
(reference: src/literal/algo.rs) through the batched device op with a host
oracle fallback.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .config import MAX_HAYSTACK_LEN, Config, U16_MAX, sat_add_u16
from .corpus import Corpus
from .oracle import (
    literal_find,
    make_needle_units,
    match_greedy,
    prefilter_window,
    sw_indices,
    sw_score,
    tokenize,
)
from .oracle.smith_waterman import match_end_col, sw_matrices
from .types import Match, MatchIndices


class MatchResult:
    """Column-oriented per-haystack results for one pattern over a corpus."""

    __slots__ = ("matched", "score", "exact", "end_col")

    def __init__(self, n: int):
        self.matched = np.zeros(n, dtype=bool)
        self.score = np.zeros(n, dtype=np.int64)
        self.exact = np.zeros(n, dtype=bool)
        self.end_col = np.zeros(n, dtype=np.int64)


class FuzzyEngine:
    """Fuzzy (Smith-Waterman) matching for one needle + resolved config."""

    def __init__(self, needle: str, config: Config, use_device: bool = True):
        self.needle = needle
        self.config = config
        self.use_device = use_device
        self.case_sensitive = config.casing.respects_case_for(needle)
        self.unicode = config.unicode.respects_unicode_for(needle)
        self.needle_bytes = needle.encode("utf-8")

        # Overflow guard uses the row count the needle actually uses
        # (reference: src/matcher/algo.rs:300-325)
        rows = len(needle) if self.unicode else len(self.needle_bytes)
        scoring = config.scoring
        scoring.guard_against_score_overflow(
            rows, scoring.max_per_char_bonus(), scoring.max_one_time_bonus()
        )

        self.units = make_needle_units(needle, self.unicode, self.case_sensitive)
        self.min_haystack_len = (
            max(len(needle) - config.max_typos, 0)
            if config.max_typos is not None
            else 0
        )
        self._device_args = None

    # -- device path -------------------------------------------------------

    def _device_needle(self):
        if self._device_args is None:
            import jax.numpy as jnp

            from .ops.fuzzy import scoring_vector

            self._device_args = (
                jnp.asarray(np.array(self.units.orig, np.int32)),
                jnp.asarray(np.array(self.units.flip, np.int32)),
                scoring_vector(self.config.scoring),
            )
        return self._device_args

    def _host_needle(self):
        """Host twins of _device_needle's arrays (cached): the batch
        dispatcher stacks per-query needles on host and ships ONE array
        per group — per-needle jnp ops would each pay a device RPC."""
        if getattr(self, "_host_args", None) is None:
            from .ops.fuzzy import SCORING_FIELDS

            self._host_args = (
                np.array(self.units.orig, np.int32),
                np.array(self.units.flip, np.int32),
                np.array(
                    [getattr(self.config.scoring, f)
                     for f in SCORING_FIELDS], np.int32,
                ),
            )
        return self._host_args


    def match_corpus(self, corpus: Corpus) -> MatchResult:
        assert corpus.unicode == self.unicode, "corpus packed for wrong unicode mode"
        n = len(corpus)
        out = MatchResult(n)
        if not self.units.orig:
            return out  # empty needles are handled by the Matcher's copy path

        if self.use_device:
            self._match_buckets_device(corpus, out)
            if len(corpus.xl_indices):
                xi = corpus.xl_indices
                res = self.match_xl_rows(corpus, np.arange(len(xi)))
                if res is None:
                    res = self.match_many(
                        [corpus.haystacks[int(i)] for i in xi]
                    )
                m, s, e, ec = res
                out.matched[xi] = m
                out.score[xi] = s
                out.exact[xi] = e
                out.end_col[xi] = ec
        else:
            # the pure-Python per-row oracle: the differential baseline
            # every batched path above is pinned to
            for bucket in corpus.buckets:
                for i in bucket.indices:
                    if i >= 0:  # skip size-class padding rows
                        self._host_row(corpus.haystacks[int(i)], int(i), out)
            for i in corpus.xl_indices:
                self._host_row(corpus.haystacks[int(i)], int(i), out)
        return out

    def _match_buckets_device(self, corpus: Corpus, out: MatchResult) -> None:
        from .ops.fuzzy import fuzzy_match_bucket

        orig, flip, sc = self._device_needle()
        no_prefilter = self.config.max_typos is None
        typos = 0 if no_prefilter else int(self.config.max_typos)

        for bucket in corpus.buckets:
            dev = bucket.device_arrays()
            matched, score, exact, end_col, needs_greedy, _ws, _we = [
                np.asarray(x)
                for x in fuzzy_match_bucket(
                    *dev[:7],
                    orig,
                    flip,
                    sc,
                    max_typos=typos,
                    no_prefilter=no_prefilter,
                )
            ]
            real = bucket.indices >= 0  # skip size-class padding rows
            idx = bucket.indices[real]
            out.matched[idx] = matched[real]
            out.score[idx] = score[real]
            out.exact[idx] = exact[real]
            out.end_col[idx] = np.minimum(end_col[real], U16_MAX)
            # Greedy rows: rescore on the host (batched)
            gr = np.nonzero(needs_greedy & real)[0]
            if len(gr):
                gi = bucket.indices[gr]
                m, s, e, ec = self.match_many(
                    [corpus.haystacks[int(i)] for i in gi]
                )
                out.matched[gi] = m
                out.score[gi] = s
                out.exact[gi] = e
                out.end_col[gi] = ec

    # -- host path (oracle semantics) ---------------------------------------

    def _host_pipeline(
        self, haystack: str
    ) -> Optional[Tuple[int, bool, int, int, int, bool]]:
        """Shared host pipeline. Returns
        (score, exact, end_col, wstart, wend, used_greedy) or None."""
        data = haystack.encode("utf-8")
        if len(data) < self.min_haystack_len:
            return None

        if self.config.max_typos is None:
            matched, start, end = True, 0, len(data)
        else:
            hay = tokenize(data, self.unicode)
            matched, start, end = prefilter_window(
                self.units, hay, len(data), self.config.max_typos
            )
        if not matched:
            return None

        wstart = max(start - 1, 0)
        include_exact = wstart == 0 and end == len(data)
        include_prefix = wstart == 0
        scoring = self.config.scoring

        if end - wstart > MAX_HAYSTACK_LEN:
            res = match_greedy(
                self.needle_bytes,
                data[wstart:end],
                scoring,
                self.case_sensitive,
                include_prefix,
            )
            if res is None:
                return (0, False, min(wstart, U16_MAX), wstart, end, True)
            score, indices = res
            end_col = min(indices[-1] if indices else 0, U16_MAX)
            end_col = min(end_col + wstart, U16_MAX)
            exact = include_exact and data[wstart:end] == self.needle_bytes
            if exact:
                score = sat_add_u16(score, scoring.exact_match_bonus)
            return (score, exact, end_col, wstart, end, True)

        win = tokenize(data, self.unicode, wstart, end)
        H, _ = sw_matrices(self.units, win, scoring, include_prefix)
        score = max(H[-1]) if H[-1] else 0
        end_col = (
            min(match_end_col(H, win), U16_MAX)
            if score > 0
            else min(wstart, U16_MAX)
        )
        exact = include_exact and data[wstart:end] == self.needle_bytes
        if exact:
            score = min(score + scoring.exact_match_bonus, U16_MAX)
        return (score, exact, end_col, wstart, end, False)

    def _host_row(self, haystack: str, index: int, out: MatchResult) -> None:
        res = self._host_pipeline(haystack)
        if res is None:
            out.matched[index] = False
            return
        score, exact, end_col, _, _, _ = res
        out.matched[index] = True
        out.score[index] = score
        out.exact[index] = exact
        out.end_col[index] = end_col

    def match_one(self, haystack: str, index: int) -> Optional[Match]:
        res = self._host_pipeline(haystack)
        if res is None:
            return None
        score, exact, end_col, _, _, _ = res
        return Match(score=score, index=index, exact=exact, end_col=end_col)

    def match_many(self, haystacks) -> tuple:
        """Batched host pipeline over a list of rows: (matched, score,
        exact, end_col) arrays. Byte-unit engines run the native OpenMP
        batch (native/packer.cpp host_match_batch), codepoint-unit
        engines its unicode twin (host_match_batch_u32); native-less
        hosts fall back to the per-row pipeline, which is also the
        differential oracle the native paths are test-pinned to. This is
        what keeps greedy/XL-heavy corpora (many rows beyond the device
        DP cap or the widest bucket) off per-row Python speed."""
        R = len(haystacks)
        if self.units.orig and R:
            res = self._native_batch(*self._encode_rows(haystacks), None)
            if res is not None:
                return res
        matched = np.zeros(R, bool)
        score = np.zeros(R, np.int64)
        exact = np.zeros(R, bool)
        end_col = np.zeros(R, np.int64)
        for r, h in enumerate(haystacks):
            res = self._host_pipeline(h)
            if res is None:
                continue
            matched[r] = True
            score[r], exact[r], end_col[r] = res[0], res[1], res[2]
        return matched, score, exact, end_col

    def _encode_rows(self, haystacks):
        """(joined, starts, joined_u32, ustarts) ragged buffers for the
        native batch (u32 parts None on the byte-unit path)."""
        R = len(haystacks)
        data = [h.encode("utf-8") for h in haystacks]
        starts = np.zeros(R + 1, np.int64)
        np.cumsum([len(d) for d in data], out=starts[1:])
        if self.unicode:
            u32 = [
                np.frombuffer(h.encode("utf-32-le"), np.uint32)
                for h in haystacks
            ]
            ustarts = np.zeros(R + 1, np.int64)
            np.cumsum([len(u) for u in u32], out=ustarts[1:])
            joined_u32 = (
                np.concatenate(u32) if u32 else np.zeros(0, np.uint32)
            )
        else:
            joined_u32 = ustarts = None
        return b"".join(data), starts, joined_u32, ustarts

    def match_many_indices(self, haystacks) -> Optional[list]:
        """Native batched score + traceback over rows: per row ``None``
        (no match) or ``(score, exact, reversed matched byte offsets)``
        — the MatchIndices contract, typo budget enforced by the walk.
        Returns None when the native path can't serve; callers keep the
        per-row ``match_one_indices`` oracle as the fallback (and the
        differential twin)."""
        if not self.units.orig or not haystacks:
            return None
        cap = max(4 * len(self.units.orig), len(self.needle_bytes), 1)
        res = self._native_batch(
            *self._encode_rows(haystacks), None, indices_cap=cap
        )
        if res is None:
            return None
        m, s, e, ec, idx, icnt = res
        return [
            (int(s[r]), bool(e[r]), idx[r, : icnt[r]].tolist())
            if m[r]
            else None
            for r in range(len(haystacks))
        ]

    def match_xl_rows(self, corpus, positions) -> Optional[tuple]:
        """Native batch over ``corpus.xl_blob()`` rows at ``positions``
        (indices into ``corpus.xl_indices`` order): the rows stay encoded
        once per corpus, per-query candidate subsets select via the
        native row table. Returns None when the native path can't serve
        (no toolchain, empty needle, or a unicode engine over an
        ASCII-packed blob) — callers fall back to ``match_many`` on
        materialized strings, which is also the differential oracle."""
        if not self.units.orig:
            return None
        blob = corpus.xl_blob()
        if self.unicode and "joined_u32" not in blob:
            return None
        return self._native_batch(
            blob["joined"], blob["bstarts"],
            blob.get("joined_u32"), blob.get("ustarts"),
            np.asarray(positions, np.int64),
        )

    def _native_batch(self, joined, bstarts, joined_u32, ustarts, rows,
                      indices_cap=0):
        from . import native
        from .ops.fuzzy import SCORING_FIELDS

        scoring9 = np.array(
            [getattr(self.config.scoring, f) for f in SCORING_FIELDS],
            np.int32,
        )
        orig = np.array(self.units.orig, np.int32)
        flip = np.array(self.units.flip, np.int32)
        if self.unicode:
            from .casefold import case_needle_bytes

            pairs = case_needle_bytes(self.needle_bytes, self.case_sensitive)
            res = native.host_match_batch_u32(
                joined, bstarts, joined_u32, ustarts, orig, flip,
                np.array([o for o, _ in pairs], np.int32),
                np.array([f for _, f in pairs], np.int32),
                scoring9, self.config.max_typos, MAX_HAYSTACK_LEN,
                self.min_haystack_len, self.needle_bytes, rows=rows,
                indices_cap=indices_cap,
            )
        else:
            res = native.host_match_batch(
                joined, bstarts, orig, flip,
                scoring9, self.config.max_typos, MAX_HAYSTACK_LEN,
                self.min_haystack_len, self.needle_bytes, rows=rows,
                indices_cap=indices_cap,
            )
        if res is None:
            return None
        m, s, e, ec = res[:4]
        out = (m, s.astype(np.int64), e, ec.astype(np.int64))
        return out + res[4:] if indices_cap else out

    def match_one_indices(self, haystack: str, index: int) -> Optional[MatchIndices]:
        """Score + traceback indices (reference: src/matcher/algo.rs:196-296)."""
        data = haystack.encode("utf-8")
        if len(data) < self.min_haystack_len:
            return None
        if self.config.max_typos is None:
            matched, start, end = True, 0, len(data)
        else:
            hay = tokenize(data, self.unicode)
            matched, start, end = prefilter_window(
                self.units, hay, len(data), self.config.max_typos
            )
        if not matched:
            return None
        wstart = max(start - 1, 0)
        include_exact = wstart == 0 and end == len(data)
        include_prefix = wstart == 0
        scoring = self.config.scoring

        if end - wstart > MAX_HAYSTACK_LEN:
            res = match_greedy(
                self.needle_bytes,
                data[wstart:end],
                scoring,
                self.case_sensitive,
                include_prefix,
            )
            if res is None:
                return MatchIndices(score=0, index=index, exact=False, indices=[])
            score, fwd = res
            indices = [i + wstart for i in reversed(fwd)]
        else:
            win = tokenize(data, self.unicode, wstart, end)
            score, indices = sw_indices(
                self.units,
                win,
                scoring,
                include_prefix,
                self.config.max_typos,
                haystack_start_pos=0,  # byte_off is already absolute
            )
        exact = include_exact and data[wstart:end] == self.needle_bytes
        if exact:
            score = min(score + scoring.exact_match_bonus, U16_MAX)
        return MatchIndices(score=score, index=index, exact=exact, indices=indices)


class LiteralEngine:
    """Literal matching modes; max_typos is ignored
    (reference: src/literal/mod.rs:1-8)."""

    def __init__(self, needle: str, config: Config, use_device: bool = True):
        self.needle = needle
        self.config = config
        self.use_device = use_device
        self.case_sensitive = config.casing.respects_case_for(needle)
        self.unicode = config.unicode.respects_unicode_for(needle)
        self.needle_bytes = needle.encode("utf-8")
        # Literal overflow guard (reference: src/literal/algo.rs:316-325)
        s = config.scoring
        max_bonus = min(
            max(s.capitalization_bonus, s.delimiter_bonus) + s.matching_case_bonus,
            U16_MAX,
        )
        s.guard_against_score_overflow(len(self.needle_bytes), max_bonus, 0)
        self.min_haystack_len = 0
        self.units = make_needle_units(needle, self.unicode, self.case_sensitive)
        self._device_args = None

    def _device_needle(self):
        if self._device_args is None:
            import jax.numpy as jnp

            from .ops.fuzzy import scoring_vector

            self._device_args = (
                jnp.asarray(np.array(self.units.orig, np.int32)),
                jnp.asarray(np.array(self.units.flip, np.int32)),
                scoring_vector(self.config.scoring),
            )
        return self._device_args

    def _host_needle(self):
        """Host twins of _device_needle's arrays (cached): the batch
        dispatcher stacks per-query needles on host and ships ONE array
        per group — per-needle jnp ops would each pay a device RPC."""
        if getattr(self, "_host_args", None) is None:
            from .ops.fuzzy import SCORING_FIELDS

            self._host_args = (
                np.array(self.units.orig, np.int32),
                np.array(self.units.flip, np.int32),
                np.array(
                    [getattr(self.config.scoring, f)
                     for f in SCORING_FIELDS], np.int32,
                ),
            )
        return self._host_args


    def match_one(self, haystack: str, index: int) -> Optional[Match]:
        data = haystack.encode("utf-8")
        res = literal_find(
            self.needle,
            data,
            self.config.matching,
            self.unicode,
            self.case_sensitive,
            self.config.scoring,
        )
        if res is None:
            return None
        pos, score = res
        exact = pos == 0 and len(self.needle_bytes) == len(data)
        end_col = min(max(pos + len(self.needle_bytes) - 1, 0), U16_MAX)
        return Match(score=score, index=index, exact=exact, end_col=end_col)

    def match_one_indices(self, haystack: str, index: int) -> Optional[MatchIndices]:
        m = self.match_one(haystack, index)
        if m is None:
            return None
        pos = m.end_col - len(self.needle_bytes) + 1
        indices = list(range(pos + len(self.needle_bytes) - 1, pos - 1, -1))
        return MatchIndices(
            score=m.score, index=index, exact=m.exact, indices=indices
        )

    def _unit_pairs(self):
        """Per-unit (orig, flip) byte strings (cached) — the oracle's
        _needle_variants, shared with the native batch."""
        if getattr(self, "_pairs", None) is None:
            from .oracle.literal import _needle_variants

            self._pairs = _needle_variants(
                self.needle, self.unicode, self.case_sensitive
            )
        return self._pairs

    def _decode_native(self, R, res, lens):
        matched, score, pos = res
        nb = len(self.needle_bytes)
        exact = matched & (pos == 0) & (lens == nb)
        end_col = np.minimum(
            np.maximum(pos.astype(np.int64) + nb - 1, 0), U16_MAX
        )
        return (
            matched, score.astype(np.int64), exact,
            np.where(matched, end_col, 0),
        )

    def match_many(self, haystacks) -> tuple:
        """Batched host literal matcher: (matched, score, exact, end_col)
        arrays over a list of rows. The native OpenMP batch
        (native/packer.cpp host_literal_batch) serves byte AND codepoint
        needles (literal units are byte sequences either way); native-
        less hosts fall back to the per-row oracle, which is also the
        differential twin the native path is test-pinned to. Kills the
        per-row Python cliff for unit-mode-mismatched queries and XL
        rows (reference: src/literal/algo.rs:262-313)."""
        from . import native
        from .ops.fuzzy import SCORING_FIELDS

        R = len(haystacks)
        if self.units.orig and R:
            data = [h.encode("utf-8") for h in haystacks]
            starts = np.zeros(R + 1, np.int64)
            np.cumsum([len(d) for d in data], out=starts[1:])
            res = native.host_literal_batch(
                b"".join(data), starts, self._unit_pairs(),
                self.config.matching.value,
                np.array(
                    [getattr(self.config.scoring, f)
                     for f in SCORING_FIELDS], np.int32,
                ),
                len(self.needle_bytes),
            )
            if res is not None:
                return self._decode_native(
                    R, res, np.diff(starts).astype(np.int64)
                )
        matched = np.zeros(R, bool)
        score = np.zeros(R, np.int64)
        exact = np.zeros(R, bool)
        end_col = np.zeros(R, np.int64)
        for r, h in enumerate(haystacks):
            m = self.match_one(h, r)
            if m is not None:
                matched[r] = True
                score[r], exact[r], end_col[r] = m.score, m.exact, m.end_col
        return matched, score, exact, end_col

    def match_xl_rows(self, corpus: Corpus, positions) -> Optional[tuple]:
        """Native literal batch over ``corpus.xl_blob()`` rows at
        ``positions`` (indices into ``corpus.xl_indices`` order): literal
        units are byte sequences, so one UTF-8 blob serves byte and
        codepoint needles alike. Returns None when the native library is
        unavailable — callers fall back to ``match_many`` on
        materialized strings."""
        from . import native
        from .ops.fuzzy import SCORING_FIELDS

        if not self.units.orig:
            return None
        blob = corpus.xl_blob()
        rows = np.asarray(positions, np.int64)
        res = native.host_literal_batch(
            blob["joined"], blob["bstarts"], self._unit_pairs(),
            self.config.matching.value,
            np.array(
                [getattr(self.config.scoring, f)
                 for f in SCORING_FIELDS], np.int32,
            ),
            len(self.needle_bytes),
            rows=rows,
        )
        if res is None:
            return None
        bstarts = np.asarray(blob["bstarts"], np.int64)
        lens = (bstarts[rows + 1] - bstarts[rows]).astype(np.int64)
        return self._decode_native(len(rows), res, lens)

    def match_corpus(self, corpus: Corpus) -> MatchResult:
        out = MatchResult(len(corpus))
        if not self.units.orig:
            return out
        if self.use_device and corpus.unicode == self.unicode:
            from .ops.fuzzy import SCORING_FIELDS
            from .ops.literal import literal_match_bucket

            orig, flip, sc = self._device_needle()
            scoring = tuple(
                int(getattr(self.config.scoring, f)) for f in SCORING_FIELDS
            )
            for bucket in corpus.buckets:
                dev = bucket.device_arrays()
                m, s, e, ec, _g, _ws, _we = [
                    np.asarray(x)
                    for x in literal_match_bucket(
                        *dev[:7], orig, flip, sc,
                        mode=self.config.matching.value,
                        needle_byte_len=len(self.needle_bytes),
                        scoring=scoring,
                    )
                ]
                real = bucket.indices >= 0  # skip size-class padding rows
                idx = bucket.indices[real]
                out.matched[idx] = m[real]
                out.score[idx] = s[real]
                out.exact[idx] = (e & m)[real]
                out.end_col[idx] = ec[real]
            rows = corpus.xl_indices
        else:
            rows = np.arange(len(corpus.haystacks))
        rows = np.asarray(rows, np.int64)
        if len(rows):
            # batched host path (native OpenMP host_literal_batch; falls
            # back to the per-row oracle loop inside match_many) — kills
            # the per-row Python cliff for unit-mode-mismatched queries
            # and XL rows
            m, s, e, ec = self.match_many(
                [corpus.haystacks[int(i)] for i in rows]
            )
            out.matched[rows] = m
            out.score[rows] = np.where(m, s, 0)
            out.exact[rows] = e & m
            out.end_col[rows] = np.where(m, ec, 0)
        return out


def make_engine(needle: str, config: Config, use_device: bool = True):
    if config.matching.is_fuzzy:
        return FuzzyEngine(needle, config, use_device)
    return LiteralEngine(needle, config, use_device)
