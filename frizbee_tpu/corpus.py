"""Corpus packing: ragged strings -> fixed-shape unit arrays.

The TPU engine scores thousands of haystacks per kernel invocation
(inter-sequence parallelism — the layout the reference rejected for CPU
because of interleave/bucketing cost, reference README.md:179, but which is
the natural fit for a 8x128-lane vector unit). This module turns a ragged
corpus into length-bucketed, padded arrays of *units* (bytes on the ASCII
path, codepoints on the unicode path; see oracle/tokenize.py for the unit
model) using vectorized NumPy, so packing keeps up with the device.

A packed `Corpus` is query-independent: build once, match many queries —
the production serving pattern.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# Unit-width buckets. Widths beyond MAX_HAYSTACK_LEN form the "XL" bucket,
# where windows larger than the DP cap fall back to the greedy matcher
# (reference: src/smith_waterman/algo/mod.rs:18).
DEFAULT_BUCKETS: Tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024)
# Default corpora pack every power-of-two width: W >= 128 buckets map one
# row per kernel vector row; narrower buckets sub-lane pack G = 128//W
# rows per vector (ops/kernels.pack_rows_for_kernel), so short rows cost
# ~W/128 of a full vector row instead of a whole one.
LANE_BUCKETS: Tuple[int, ...] = DEFAULT_BUCKETS
ASCII_BUCKETS = LANE_BUCKETS  # back-compat alias


def max_bucket_rows(width: int) -> int:
    """Row cap per packed bucket: row ids and unit counts must co-pack
    into one 31-bit sort key on the batched serving path (ops/batch.py
    P1), and (Q, B) sort operands should stay memory-sane. Oversized
    buckets split into chained buckets of the same width."""
    return min(1 << 20, 1 << (30 - (width).bit_length()))


def _size_class(b: int) -> int:
    """Smallest {2^k * m/4 : m in 4..7} >= b (min 256): coarse row-count
    classes bound padding waste at 25% while collapsing program shapes so
    the persistent compilation cache hits across corpora."""
    c = 256
    while True:
        for m in (4, 5, 6, 7):
            cand = (c * m) // 4
            if cand >= b:
                return cand
        c *= 2


def _utf8_lead_byte(cp: np.ndarray) -> np.ndarray:
    """First UTF-8 byte of each codepoint (vectorized)."""
    out = np.where(cp < 0x80, cp, 0)
    out = np.where((cp >= 0x80) & (cp < 0x800), 0xC0 | (cp >> 6), out)
    out = np.where((cp >= 0x800) & (cp < 0x10000), 0xE0 | (cp >> 12), out)
    out = np.where(cp >= 0x10000, 0xF0 | (cp >> 18), out)
    return out.astype(np.int32)


def _utf8_last_byte(cp: np.ndarray) -> np.ndarray:
    """Last UTF-8 byte of each codepoint (vectorized)."""
    return np.where(cp < 0x80, cp, 0x80 | (cp & 0x3F)).astype(np.int32)


def _utf8_len(cp: np.ndarray) -> np.ndarray:
    out = np.ones_like(cp)
    out = np.where(cp >= 0x80, 2, out)
    out = np.where(cp >= 0x800, 3, out)
    out = np.where(cp >= 0x10000, 4, out)
    return out.astype(np.int32)


def _cluster_order(counts: np.ndarray, nu: np.ndarray, leaf: int,
                   unicode: bool) -> np.ndarray:
    """Row order clustering rows with similar fold-bit presence into
    ``leaf``-sized groups, so group-OR presence planes reject whole
    groups for most queries.

    A 16-key lexsort over presence bits (unit count innermost). The bit
    RANKING is the lever, measured on real query workloads:

    - byte corpora -> LOWEST-supported bits (>= 2%) first. Query letters
      are discriminative (users type distinctive terms), and low-support
      bits are the ones whose absence kills whole groups: partial-match
      groups go 97% -> 9% alive vs the balanced ranking, chromium w64
      42% -> 23%.
    - codepoint corpora -> most BALANCED bits first. Hashed script
      codepoints spread thin (every bit is low-support), so balance
      captures structure: korean groups 95% -> 25% alive vs lowfreq.

    (A pack-time audition against substrings sampled from the corpus's
    own rows was tried and rejected: corpus-letter-biased samples form
    weak conjunctions and rank the orderings backwards.)"""
    b = counts.shape[0]
    if b <= leaf:
        return np.argsort(nu, kind="stable").astype(np.int64)
    masks = counts > 0
    freq = masks.mean(axis=0)
    if unicode:
        rank = np.argsort(np.abs(freq - 0.5), kind="stable")
    else:
        cand = np.where(freq >= 0.02)[0]
        if len(cand) == 0:
            cand = np.arange(counts.shape[1])
        rank = cand[np.argsort(freq[cand], kind="stable")]
    keys = [masks[:, rank[c]] for c in range(min(16, len(rank)))]
    return np.lexsort([nu] + keys[::-1])


@dataclass
class PackedBucket:
    """One length bucket of the corpus, padded to ``width`` units."""

    width: int
    # Original corpus indices of the rows, shape (B,)
    indices: np.ndarray
    # Unit values (byte or codepoint), (B, W) int32, zero-padded
    cp: np.ndarray
    # First byte of each unit, (B, W) int32
    first_byte: np.ndarray
    # Last byte of the previous unit, -1 when none, (B, W) int32
    prev_last_byte: np.ndarray
    # Byte offset of each unit within its haystack, (B, W) int32
    byte_off: np.ndarray
    # Byte length of each unit, (B, W) int32
    byte_len: np.ndarray
    # Units per haystack, (B,) int32
    n_units: np.ndarray
    # Bytes per haystack, (B,) int32
    n_bytes: np.ndarray

    @property
    def size(self) -> int:
        return int(self.indices.shape[0])

    def ident_static(self):
        """(ident_base, n_real): when the bucket's real rows are the
        contiguous corpus range [base, base + n_real) in order (the
        single-bucket / chained-split case), the serving fast path
        computes ``index = row + base`` instead of gathering indices.
        ident_base is -1 when the rows aren't contiguous."""
        if not hasattr(self, "_ident"):
            n_real = int(np.sum(self.indices >= 0))
            if n_real == 0:
                self._ident = (-1, 0)
            else:
                base = int(self.indices[0])
                ident = bool(
                    np.array_equal(
                        self.indices[:n_real],
                        np.arange(base, base + n_real, dtype=np.int64),
                    )
                )
                self._ident = (base if ident else -1, n_real)
        return self._ident

    def _full_arrays(self):
        """Int32 unit arrays incl. byte context. The native ASCII packer
        stores only the int8 byte matrix; the context arrays (first byte ==
        the byte, previous byte, offsets, unit length 1) derive here on
        first (rare) use by the generic jnp pipeline."""
        if self.first_byte is not None:
            return (self.cp, self.first_byte, self.prev_last_byte,
                    self.byte_off, self.byte_len)
        cp32 = self.cp.astype(np.int32) & 0xFF
        b, w = cp32.shape
        valid = (
            np.arange(w, dtype=np.int32)[None, :] < self.n_units[:, None]
        )
        cp32 = np.where(valid, cp32, 0)
        prev = np.concatenate(
            [np.full((b, 1), -1, np.int32), cp32[:, :-1]], axis=1
        )
        prev = np.where(valid, prev, -1)
        boff = np.where(valid, np.arange(w, dtype=np.int32)[None, :], 0)
        blen = valid.astype(np.int32)
        return cp32, cp32, prev, boff, blen

    def device_arrays(self):
        """Device-resident copies of the packed arrays (cached). Order matches
        the ``fuzzy_pipeline`` signature; last entry is the row indices."""
        if not hasattr(self, "_device"):
            import jax.numpy as jnp

            cp, first, prev, boff, blen = self._full_arrays()
            self._device = (
                jnp.asarray(cp),
                jnp.asarray(first),
                jnp.asarray(prev),
                jnp.asarray(boff),
                jnp.asarray(blen),
                jnp.asarray(self.n_units),
                jnp.asarray(self.n_bytes),
                jnp.asarray(self.indices.astype(np.int32)),
            )
        return self._device

    def device_arrays_ascii(self):
        """Kernel-path device arrays: (cp int8 (B,W), n_units (B,1) i32,
        indices (B,) i32, mask4 (B,4) i32 presence masks). Only meaningful
        for byte-unit (ASCII) packing."""
        if not hasattr(self, "_device_ascii"):
            import jax.numpy as jnp

            from .ops.presence import presence_bits, presence_mask

            cp8 = (
                self.cp
                if self.cp.dtype == np.int8
                else self.cp.astype(np.uint8).astype(np.int8)
            )
            cp_d = jnp.asarray(cp8)
            nu_d = jnp.asarray(self.n_units.astype(np.int32)[:, None])
            mask4 = presence_mask(cp_d, nu_d)
            self._device_ascii = (
                cp_d,
                nu_d,
                jnp.asarray(self.indices.astype(np.int32)),
                mask4,
                presence_bits(mask4),
            )
        return self._device_ascii

    def device_arrays_colstream(self):
        """Transposed (column-stream) blocks for ops/colstream: (cpT
        (nG*W, SUBL, 128) int32, nuT (nG*SUBL, 128) int32, idxT (B,)
        int32, blk_bits (nG, PLANES*128) int8, ctxT (nG*W, SUBL, 128)
        int8 UTF-8 bonus-context plane — None for byte corpora). Row
        groups of SUBL*128
        pack unit-major: group g's unit column j lives at cpT[g*W + j]
        with row g*GR + s*128 + l at [s, l] — the layout the in-place
        serving flow streams when every row runs the DP (lanes =
        haystacks; ~5-10x the row-major kernel there, see
        benchmarks/probe_colstream_tpu.py).

        Rows are CONTENT-CLUSTERED before blocking: a lexicographic sort
        on the ~16 most balanced fold-presence bits (then unit count)
        groups rows with similar alphabets, so (a) each SUBL*128 group's
        block-OR presence planes (``blk_bits``, the capped-count layout
        of ops/presence) reject WHOLE groups for most queries — the
        serving flow feeds per-group alive flags to the kernel, which
        skips dead groups outright (measured: ~73% of chromium-profile
        groups skip for path-shaped needles) — and (b) the kernel's
        per-group dynamic column bound tracks actual row lengths. idxT
        maps colstream slot -> corpus index. Padding rows carry 0 units
        and 0 presence. Soundness: group-max capped counts >= any member
        row's counts, so a group failing ``hits >= tot - typos`` cannot
        contain a stage-1 survivor (presence is itself a sound superset
        of the positional prefilter)."""
        from .ops import colstream as _cs
        from .ops.presence import PLANES

        key = getattr(self, "_device_colstream_key", None)
        if key == _cs.SUBL:
            return self._device_colstream
        import jax.numpy as jnp

        gr = _cs.SUBL * 128
        cp32 = (
            self.cp.astype(np.int32) & 0xFF
            if self.cp.dtype == np.int8
            else self.cp.astype(np.int32)
        )
        b, w = cp32.shape
        nu = self.n_units.astype(np.int32)

        # per-row capped fold-bit counts (sentinel bin 128 swallows the
        # padding columns; same bincount trick as the XL presence path).
        # Chunked: one giant bincount allocates b*129 int64 bins and
        # scatters cache-hostile — 64k-row chunks run ~4x faster.
        upper = (cp32 >= 0x41) & (cp32 <= 0x5A)
        fold = np.where(upper, cp32 + 0x20, cp32) & 127
        fold = np.where(
            np.arange(w, dtype=np.int32)[None, :] < nu[:, None], fold, 128
        )
        counts = np.empty((b, 128), np.uint8)
        step = 65536
        for s in range(0, b, step):
            e = min(s + step, b)
            rows_c = e - s
            row_of = np.repeat(np.arange(rows_c, dtype=np.int64), w)
            c = np.bincount(
                row_of * 129 + fold[s:e].ravel(), minlength=rows_c * 129
            ).reshape(rows_c, 129)[:, :128]
            counts[s:e] = np.minimum(c, PLANES)

        # content-clustered order (see _cluster_order for the ranking
        # policy and its measurements)
        order = _cluster_order(
            counts, nu, gr, unicode=self.cp.dtype != np.int8
        )

        cp32 = cp32[order]
        nup = nu[order]
        idxt = self.indices.astype(np.int32)[order]
        counts = counts[order]
        pad = (-b) % gr
        if pad:
            cp32 = np.pad(cp32, ((0, pad), (0, 0)))
            nup = np.pad(nup, (0, pad))
            counts = np.pad(counts, ((0, pad), (0, 0)))
            # padding slots carry index -1 (masked by every consumer), so
            # result columns stay group-aligned for block-level selection
            idxt = np.pad(idxt, (0, pad), constant_values=-1)
        ng = cp32.shape[0] // gr
        cpt = np.ascontiguousarray(
            cp32.reshape(ng, _cs.SUBL, 128, w).transpose(0, 3, 1, 2)
        ).reshape(ng * w, _cs.SUBL, 128)
        ctxt = None
        if self.cp.dtype != np.int8:
            # Pack-time UTF-8 bonus context plane (codepoint corpora):
            # one int8 per unit holding the per-column facts the kernel
            # otherwise re-derives ~20 element-ops per column per pass
            # (lead/last byte chains + case/delimiter tests) — bit0
            # is_upper(first byte), bit1 delim(first), bit2 lower(last),
            # bit3 delim(last), bits4-6 UTF-8 byte length. Padding units
            # (cp 0) get the cp-0 values; the kernel reads the plane
            # only under the same valid/occ gates as the derived path.
            first = _utf8_lead_byte(cp32)
            last = _utf8_last_byte(cp32)

            def _dl(bb):
                letter = (
                    ((bb >= 0x41) & (bb <= 0x5A))
                    | ((bb >= 0x61) & (bb <= 0x7A))
                )
                digit = (bb >= 0x30) & (bb <= 0x39)
                return (bb >= 0) & (bb <= 127) & ~letter & ~digit

            ctx = (
                ((first >= 0x41) & (first <= 0x5A)).astype(np.int8)
                * _cs.CTX_UPPER_FIRST
            )
            ctx |= _dl(first).astype(np.int8) * _cs.CTX_DELIM_FIRST
            ctx |= (
                ((last >= 0x61) & (last <= 0x7A)).astype(np.int8)
                * _cs.CTX_LOWER_LAST
            )
            ctx |= _dl(last).astype(np.int8) * _cs.CTX_DELIM_LAST
            ctx |= _utf8_len(cp32).astype(np.int8) << _cs.CTX_BLEN_SHIFT
            ctxt = np.ascontiguousarray(
                ctx.reshape(ng, _cs.SUBL, 128, w).transpose(0, 3, 1, 2)
            ).reshape(ng * w, _cs.SUBL, 128)
        if self.cp.dtype == np.int8:
            # byte units ride HBM as int8 (the kernel upcasts per column
            # in VMEM) — 4x less kernel read traffic than int32
            cpt = cpt.astype(np.int8)
        blk_counts = counts.reshape(ng, gr, 128).max(axis=1)
        blk_bits = np.concatenate(
            [(blk_counts > k) for k in range(PLANES)], axis=1
        ).astype(np.int8)
        self._device_colstream = (
            jnp.asarray(cpt),
            jnp.asarray(nup.reshape(ng * _cs.SUBL, 128)),
            jnp.asarray(idxt),
            jnp.asarray(blk_bits),
            jnp.asarray(ctxt) if ctxt is not None else None,
        )
        # host copy: the dispatcher picks the STATIC result-sort
        # capacity from per-group alive counts before the program runs
        self._blk_bits_np = blk_bits
        self._device_colstream_key = _cs.SUBL
        return self._device_colstream

    def host_blk_bits(self) -> np.ndarray:
        """NumPy copy of the colstream group presence planes (built on
        first use alongside the device blocks)."""
        if not hasattr(self, "_blk_bits_np"):
            self.device_arrays_colstream()
        return self._blk_bits_np

    def device_arrays_units(self):
        """Kernel-path device arrays for codepoint (unicode) packing:
        (cp int32 (B,W), n_units (B,1) i32, indices (B,) i32,
        mask4 (B,4) i32 presence masks)."""
        if not hasattr(self, "_device_units"):
            import jax.numpy as jnp

            from .ops.presence import presence_bits, presence_mask

            cp_d = jnp.asarray(self.cp.astype(np.int32))
            nu_d = jnp.asarray(self.n_units.astype(np.int32)[:, None])
            mask4 = presence_mask(cp_d, nu_d)
            self._device_units = (
                cp_d,
                nu_d,
                jnp.asarray(self.indices.astype(np.int32)),
                mask4,
                presence_bits(mask4),
            )
        return self._device_units


@dataclass
class Corpus:
    """A packed corpus ready for device matching."""

    haystacks: List[str]
    unicode: bool
    buckets: List[PackedBucket]
    # Indices of haystacks longer than the largest bucket (host path)
    xl_indices: np.ndarray

    def __len__(self) -> int:
        return len(self.haystacks)

    def greedy_risk(self) -> bool:
        """True when any bucketed row could take the greedy path (trimmed
        window > the 1024-byte DP cap — only possible when a row has more
        bytes than the cap, i.e. multi-byte-heavy unicode rows). Top-k
        serving consults this: greedy rescoring can DROP rows, so a
        truncated fetch can only be trusted for exact totals when no
        unfetched row can be greedy."""
        if not hasattr(self, "_greedy_risk"):
            self._greedy_risk = any(
                b.size and int(b.n_bytes.max()) > 1024
                for b in self.buckets
            )
        return self._greedy_risk

    def xl_presence(self):
        """(n_xl, 128) uint8 capped fold-bit occurrence counts for the XL
        (host-path) rows, computed lazily off the resident encoded blob
        (one vectorized bincount, no per-row Python). Lets the matcher
        presence-reject XL rows before paying the per-row host pipeline —
        the host-side twin of the device stage-1 (ops/presence.py)."""
        if not hasattr(self, "_xl_presence"):
            n_xl = len(self.xl_indices)
            blob = self.xl_blob()
            if self.unicode:
                units = blob["joined_u32"].astype(np.int64)
                starts = blob["ustarts"]
            else:
                units = np.frombuffer(
                    blob["joined"], dtype=np.uint8
                ).astype(np.int64)
                starts = blob["bstarts"]
            fold = np.where(
                (units >= 0x41) & (units <= 0x5A), units + 0x20, units
            ) & 127
            row_of = np.repeat(np.arange(n_xl, dtype=np.int64),
                               np.diff(starts))
            flat = np.bincount(row_of * 128 + fold, minlength=n_xl * 128)
            # capped at the device planes' depth (ops/presence.PLANES)
            self._xl_presence = np.minimum(
                flat.reshape(n_xl, 128), 3
            ).astype(np.uint8)
        return self._xl_presence

    def xl_blob(self):
        """Lazily cached encoded blob of the XL (host-path) rows, in
        ``xl_indices`` order: dict with ``joined``/``bstarts`` (UTF-8) and,
        for unicode corpora, ``joined_u32``/``ustarts``. Serving batches
        rescore per-query XL candidate subsets through the native host
        pipeline; the blob makes each row's encoding a one-time cost
        instead of a per-query one."""
        if not hasattr(self, "_xl_blob"):
            data = [self.haystacks[int(i)].encode("utf-8")
                    for i in self.xl_indices]
            bstarts = np.zeros(len(data) + 1, np.int64)
            np.cumsum([len(d) for d in data], out=bstarts[1:])
            blob = {"joined": b"".join(data), "bstarts": bstarts}
            if self.unicode:
                u32 = [
                    np.frombuffer(
                        self.haystacks[int(i)].encode("utf-32-le"),
                        np.uint32,
                    )
                    for i in self.xl_indices
                ]
                ustarts = np.zeros(len(u32) + 1, np.int64)
                np.cumsum([len(u) for u in u32], out=ustarts[1:])
                blob["joined_u32"] = (
                    np.concatenate(u32) if u32 else np.zeros(0, np.uint32)
                )
                blob["ustarts"] = ustarts
            self._xl_blob = blob
        return self._xl_blob

    def device_xl_mask(self):
        """Device-resident (n,) bool mask of XL (host-path) rows, cached."""
        if not hasattr(self, "_xl_mask"):
            import jax.numpy as jnp

            m = np.zeros(len(self.haystacks), dtype=bool)
            m[self.xl_indices] = True
            self._xl_mask = jnp.asarray(m)
        return self._xl_mask

    # -- persistence (the checkpoint analog: pack once, serve from any
    # process; combined with the persistent compilation cache a reload
    # skips both packing and compiles). Reference scope: serde derives on
    # its types (src/lib.rs:107-108) — a packed corpus is this engine's
    # equivalent long-lived state.
    _SAVE_VERSION = 1

    def save(self, path: str) -> None:
        """Write the packed corpus to ``path`` (npz format; the exact
        path is used verbatim — no .npz suffix is appended)."""
        data = [h.encode("utf-8") for h in self.haystacks]
        blob = b"".join(data)
        lens = np.fromiter(
            (len(d) for d in data), dtype=np.int64, count=len(data),
        )
        arrs: Dict[str, np.ndarray] = {
            "version": np.int64(self._SAVE_VERSION),
            "unicode": np.int64(int(self.unicode)),
            "hay_blob": np.frombuffer(blob, dtype=np.uint8),
            "hay_lens": lens,
            "xl_indices": self.xl_indices,
            "n_buckets": np.int64(len(self.buckets)),
        }
        for i, b in enumerate(self.buckets):
            arrs[f"b{i}_width"] = np.int64(b.width)
            arrs[f"b{i}_indices"] = b.indices
            arrs[f"b{i}_cp"] = b.cp
            arrs[f"b{i}_n_units"] = b.n_units
            arrs[f"b{i}_n_bytes"] = b.n_bytes
            # context arrays are None on the native int8 ASCII layout
            # (they re-derive lazily); presence is flagged per bucket
            if b.first_byte is not None:
                arrs[f"b{i}_first"] = b.first_byte
                arrs[f"b{i}_prev"] = b.prev_last_byte
                arrs[f"b{i}_boff"] = b.byte_off
                arrs[f"b{i}_blen"] = b.byte_len
        # write through a handle: np.savez(str) silently appends ".npz"
        # when the suffix is missing, which would break load(same_path)
        with open(path, "wb") as fh:
            np.savez(fh, **arrs)

    @classmethod
    def load(cls, path: str) -> "Corpus":
        """Read a corpus previously written by :meth:`save`."""
        with np.load(path) as z:
            version = int(z["version"])
            if version != cls._SAVE_VERSION:
                raise ValueError(
                    f"unsupported corpus file version {version}"
                )
            blob = z["hay_blob"].tobytes()
            lens = z["hay_lens"]
            ends = np.cumsum(lens)
            haystacks = [
                blob[e - l: e].decode("utf-8")
                for l, e in zip(lens.tolist(), ends.tolist())
            ]
            buckets = []
            for i in range(int(z["n_buckets"])):
                has_ctx = f"b{i}_first" in z
                buckets.append(PackedBucket(
                    width=int(z[f"b{i}_width"]),
                    indices=z[f"b{i}_indices"],
                    cp=z[f"b{i}_cp"],
                    first_byte=z[f"b{i}_first"] if has_ctx else None,
                    prev_last_byte=z[f"b{i}_prev"] if has_ctx else None,
                    byte_off=z[f"b{i}_boff"] if has_ctx else None,
                    byte_len=z[f"b{i}_blen"] if has_ctx else None,
                    n_units=z[f"b{i}_n_units"],
                    n_bytes=z[f"b{i}_n_bytes"],
                ))
            return cls(
                haystacks=haystacks,
                unicode=bool(int(z["unicode"])),
                buckets=buckets,
                xl_indices=z["xl_indices"],
            )


def pack_corpus(
    haystacks: Sequence[str],
    unicode: bool,
    bucket_widths: Optional[Sequence[int]] = None,
) -> Corpus:
    if bucket_widths is None:
        bucket_widths = LANE_BUCKETS
    from . import native

    n = len(haystacks)
    if n >= 1 << 31:
        # indices pack as int32 throughout the device pipeline (and into
        # the batched sort keys); past 2^31 rows they would silently
        # mis-sort (reference raises likewise: src/matcher/mod.rs:437-446)
        raise ValueError(
            f"corpus has {n} haystacks; the maximum supported is 2^31 - 1"
        )
    if n == 0:
        return Corpus(list(haystacks), unicode, [], np.zeros(0, np.int64))

    if unicode:
        # Unit = codepoint. UTF-32 round trip vectorizes the decode.
        unit_counts = np.fromiter(
            (len(h) for h in haystacks), dtype=np.int64, count=n
        )
        joined = "".join(haystacks)
        cp_flat = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(
            np.int32
        )
        joined_b = None
    else:
        # Unit = byte. The flat int32 view and all byte-context arrays are
        # only needed by the NumPy fallback packer (the native packer works
        # off joined_b directly, and ASCII context derives lazily on
        # device upload) — at 10M+ rows the generic prep is tens of GB of
        # host temporaries, so it is built on demand (see _flat()).
        data = [h.encode("utf-8") for h in haystacks]
        unit_counts = np.fromiter((len(d) for d in data), dtype=np.int64, count=n)
        joined_b = b"".join(data)
        cp_flat = None

    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(unit_counts, out=starts[1:])

    _flat_cache = {}

    def _flat():
        """Flat per-unit context arrays for the NumPy fallback packer
        (cp, first, prev_last, byte_off, len). Lazy: skipped entirely
        when the native packer serves every chunk."""
        if _flat_cache:
            return _flat_cache
        if unicode:
            cpf = cp_flat
            first_flat = _utf8_lead_byte(cpf)
            last_flat = _utf8_last_byte(cpf)
            len_flat = _utf8_len(cpf)
        else:
            cpf = np.frombuffer(joined_b, dtype=np.uint8).astype(np.int32)
            first_flat = cpf
            last_flat = cpf
            len_flat = np.ones_like(cpf)
        row_of_unit = np.repeat(np.arange(n), unit_counts)
        # byte offsets within each haystack: global exclusive cumsum of
        # unit byte lengths, rebased to each row's start
        glob_off = np.zeros(cpf.shape[0] + 1, dtype=np.int64)
        np.cumsum(len_flat, out=glob_off[1:])
        byte_off_flat = glob_off[:-1] - glob_off[starts[:-1]][row_of_unit]
        # previous unit's last byte, -1 at row starts
        prev_last_flat = np.empty_like(last_flat)
        if cpf.size:
            prev_last_flat[1:] = last_flat[:-1]
            prev_last_flat[0] = -1
            prev_last_flat[starts[:-1][unit_counts > 0]] = -1
        _flat_cache.update(
            cp=cpf, first=first_flat, prev=prev_last_flat,
            boff=byte_off_flat, blen=len_flat, glob_off=glob_off,
        )
        return _flat_cache

    if unicode:
        nbytes = native.utf8_lengths(
            cp_flat.view(np.uint32)
            if cp_flat.dtype == np.int32 else cp_flat.astype(np.uint32),
            starts,
        )
        if nbytes is None:
            g = _flat()["glob_off"]
            nbytes = g[starts[1:]] - g[starts[:-1]]
    else:
        nbytes = unit_counts  # bytes == units on the ASCII path

    widths = sorted(set(int(w) for w in bucket_widths))
    max_w = widths[-1]

    buckets: List[PackedBucket] = []
    assigned = np.full(n, -1, dtype=np.int64)
    for bi, w in enumerate(widths):
        lo = 0 if bi == 0 else widths[bi - 1]
        sel = (unit_counts <= w) & (unit_counts > lo if bi else unit_counts >= 0)
        assigned[sel] = bi
    xl_mask = unit_counts > max_w
    assigned[xl_mask] = -2

    # Consolidate sparse buckets into the next non-empty larger one: each
    # bucket costs a kernel instantiation (minutes of compile on
    # remote-compile TPU setups) and a dispatch, so only population-heavy
    # widths earn their keep. Padding waste for the merged rows is bounded
    # by the 2x width step. Row counts are then quantized to coarse size
    # classes (see _size_class) so differently sized corpora share
    # compiled programs.
    min_rows = max(1024, n // 32)
    counts_per = [int(np.sum(assigned == bi)) for bi in range(len(widths))]
    for bi in range(len(widths) - 1):
        if 0 < counts_per[bi] < min_rows:
            nxt = next(
                (j for j in range(bi + 1, len(widths)) if counts_per[j] > 0),
                None,
            )
            if nxt is not None:
                assigned[assigned == bi] = nxt
                counts_per[nxt] += counts_per[bi]
                counts_per[bi] = 0

    chunks = []
    for bi, w in enumerate(widths):
        rows_all = np.nonzero(assigned == bi)[0]
        if rows_all.size == 0:
            continue
        cap = max_bucket_rows(w)
        for s in range(0, rows_all.size, cap):
            chunks.append((w, rows_all[s : s + cap]))

    for w, rows in chunks:
        # Pad row count to a size class with empty rows (index sentinel
        # -1, zero units — they can never match) so program shapes repeat
        # across corpora and the compilation cache hits.
        b = _size_class(rows.size)
        pad = b - rows.size
        if pad:
            rows = np.concatenate([rows, np.full(pad, -1, np.int64)])
        counts = np.where(rows >= 0, unit_counts[np.maximum(rows, 0)], 0)

        packed = None
        if unicode:
            nat = native.pack_rows_u32(
                cp_flat.view(np.uint32)
                if cp_flat.dtype == np.int32 else cp_flat.astype(np.uint32),
                starts, rows, w,
            )
            if nat is not None:
                cp, first, prev, boff, blen = nat
                packed = True
        else:
            cp8 = native.pack_rows_u8(joined_b, starts, rows, w)
            if cp8 is not None:
                # int8 byte matrix; context arrays derive lazily on upload
                cp, first, prev, boff, blen = cp8, None, None, None, None
                packed = True

        if packed is None:
            # NumPy fallback (also the native packer's testing oracle)
            cp = np.zeros((b, w), np.int32)
            first = np.zeros((b, w), np.int32)
            prev = np.full((b, w), -1, np.int32)
            boff = np.zeros((b, w), np.int32)
            blen = np.zeros((b, w), np.int32)

            # flat gather indices for each row's units (fully vectorized)
            total = int(counts.sum())
            unit_rows = np.repeat(np.arange(b), counts)
            cum = np.zeros(b + 1, dtype=np.int64)
            np.cumsum(counts, out=cum[1:])
            col_idx = np.arange(total, dtype=np.int64) - cum[:-1][unit_rows]
            src = starts[rows][unit_rows] + col_idx

            fl = _flat()
            cp[unit_rows, col_idx] = fl["cp"][src]
            first[unit_rows, col_idx] = fl["first"][src]
            prev[unit_rows, col_idx] = fl["prev"][src]
            boff[unit_rows, col_idx] = fl["boff"][src]
            blen[unit_rows, col_idx] = fl["blen"][src]

        buckets.append(
            PackedBucket(
                width=w,
                indices=rows.astype(np.int64),
                cp=cp,
                first_byte=first,
                prev_last_byte=prev,
                byte_off=boff,
                byte_len=blen,
                n_units=counts.astype(np.int32),
                n_bytes=np.where(
                    rows >= 0, nbytes[np.maximum(rows, 0)], 0
                ).astype(np.int32),
            )
        )

    xl = np.nonzero(xl_mask)[0].astype(np.int64)
    return Corpus(list(haystacks), unicode, buckets, xl)
