"""Result types.

Mirrors the reference's ``Match`` / ``MatchIndices`` (reference:
src/lib.rs:141-232) with the same ordering contract: (score desc, index asc).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List


@dataclass(slots=True)
class Match:
    score: int = 0
    index: int = 0
    exact: bool = False
    # 0-based haystack byte offset where the best alignment ends
    # (reference feature `match_end_col`, src/lib.rs:149-152). Always populated.
    end_col: int = 0

    @classmethod
    def from_index(cls, index: int) -> "Match":
        return cls(score=0, index=index, exact=False, end_col=0)

    # JSON round-tripping (the analog of the reference's serde derives on
    # Match, src/lib.rs:141-152)
    def to_dict(self) -> dict:
        return {"score": self.score, "index": self.index,
                "exact": self.exact, "end_col": self.end_col}

    @classmethod
    def from_dict(cls, d: dict) -> "Match":
        return cls(int(d["score"]), int(d["index"]),
                   bool(d.get("exact", False)), int(d.get("end_col", 0)))

    def sort_key(self):
        return (-self.score, self.index)

    def __lt__(self, other: "Match") -> bool:
        return self.sort_key() < other.sort_key()


@dataclass(slots=True)
class MatchIndices:
    score: int = 0
    index: int = 0
    exact: bool = False
    # Matched haystack byte offsets in reverse order (reference: src/lib.rs:191-211)
    indices: List[int] = field(default_factory=list)

    @classmethod
    def from_index(cls, index: int) -> "MatchIndices":
        return cls(score=0, index=index, exact=False, indices=[])

    def to_dict(self) -> dict:
        return {"score": self.score, "index": self.index,
                "exact": self.exact, "indices": list(self.indices)}

    @classmethod
    def from_dict(cls, d: dict) -> "MatchIndices":
        return cls(int(d["score"]), int(d["index"]),
                   bool(d.get("exact", False)),
                   [int(i) for i in d.get("indices", [])])

    def sort_key(self):
        return (-self.score, self.index)

    def __lt__(self, other: "MatchIndices") -> bool:
        return self.sort_key() < other.sort_key()
