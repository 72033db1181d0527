"""Query IR — the subset of the reference's Query tree needed v1.

Mirrors ``/root/reference/core/.../search/``: TermQuery.kt:24,
BooleanQuery.kt:17-101 + BooleanClause.kt:6-28 (MUST/FILTER/SHOULD/MUST_NOT,
minimumNumberShouldMatch), PhraseQuery.kt:56-94 (exact phrase v1),
BoostQuery, MatchAllDocsQuery. Queries are plain data; execution lives in
``searcher.py`` (the Weight/Scorer split collapses because scoring is
vectorized per segment, not iterator-at-a-time).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class Occur(Enum):
    MUST = "MUST"
    FILTER = "FILTER"      # matches like MUST, contributes no score
    SHOULD = "SHOULD"
    MUST_NOT = "MUST_NOT"  # anti-join; never scores


class Query:
    def terms(self) -> list[str]:
        """All scoring terms (for stats resolution / QueryVisitor analog)."""
        return []


@dataclass(frozen=True)
class TermQuery(Query):
    term: str

    def terms(self):
        return [self.term]


@dataclass(frozen=True)
class PhraseQuery(Query):
    phrase_terms: tuple[str, ...]
    slop: int = 0  # only 0 (exact) supported v1; ExactPhraseMatcher analog

    def terms(self):
        return list(self.phrase_terms)


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    pass


@dataclass(frozen=True)
class BoostQuery(Query):
    query: Query
    boost: float

    def terms(self):
        return self.query.terms()


MAX_CLAUSE_COUNT = 1024  # IndexSearcher.kt:986


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple[tuple[Occur, Query], ...]
    minimum_should_match: int = 0

    def __post_init__(self):
        if len(self.clauses) > MAX_CLAUSE_COUNT:
            raise ValueError(f"too many clauses: {len(self.clauses)} > {MAX_CLAUSE_COUNT}")

    def terms(self):
        out = []
        for occ, q in self.clauses:
            if occ in (Occur.MUST, Occur.SHOULD):
                out.extend(q.terms())
        return out

    @staticmethod
    def build(*clauses: tuple[Occur, Query],
              minimum_should_match: int = 0) -> "BooleanQuery":
        return BooleanQuery(tuple(clauses), minimum_should_match)
