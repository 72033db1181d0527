"""BooleanQuery rewrite — IndexSearcher.rewrite's structural
simplification, rule-for-rule from the reference:

- ``search/BooleanQuery.kt:223-595`` (``rewrite``): empty / pure-
  negative / one-clause optimizations, recursive clause rewrite with
  the ConstantScore trick for FILTER / MUST_NOT slots, FILTER and
  MUST_NOT set-dedup, required-and-excluded → MatchNoDocs, FILTER
  cleanup (MatchAll removal, MUST duplicates), SHOULD∩FILTER → MUST
  with msm decrement, SHOULD / MUST boost-sum dedup, the single-MUST-
  MatchAll → ConstantScore-of-filters rule, nested-disjunction and
  required-conjunction flattening, the msm bounds, and inlining the
  only-MUST disjunction.
- ``search/BooleanQuery.kt:172-216`` (``rewriteNoScoring``): MUST →
  FILTER, SHOULD dropped when an anchor exists, Boost/ConstantScore
  wrappers stripped.
- ``search/ConstantScoreQuery.kt:15-40`` and ``BoostQuery.kt:56-81``
  wrapper rewrites; one-term PhraseQuery → TermQuery.

Each call of ``_rewrite`` applies the FIRST rule that changes the
query (the reference returns per rule); ``rewrite_query`` loops to a
fixpoint like ``IndexSearcher.kt:699``. Every vector of the
reference's TestBooleanRewrites.kt is asserted structurally in
tests/test_boolean_rewrites.py, and a random differential there
checks rewritten trees rank identically through the real Searcher.
"""

from __future__ import annotations

from .query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    Query,
    TermQuery,
)

__all__ = ["rewrite_query"]

_MAX_PASSES = 64  # defensive bound; the reference loops until stable

_M = Occur.MUST
_F = Occur.FILTER
_S = Occur.SHOULD
_N = Occur.MUST_NOT


def rewrite_query(q: Query) -> Query:
    """Rewrite to a fixpoint (IndexSearcher.kt:699 loop)."""
    for _ in range(_MAX_PASSES):
        r = _rewrite(q)
        if r == q:
            return r
        q = r
    return q


# -- ==-based set helpers (leaf queries may hold unhashable payloads) ---------

def _contains(lst, q) -> bool:
    return any(c == q for c in lst)


def _dedup(lst):
    out = []
    for c in lst:
        if not _contains(out, c):
            out.append(c)
    return out


def _of(clauses, occur):
    return [q for o, q in clauses if o is occur]


def _strip_boost(q: Query) -> tuple[Query, float]:
    b = 1.0
    while isinstance(q, BoostQuery):
        b *= q.boost
        q = q.query
    return q, b


def _sum_boosts(queries):
    """(base, summed boost) pairs in first-occurrence order."""
    bases, totals = [], []
    for q in queries:
        base, b = _strip_boost(q)
        for i, known in enumerate(bases):
            if known == base:
                totals[i] += b
                break
        else:
            bases.append(base)
            totals.append(b)
    return bases, totals


def _rewrite(q: Query) -> Query:
    """One reference ``Query.rewrite`` step."""
    if isinstance(q, PhraseQuery) and q.slop == 0:
        if len(q.phrase_terms) == 0:
            return MatchNoDocsQuery()
        if len(q.phrase_terms) == 1:
            return TermQuery(q.phrase_terms[0], q.field)
        return q
    if isinstance(q, BoostQuery):
        rewritten = _rewrite(q.query)
        if q.boost == 1.0:
            return rewritten
        if isinstance(rewritten, BoostQuery):
            return BoostQuery(rewritten.query, q.boost * rewritten.boost)
        if isinstance(rewritten, MatchNoDocsQuery):
            return MatchNoDocsQuery()
        if q.boost == 0.0 and type(rewritten) is not ConstantScoreQuery:
            return BoostQuery(ConstantScoreQuery(rewritten), 0.0)
        return BoostQuery(rewritten, q.boost)
    if isinstance(q, ConstantScoreQuery):
        rewritten = _rewrite(q.query)
        # extra simplifications: scores of the wrapped query are unused
        if isinstance(rewritten, BoostQuery):
            rewritten = rewritten.query
        elif isinstance(rewritten, ConstantScoreQuery):
            rewritten = rewritten.query
        elif isinstance(rewritten, BooleanQuery):
            rewritten = _rewrite_no_scoring(rewritten)
        if isinstance(rewritten, MatchNoDocsQuery):
            return MatchNoDocsQuery()
        if rewritten != q.query:
            return ConstantScoreQuery(rewritten)
        return q
    if isinstance(q, BooleanQuery):
        return _rewrite_bool(q)
    return q


def _rewrite_no_scoring(q: BooleanQuery) -> BooleanQuery:
    """``BooleanQuery.rewriteNoScoring`` (BooleanQuery.kt:172-216)."""
    changed = False
    keep_should = q.minimum_should_match > 0 or \
        (len(_of(q.clauses, _M)) + len(_of(q.clauses, _F)) == 0)
    out = []
    for occ, query in q.clauses:
        rewritten = query
        if isinstance(rewritten, BoostQuery):
            rewritten = rewritten.query
        if isinstance(rewritten, ConstantScoreQuery):
            rewritten = rewritten.query
        if isinstance(rewritten, BooleanQuery):
            rewritten = _rewrite_no_scoring(rewritten)
        if occ is _S and not keep_should:
            changed = True
        elif occ is _M:
            out.append((_F, rewritten))
            changed = True
        elif rewritten != query:
            out.append((occ, rewritten))
            changed = True
        else:
            out.append((occ, query))
    if not changed:
        return q
    return BooleanQuery(tuple(out), q.minimum_should_match)


def _rewrite_bool(q: BooleanQuery) -> Query:
    clauses = list(q.clauses)
    msm = q.minimum_should_match

    if not clauses:
        return MatchNoDocsQuery()

    # queries with no positive clauses have no matches
    if all(o is _N for o, _ in clauses):
        return MatchNoDocsQuery()

    # optimize 1-clause queries
    if len(clauses) == 1:
        occ, inner = clauses[0]
        if msm == 1 and occ is _S:
            return inner
        if msm == 0:
            if occ in (_S, _M):
                return inner
            if occ is _F:
                return BoostQuery(ConstantScoreQuery(inner), 0.0)

    # recursively rewrite clauses (ConstantScore trick for non-scoring
    # slots gives them the extra no-score simplifications)
    out = []
    changed = False
    for occ, query in clauses:
        if occ in (_F, _N):
            rewritten = _rewrite(ConstantScoreQuery(query))
            if isinstance(rewritten, ConstantScoreQuery):
                rewritten = rewritten.query
        else:
            rewritten = _rewrite(query)
        if rewritten != query or isinstance(query, MatchNoDocsQuery):
            changed = True
            if isinstance(rewritten, MatchNoDocsQuery):
                if occ in (_M, _F):
                    return MatchNoDocsQuery()
                # SHOULD / MUST_NOT MatchNoDocs clauses drop
            else:
                out.append((occ, rewritten))
        else:
            out.append((occ, query))
    if changed:
        return BooleanQuery(tuple(out), msm)

    # remove duplicate FILTER and MUST_NOT clauses
    filt, mnot = _of(clauses, _F), _of(clauses, _N)
    dfilt, dmnot = _dedup(filt), _dedup(mnot)
    if len(dfilt) != len(filt) or len(dmnot) != len(mnot):
        out = [(o, c) for o, c in clauses if o not in (_F, _N)]
        out += [(_F, c) for c in dfilt] + [(_N, c) for c in dmnot]
        return BooleanQuery(tuple(out), msm)

    # some clauses both required and excluded → no matches
    must = _of(clauses, _M)
    if mnot:
        pos = must + filt
        if any(_contains(pos, c) for c in mnot):
            return MatchNoDocsQuery()
        if _contains(mnot, MatchAllDocsQuery()):
            return MatchNoDocsQuery()

    # remove FILTER clauses that duplicate MUST clauses or match all docs
    if filt:
        keep = list(filt)
        modified = False
        if len(keep) > 1 or must:
            n0 = len(keep)
            keep = [c for c in keep if not isinstance(c,
                                                      MatchAllDocsQuery)]
            modified = len(keep) != n0
        n0 = len(keep)
        keep = [c for c in keep if not _contains(must, c)]
        modified = modified or len(keep) != n0
        if modified:
            out = [(o, c) for o, c in clauses if o is not _F]
            out += [(_F, c) for c in keep]
            return BooleanQuery(tuple(out), msm)

    # convert FILTER clauses that are also SHOULD clauses to MUST
    should = _of(clauses, _S)
    if should and filt:
        inter = [c for c in filt if _contains(should, c)]
        if inter:
            out = []
            new_msm = msm
            for occ, c in clauses:
                if _contains(inter, c) and occ in (_S, _F):
                    if occ is _S:
                        out.append((_M, c))
                        new_msm -= 1
                else:
                    out.append((occ, c))
            return BooleanQuery(tuple(out), max(0, new_msm))

    # deduplicate SHOULD clauses by summing up their boosts
    if should and msm <= 1:
        bases, totals = _sum_boosts(should)
        if len(bases) != len(should):
            out = [(_S, b if t == 1.0 else BoostQuery(b, t))
                   for b, t in zip(bases, totals)]
            out += [(o, c) for o, c in clauses if o is not _S]
            return BooleanQuery(tuple(out), msm)

    # deduplicate MUST clauses by summing up their boosts
    if must:
        bases, totals = _sum_boosts(must)
        if len(bases) != len(must):
            out = [(_M, b if t == 1.0 else BoostQuery(b, t))
                   for b, t in zip(bases, totals)]
            out += [(o, c) for o, c in clauses if o is not _M]
            return BooleanQuery(tuple(out), msm)

    # single scoring MUST on MatchAllDocs → ConstantScore on the filters
    if len(must) == 1 and filt:
        base, boost = _strip_boost(must[0])
        if isinstance(base, MatchAllDocsQuery):
            inner_clauses = tuple((o, c) for o, c in clauses
                                  if o in (_F, _N))
            inner: Query = BooleanQuery(inner_clauses, 0)
            inner = ConstantScoreQuery(inner)
            if boost != 1.0:
                inner = BoostQuery(inner, boost)
            out = [(_M, inner)] + [(_S, c) for c in should]
            return BooleanQuery(tuple(out), msm)

    # flatten nested pure disjunctions (important for block-max WAND)
    if msm <= 1:
        out = []
        changed = False
        for occ, c in clauses:
            if occ is _S and isinstance(c, BooleanQuery) and \
                    c.clauses and c.minimum_should_match <= 1 and \
                    all(o is _S for o, _ in c.clauses):
                out.extend(c.clauses)
                changed = True
            else:
                out.append((occ, c))
        if changed:
            return BooleanQuery(tuple(out), msm)

    # inline required (MUST / FILTER) conjunctions
    out = []
    changed = False
    for occ, c in clauses:
        if occ in (_M, _F) and isinstance(c, BooleanQuery) and \
                c.clauses and c.minimum_should_match == 0 and \
                not _of(c.clauses, _S):
            changed = True
            for iocc, ic in c.clauses:
                if iocc in (_F, _N) or occ is _M:
                    out.append((iocc, ic))
                else:
                    # outer FILTER, inner MUST → FILTER (no scoring)
                    out.append((_F, ic))
        else:
            out.append((occ, c))
    if changed:
        return BooleanQuery(tuple(out), msm)

    # SHOULD clause count vs minimumNumberShouldMatch (only sound after
    # nested clauses have been flattened — the reference's ordering)
    if len(should) < msm:
        return MatchNoDocsQuery()
    if should and len(should) == msm:
        out = [((_M, c) if o is _S else (o, c)) for o, c in clauses]
        return BooleanQuery(tuple(out), 0)

    # inline SHOULD clauses from the only MUST clause
    if not should and len(must) == 1 and isinstance(must[0], BooleanQuery):
        inner = must[0]
        if inner.clauses and all(o is _S for o, _ in inner.clauses):
            out = [(o, c) for o, c in clauses if o is not _M]
            out += list(inner.clauses)
            return BooleanQuery(tuple(out),
                                max(1, inner.minimum_should_match))

    return q
