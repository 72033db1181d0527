from .query import (  # noqa: F401
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    MultiPhraseQuery,
    MultiTermQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    RangeFilterQuery,
    RegexpQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from .queryparser import parse_query  # noqa: F401
from .searcher import Searcher, TopDocs  # noqa: F401
