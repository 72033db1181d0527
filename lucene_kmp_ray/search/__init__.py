from .query import (  # noqa: F401
    BooleanQuery,
    BoostQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    Query,
    TermQuery,
)
from .searcher import Searcher, TopDocs  # noqa: F401
