from .query import (  # noqa: F401
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FeatureQuery,
    FieldExistsQuery,
    FuzzyQuery,
    GeoBoxQuery,
    GeoDistanceQuery,
    GeoLineQuery,
    GeoPolygonQuery,
    IndexOrDocValuesQuery,
    KnnFloatVectorQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    MultiPhraseQuery,
    MultiTermQuery,
    NGramPhraseQuery,
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
from .queryparser import multi_field_parse, parse_query  # noqa: F401
from .wkt import parse as parse_wkt, to_query as wkt_to_query  # noqa: F401
from .searcher import Searcher, TopDocs  # noqa: F401
from .spans import (SpanContainingQuery,  # noqa: F401
                    FieldMaskingSpanQuery,
                    SpanMultiTermQueryWrapper, SpanPositionRangeQuery,
                    SpanFirstQuery, SpanNearQuery, SpanNotQuery,
                    SpanOrQuery, SpanTermQuery, SpanWithinQuery)
