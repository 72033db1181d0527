from .standard import (  # noqa: F401
    MAX_TOKEN_LENGTH,
    PY_TOKEN_RE,
    SQL_TOKEN_PATTERN,
    StandardAnalyzer,
    sql_tokens_expr,
    tokenize,
    tokenize_flat,
)
