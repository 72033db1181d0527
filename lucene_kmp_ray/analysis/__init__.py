from .standard import (  # noqa: F401
    MAX_TOKEN_LENGTH,
    SQL_TOKEN_PATTERN,
    StandardAnalyzer,
    sql_tokens_expr,
    tokenize,
    tokenize_flat,
)
