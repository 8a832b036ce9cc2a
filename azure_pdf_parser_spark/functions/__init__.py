from azure_pdf_parser_spark.functions.text import (
    LANG_STOPWORDS,
    language_expr,
    language_sql,
    quality_exprs,
    token_count_expr,
)

__all__ = [
    "LANG_STOPWORDS",
    "language_expr",
    "language_sql",
    "quality_exprs",
    "token_count_expr",
]
