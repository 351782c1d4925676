from prefixtree_spark.functions.levenshtein import (
    QueryBatch,
    extend_rows,
    levenshtein,
)

__all__ = ["QueryBatch", "extend_rows", "levenshtein"]
