"""Unrestricted Damerau-Levenshtein distance (Lowrance-Wagner).

The reference engine is Levenshtein-only (``CalculateLevenshteinVector``,
PrefixTree.ecl:315-377); transposition-aware distance is the metric
entity resolution actually wants ("JOHN SMIHT" is one typo, not two).
This module provides the exact kernel the engine's ``metric="damerau"``
fuzzy operators rerank with.

Semantics: the UNRESTRICTED variant (a transposed pair may be edited
between its characters later in the optimal script — DL("CA","ABC")=2),
matching DuckDB's ``damerau_levenshtein`` exactly (fuzz-pinned by
test), NOT the restricted OSA variant (OSA("CA","ABC")=3) many
libraries mislabel. Distances are per Unicode codepoint; DuckDB counts
UTF-8 bytes, so oracles stay ASCII (same rule as ``levenshtein``).

Why rerank instead of a transposition-aware trie traversal: the
unrestricted DP's transposition term reads ``d[k][l]`` for k = the last
row whose character matches the current column — state that grows with
the alphabet and path, not a fixed-width row. The engine instead uses
the metric inequality  lev(a,b) <= 2 * dl(a,b)  (every transposition is
two substitutions, other ops map 1:1), so the EXISTING branch-and-bound
tree search at 2k yields a guaranteed candidate superset for DL <= k,
and this exact kernel scores only those survivors. Cost model: tree
search at 2k + O(|candidates| * |a|*|b|) rerank — bounded by the pruned
candidate count, never |left| x |right|.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def damerau_levenshtein(a: str, b: str) -> int:
    """Exact unrestricted Damerau-Levenshtein distance (Lowrance-
    Wagner DP, O(|a|*|b|) time, alphabet-dict row memory).

    Common prefix and suffix are stripped first — EXACT for
    unrestricted DL (an optimal script never needs to edit a matched
    flank; verified exhaustively over alphabet-3 strings to length 5
    against the untrimmed DP, plus the DuckDB fuzz pin). This is the
    rerank's big win (r12): tree-pruned candidate pairs share long
    prefixes by construction, so the O(|a|·|b|) core collapses to the
    differing span (measured 164k customer-name pairs: ~18×18 DP →
    ~4×4)."""
    # strip common prefix
    i = 0
    la, lb = len(a), len(b)
    m = min(la, lb)
    while i < m and a[i] == b[i]:
        i += 1
    # strip common suffix (never past the stripped prefix)
    j = 0
    mj = m - i
    while j < mj and a[la - 1 - j] == b[lb - 1 - j]:
        j += 1
    a = a[i : la - j]
    b = b[i : lb - j]
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxd = la + lb
    da: dict[str, int] = {}
    d = [[maxd] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
        d[i + 1][0] = maxd
    for j in range(lb + 1):
        d[1][j + 1] = j
        d[0][j + 1] = maxd
    for i in range(1, la + 1):
        db = 0
        ai = a[i - 1]
        row, prev = d[i + 1], d[i]
        for j in range(1, lb + 1):
            bj = b[j - 1]
            k = da.get(bj, 0)
            l = db
            if ai == bj:
                cost = 0
                db = j
            else:
                cost = 1
            row[j + 1] = min(
                prev[j] + cost,          # substitute / match
                row[j] + 1,              # insert
                prev[j + 1] + 1,         # delete
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transpose
            )
        da[ai] = i
    return d[la + 1][lb + 1]


def dl_pairs_udf():
    """Arrow-batched (string, string) -> int pandas UDF computing the
    exact DL per pair — the rerank kernel for ``metric="damerau"``
    operators. Scalar DP per pair: candidate sets are tree-pruned, so
    the UDF sees O(candidates), not a cross join; work parallelizes
    across candidate partitions."""

    @F.pandas_udf(T.IntegerType())
    def dl(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                damerau_levenshtein(x if x is not None else "",
                                    y if y is not None else "")
                for x, y in zip(a, b)
            ],
            dtype="int32",
        )

    return dl
