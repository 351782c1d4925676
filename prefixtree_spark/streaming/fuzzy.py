"""Streaming fuzzy match: enrich a stream with its dictionary matches.

The serving half of the engine applied to Structured Streaming — each
micro-batch's strings traverse a prebuilt, broadcast-once
``LocalIndex`` (``build_local_index``) through the SAME stateless
``mapInPandas`` kernel the batch ``broadcast_tree`` strategy uses
(operators/query.py:740), so batch and stream results are identical by
construction (≡ the Roxie query path, PrefixTree.ecl:459-588, fed by a
stream instead of point calls).

Unlike ``query`` — whose contract is one result set per DISTINCT query
string — this operator is an ENRICHMENT: every input ROW keeps its
payload columns and gains its matches (``match_word``,
``match_distance``), because a stream's rows are events, not a
vocabulary. Dedup-then-match still happens inside each Arrow batch
(one DP per distinct string per batch), so repeated strings cost one
traversal, not one each.

Stateless ⇒ no watermark required, works in append mode, and the same
call on a batch DataFrame returns the same rows (streaming == batch
equivalence is tested, as for the other streaming twins).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from prefixtree_spark.functions.levenshtein import QueryBatch
from prefixtree_spark.operators.query import LocalIndex, _traverse_index


def streaming_fuzzy_match(
    df: DataFrame,
    col: str,
    index: LocalIndex,
    max_distance: int,
    *,
    how: str = "inner",
    bytes: bool = False,
    best_only: bool = False,
) -> DataFrame:
    """Match ``df[col]`` (streaming or batch) against a prebuilt
    ``LocalIndex``; returns the input columns plus ``match_word`` and
    ``match_distance`` (one output row per (input row, match) pair).

    ``how="inner"`` drops rows with no match ≤ ``max_distance``;
    ``how="left"`` keeps them with null match columns (the
    audit/monitoring shape: unmatched events stay visible).

    ``best_only=True`` emits ONE row per input row — the minimum-
    distance match, ties broken lexicographically on the word (the
    same deterministic rule as ``best_match``) — the streaming
    entity-resolution shape. Computed per distinct string inside each
    Arrow batch (matches for a string are complete within its batch),
    so it needs no cross-batch state and stays append-mode safe.

    ``bytes=True`` matches a handle built from a ``create(...,
    bytes=True)`` tree — edits count UTF-8 BYTES (the same duty-pair
    contract as ``query``/``query_one``): the traversal runs in the
    shared byte-surrogate space while the stream's payload columns,
    including ``col``, pass through untouched and ``match_word``
    decodes back to real UTF-8.

    The index is broadcast ONCE per session (the handle's cached Spark
    broadcast); each task deserializes the prebuilt CSR arrays instead
    of re-deriving them per batch. Dictionary updates are a new handle
    — build from the maintained tree and start the next stream run
    with it (the generation-swap discipline the serving layer uses)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    k = int(max_distance)
    spark = df.sparkSession
    bt = index.spark_broadcast(spark)
    bytes_mode = bytes
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("match_word", T.StringType(), True),
            T.StructField("match_distance", T.IntegerType(), True),
        ]
    )
    in_cols = list(df.columns)

    def run(batches):
        from prefixtree_spark.functions.bytesurrogate import (
            py_from_byte_surrogate,
            py_to_byte_surrogate,
        )

        idx = bt.value
        for pdf in batches:
            if not len(pdf):
                continue
            qs = sorted(set(pdf[col].dropna().astype(str)))
            if qs:
                # byte mode: the DP runs in surrogate space; the merge
                # key decodes back so payload rows join on REAL strings
                dp_qs = (
                    [py_to_byte_surrogate(q) for q in qs] if bytes_mode else qs
                )
                res = _traverse_index(idx, QueryBatch(dp_qs), k).rename(
                    columns={
                        "query_string": "__q",
                        "node": "match_word",
                        "final_distance": "match_distance",
                    }
                )
                if bytes_mode:
                    res["__q"] = res["__q"].map(py_from_byte_surrogate)
                    res["match_word"] = res["match_word"].map(
                        py_from_byte_surrogate
                    )
                if best_only and len(res):
                    # min distance per string, ties to the smaller word
                    # (deterministic, same rule as best_match) — decided
                    # AFTER any byte decode so the tie-break is on the
                    # real string in both modes
                    res = (
                        res.sort_values(["__q", "match_distance", "match_word"])
                        .groupby("__q", as_index=False)
                        .head(1)
                    )
            else:
                res = pd.DataFrame(
                    columns=["__q", "match_word", "match_distance"]
                )
            merged = pdf.merge(
                res, left_on=col, right_on="__q", how=how
            ).drop(columns="__q")
            # left-join misses carry NaN; keep the distance nullable
            # Int32 so Arrow emits proper nulls, not NaN-cast garbage
            merged["match_distance"] = merged["match_distance"].astype(
                "Int32"
            )
            yield merged[in_cols + ["match_word", "match_distance"]]

    return df.mapInPandas(run, schema=out_schema)
