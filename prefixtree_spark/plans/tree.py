"""The prefix-tree node table layout (``PTLayout``).

Mirrors the reference's public output schema (PrefixTree.ecl:267-276):
one row per trie node; internal nodes carry a multi-character edge label
in ``node``; ``is_word`` end-cap leaves carry the ENTIRE word
(PrefixTree.ecl:280,283) so query results need no path reconstruction.

``parent_id = 0`` marks forest roots (PrefixTree.ecl:269); node ids are
globally unique without coordination via per-partition blocks of
``partition_id * 10**14`` (PrefixTree.ecl:172-181) — the same trick
Spark's ``monotonically_increasing_id`` uses.
"""

from pyspark.sql import types as T

VIRTUAL_ROOT_ID = 0

# One id block per build partition; supports 92,233 blocks (2^63/1e14)
# of 1e14 ids each, comfortably above the reference's capacity envelope
# (PrefixTree.ecl:65-71).
ID_BLOCK = 10**14

PT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("parent_id", T.LongType(), False),
        T.StructField("_max", T.IntegerType(), False),
        T.StructField("_min", T.IntegerType(), False),
        T.StructField("is_word", T.BooleanType(), False),
        T.StructField("compute_node", T.IntegerType(), False),
        T.StructField("node", T.StringType(), False),
    ]
)

PT_COLUMNS = [f.name for f in PT_SCHEMA.fields]

# keep_duplicates=True layout: PTLayout + the per-word input multiplicity
# (the engine's compressed form of the reference's n-identical-end-caps
# behavior, PrefixTree.ecl:205-208; internal nodes carry 1).
PT_SCHEMA_DUP = T.StructType(
    PT_SCHEMA.fields + [T.StructField("n_copies", T.IntegerType(), False)]
)

PT_COLUMNS_DUP = [f.name for f in PT_SCHEMA_DUP.fields]

# ---------------------------------------------------------------------------
# forest-count hint: the one piece of build metadata the delta paths need
# ---------------------------------------------------------------------------
#
# add_words/remove_words gate their sparse-vs-bulk plan on the forest
# count, and add_words routes new words with pmod(hash, n_forests). A
# raw frame has to probe it (max(compute_node) — a per-call job over
# the node table); but ``create`` KNOWS it (its repartition N), and a
# saved index can store it once. The hint rides as a plain Python
# attribute on the DataFrame object — best-effort by design: any
# transformation returns a new object without it, and every consumer
# falls back to the probe. Correctness never depends on the value
# (SURVEY.md §0: partition-independent answers); it only picks plans
# and routing, so a stale-but-plausible count is safe.

_N_FORESTS_ATTR = "_pt_n_forests"


def set_n_forests_hint(df, n: int):
    """Attach the forest count to ``df`` (returns ``df``)."""
    try:
        setattr(df, _N_FORESTS_ATTR, int(n))
    except Exception:
        pass  # exotic DataFrame impls without __dict__: hint is optional
    return df


def n_forests_hint(df) -> int | None:
    """The attached forest count, or None (caller probes)."""
    n = getattr(df, _N_FORESTS_ATTR, None)
    return int(n) if n is not None else None
