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
