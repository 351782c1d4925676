"""prefixtree_spark — a PySpark-native analytics engine with the query
capabilities of the Charles-Kaminski/PrefixTree reference bundle
(`/root/reference/PrefixTree.ecl`), extended with large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Reference parity surface (SURVEY.md §7):
  - ``create(df, col, ...)``          ≡ Create            (PrefixTree.ecl:50-301)
  - ``query(pt, queries, col, k)``    ≡ QueryThorLevenshtein (PrefixTree.ecl:314-446)
  - ``query_one(index, s, k)``        ≡ QueryRoxieLevenshtein (PrefixTree.ecl:459-588)
  - ``save_index`` / ``load_index``   ≡ OUTPUT + BUILDINDEX  (PrefixTree.ecl:611-613)

Everything is DataFrame-in / DataFrame-out; kernels are Arrow-vectorized
pandas functions; no RDD API, no Catalyst extensions.
"""

from prefixtree_spark._generation import (
    MaintenanceLeaseHeld,
    acquire_maintenance_lease,
    probe_consistent,
    refresh_maintenance_lease,
    release_maintenance_lease,
)
from prefixtree_spark.plans.lifecycle import release_checkpoint
from prefixtree_spark.operators.build import create, load_index, save_index
from prefixtree_spark.operators.incremental import add_words, remove_words
from prefixtree_spark.operators.prefix import prefix_search
from prefixtree_spark.operators.ranking import (
    bm25_rank,
    describe_bm25_index,
    rrf_fuse,
)
from prefixtree_spark.operators.classifier import (
    load_quality_classifier,
    save_quality_classifier,
    score_quality,
    train_quality_classifier,
)
from prefixtree_spark.operators.ann import (
    append_ivf_index,
    describe_ivf_index,
    maintain_ivf_index,
    cosine_topk_ivf_pq,
    load_ivf_index,
    save_ivf_index,
    sync_ivf_from_published,
    cosine_topk_int8,
    cosine_topk_pq,
    int8_scales,
    kmeans_fit,
    pq_encode,
    pq_fit,
    quantize_embeddings,
    semantic_dedup,
    semantic_dedup_ivf,
    semantic_dedup_kmeans,
)
from prefixtree_spark.operators.dedup import (
    contamination_report,
    duplicate_spans,
    keep_best,
    line_dedup,
    remove_duplicate_spans,
)
from prefixtree_spark.operators.sampling import (
    mixture_resample,
    deterministic_sample,
    export_shards,
    pack_sequences,
    shard_assign,
    split_assign,
    stratified_sample,
    top_n_per_group,
    weighted_sample,
)
from prefixtree_spark.operators.text import (
    chunk_text,
    corpus_report,
    corpus_report_published,
    detect_pii,
    ngram_counts,
    normalize_text,
    redact_pii,
)
from prefixtree_spark.operators.relational import (
    cohort_retention,
    distinct_counts,
    extract_json,
    frequent_items,
    pivot_counts,
    pseudonymize,
    resample_carry_forward,
)
from prefixtree_spark.pipeline import prepare_corpus
from prefixtree_spark.sources.io import (
    local_published_health,
    published_table_health,
)
from prefixtree_spark.serving import (
    LocalVectorIndex,
    PrefixTreeServer,
    load_local_index_published,
    load_local_ivf_index,
)
from prefixtree_spark.operators.query import (
    LocalIndex,
    build_local_index,
    clear_local_index_cache,
    query,
    query_groups,
    query_one,
    reshard,
    write_query_groups,
)
from prefixtree_spark.functions.damerau import damerau_levenshtein
from prefixtree_spark.operators.similarity_join import (
    best_match,
    fuzzy_dedup,
    similarity_join,
)

__all__ = [
    "create",
    "query",
    "query_groups",
    "query_one",
    "reshard",
    "write_query_groups",
    "LocalIndex",
    "build_local_index",
    "PrefixTreeServer",
    "LocalVectorIndex",
    "load_local_index_published",
    "load_local_ivf_index",
    "clear_local_index_cache",
    "add_words",
    "remove_words",
    "prefix_search",
    "kmeans_fit",
    "weighted_sample",
    "normalize_text",
    "detect_pii",
    "redact_pii",
    "pivot_counts",
    "resample_carry_forward",
    "cohort_retention",
    "save_index",
    "load_index",
    "similarity_join",
    "fuzzy_dedup",
    "best_match",
    "damerau_levenshtein",
    "bm25_rank",
    "rrf_fuse",
    "split_assign",
    "deterministic_sample",
    "stratified_sample",
    "top_n_per_group",
    "pack_sequences",
    "prepare_corpus",
    "chunk_text",
    "ngram_counts",
    "extract_json",
    "frequent_items",
    "distinct_counts",
    "pseudonymize",
    "semantic_dedup",
    "semantic_dedup_ivf",
    "semantic_dedup_kmeans",
    "duplicate_spans",
    "line_dedup",
    "remove_duplicate_spans",
    "mixture_resample",
    "pq_fit",
    "pq_encode",
    "cosine_topk_pq",
    "train_quality_classifier",
    "score_quality",
    "save_quality_classifier",
    "load_quality_classifier",
    "cosine_topk_ivf_pq",
    "save_ivf_index",
    "sync_ivf_from_published",
    "maintain_ivf_index",
    "load_ivf_index",
    "MaintenanceLeaseHeld",
    "acquire_maintenance_lease",
    "probe_consistent",
    "refresh_maintenance_lease",
    "release_maintenance_lease",
    "release_checkpoint",
    "describe_bm25_index",
    "describe_ivf_index",
    "published_table_health",
    "local_published_health",
]

__version__ = "0.1.0"
