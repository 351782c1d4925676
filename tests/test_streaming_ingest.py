"""Streaming corpus ingest: greedy first-arrival near-dup rejection
with atomic append commits (streaming/ingest.py). Pins:

  - greedy vs global semantics on a constructed A~B~C chain;
  - the short-doc exact-text guard (no shingles, still deduped);
  - stream == sequential-batch twin on the documents fixture;
  - full-replay idempotence (the at-least-once recovery story).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from prefixtree_spark.sources.io import published_version, read_published
from prefixtree_spark.sources.tables import load_table
from prefixtree_spark.streaming.ingest import (
    ingest_batch,
    ingest_sequential,
    streaming_ingest_corpus,
)

SF = "/root/testdata/sf0.001"


def _chain_docs(spark):
    """A < B < C with jaccard(A,B)=0.6, jaccard(B,C)=0.6,
    jaccard(A,C)=1/3 on 3-token shingles: a transitivity probe."""
    toks = [f"t{i}" for i in range(1, 15)]
    a = " ".join(toks[0:10])   # shingles s1..s8
    b = " ".join(toks[2:12])   # s3..s10: |A∩B|=6, |A∪B|=10
    c = " ".join(toks[4:14])   # s5..s12: |B∩C|=6, |A∩C|=4, |A∪C|=12
    return {
        "A": (1, a),
        "B": (2, b),
        "C": (3, c),
    }


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_single_batch_matches_global_dedup(spark, tmp_path):
    """All three chain docs in ONE batch: within-batch CC collapses the
    whole A-B-C component to its min id — identical to the batch
    ``dedup_corpus`` result on the same input."""
    d = _chain_docs(spark)
    batch = spark.createDataFrame(list(d.values()), ["doc_id", "text"])
    root = str(tmp_path / "one_batch")
    ingest_batch(batch, root, "doc_id", "text", threshold=0.5)
    assert _ids(read_published(spark, root)) == [1]


def test_greedy_two_batches_keeps_chain_ends(spark, tmp_path):
    """[A,B] then [C]: A survives batch 1 (B ~ A rejected); C is NOT a
    near-dup of the accepted corpus {A} (jaccard 1/3 < 0.5), so greedy
    keeps it — where the global pass keeps A alone. The documented
    first-arrival semantics, pinned."""
    d = _chain_docs(spark)
    b1 = spark.createDataFrame([d["A"], d["B"]], ["doc_id", "text"])
    b2 = spark.createDataFrame([d["C"]], ["doc_id", "text"])
    root = str(tmp_path / "greedy")
    out = ingest_sequential([b1, b2], root, "doc_id", "text", threshold=0.5)
    assert _ids(out) == [1, 3]
    assert published_version(spark, root) == 2


def test_short_doc_exact_guard(spark, tmp_path):
    """Docs below one shingle (<3 tokens) carry no LSH evidence; the
    corpus exact-text guard still rejects re-arrivals, while a NEW
    short text is accepted."""
    root = str(tmp_path / "short")
    b1 = spark.createDataFrame([(1, "hi"), (2, "hi")], ["doc_id", "text"])
    b2 = spark.createDataFrame([(3, "hi"), (4, "yo")], ["doc_id", "text"])
    out = ingest_sequential([b1, b2], root, "doc_id", "text")
    assert _ids(out) == [1, 4]


def test_stream_equals_sequential_twin_on_documents(spark, tmp_path):
    """availableNow file stream (maxFilesPerTrigger=1, two files in
    arrival order) through the foreachBatch sink == folding the same
    two halves through ingest_batch. Same keep set, same corpus."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    lo = docs.where("doc_id < 250")
    hi = docs.where("doc_id >= 250")

    stream_dir = str(tmp_path / "arrivals")
    lo.coalesce(1).write.parquet(f"{stream_dir}/b0")
    time.sleep(1.1)  # file-source ordering is by modification time
    hi.coalesce(1).write.parquet(f"{stream_dir}/b1")

    twin_root = str(tmp_path / "twin")
    twin = ingest_sequential([lo, hi], twin_root, "doc_id", "text")

    stream_root = str(tmp_path / "streamed")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stream_dir)
    )
    q = streaming_ingest_corpus(
        stream,
        stream_root,
        "doc_id",
        "text",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    got = read_published(spark, stream_root)
    assert _ids(got) == _ids(twin)
    # greedy invariant: multiple commits happened (one per non-empty batch)
    assert published_version(spark, stream_root) == 2


def test_replay_is_idempotent(spark, tmp_path):
    """A fresh checkpoint replaying the SAME files against an already-
    populated corpus appends nothing: every row is rejected against
    itself (the at-least-once recovery contract)."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    sample = docs.where("doc_id < 100")
    stream_dir = str(tmp_path / "arrivals")
    sample.coalesce(1).write.parquet(f"{stream_dir}/b0")
    root = str(tmp_path / "corpus")

    def run(ckpt):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("recursiveFileLookup", "true")
            .parquet(stream_dir)
        )
        q = streaming_ingest_corpus(
            stream, root, "doc_id", "text", checkpoint_dir=str(tmp_path / ckpt)
        )
        q.awaitTermination(300)

    run("ckpt1")
    first = _ids(read_published(spark, root))
    v1 = published_version(spark, root)
    run("ckpt2")  # fresh checkpoint: full replay of every file
    assert _ids(read_published(spark, root)) == first
    assert published_version(spark, root) == v1  # no empty appends


def test_bands_side_table_persisted_and_params_pinned(spark, tmp_path):
    """Ingest maintains <root>_bands via the same append commits; a
    later batch with different LSH parameters fails fast instead of
    joining incompatible buckets."""
    import pytest

    root = str(tmp_path / "corpus")
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    ingest_batch(b1, root, "doc_id", "text")
    bands = read_published(spark, root + "_bands")
    assert bands.columns == ["doc", "band", "bucket"]
    assert bands.where("doc = 1").count() == 32  # default bands=32
    b2 = spark.createDataFrame([(2, "eta theta iota kappa")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="parameter"):
        ingest_batch(b2, root, "doc_id", "text", n=4)
    ingest_batch(b2, root, "doc_id", "text")  # matching params fine
    assert sorted(r.doc for r in read_published(spark, root + "_bands")
                  .select("doc").distinct().collect()) == [1, 2]


def test_backfill_bands_for_pre_existing_corpus(spark, tmp_path):
    """A corpus published before the bands table existed gets its
    buckets backfilled on the first ingest — and rejection against it
    still works (near-dup of a backfilled doc is dropped)."""
    from prefixtree_spark.sources.io import publish_version

    root = str(tmp_path / "corpus")
    base = " ".join(f"w{i}" for i in range(20))
    publish_version(
        spark.createDataFrame([(1, base)], ["doc_id", "text"]), root
    )
    # near-dup of doc 1 (19/21 shared 3-shingles > 0.8) + one novel doc
    dup = " ".join(["w0x"] + [f"w{i}" for i in range(1, 20)])
    novel = " ".join(f"z{i}" for i in range(20))
    b = spark.createDataFrame([(2, dup), (3, novel)], ["doc_id", "text"])
    ingest_batch(b, root, "doc_id", "text", threshold=0.5)
    assert _ids(read_published(spark, root)) == [1, 3]
    assert published_version(spark, root + "_bands") >= 1


def test_maintain_ingest_folds_long_chains(spark, tmp_path):
    """Out-of-band maintenance: after the chain outgrows max_segments,
    both corpus and bands fold to one directory each, content
    unchanged, and a later batch still dedups correctly against the
    compacted corpus."""
    from prefixtree_spark.sources.io import published_chain_length
    from prefixtree_spark.streaming.ingest import maintain_ingest

    root = str(tmp_path / "corpus")
    texts = [
        " ".join(f"a{b}_{i}" for i in range(12)) for b in range(4)
    ]
    for b in range(3):
        ingest_batch(
            spark.createDataFrame([(b, texts[b])], ["doc_id", "text"]),
            root, "doc_id", "text",
        )
    assert published_chain_length(spark, root) == 3
    lengths = maintain_ingest(spark, root, max_segments=2, keep=1)
    assert lengths == {
        root: 1, root + "_bands": 1, root + "_card_deleted": 0,
    }
    assert _ids(read_published(spark, root)) == [0, 1, 2]
    # dedup against the compacted corpus still works: replay doc 1's
    # text under a new id, plus one genuinely new doc
    ingest_batch(
        spark.createDataFrame(
            [(10, texts[1]), (11, texts[3])], ["doc_id", "text"]
        ),
        root, "doc_id", "text",
    )
    assert _ids(read_published(spark, root)) == [0, 1, 2, 11]


def test_audit_lineage_names_stage_and_match(spark, tmp_path):
    """audit=True records every rejection as (id, reason, matched_id):
    exact/near within-batch and exact/near against the corpus, each
    attributed to the surviving doc it collided with."""
    d = _chain_docs(spark)
    a_text, b_text, c_text = d["A"][1], d["B"][1], d["C"][1]
    root = str(tmp_path / "corpus")
    batches = [
        # (5, A) exact-dups (1, A); (2, B) ~ A within batch
        spark.createDataFrame(
            [(1, a_text), (2, b_text), (5, a_text)], ["doc_id", "text"]
        ),
        # (7, A) is an exact re-arrival of corpus doc 1; C is novel
        spark.createDataFrame([(7, a_text), (3, c_text)], ["doc_id", "text"]),
        # (8, B) is a near-dup of corpus doc 1 (jaccard 0.6 >= 0.5)
        spark.createDataFrame([(8, b_text)], ["doc_id", "text"]),
    ]
    out = ingest_sequential(
        batches, root, "doc_id", "text", threshold=0.5, audit=True
    )
    assert _ids(out) == [1, 3]
    audit = {
        (r.id, r.reason, r.matched_id)
        for r in read_published(spark, root + "_audit").collect()
    }
    assert audit == {
        (5, "exact_batch", 1),
        (2, "near_batch", 1),
        (7, "exact_corpus", 1),
        (8, "near_corpus", 1),
    }


def test_replay_writes_no_false_audit_lineage(spark, tmp_path):
    """Replaying a committed batch (same ids, same texts) must reject
    every row WITHOUT minting audit lineage: a rejection row whose
    matched survivor is the doc itself would tell a release review the
    doc is not in the corpus while it is."""
    root = str(tmp_path / "corpus")
    batch = spark.createDataFrame(
        [(1, "alpha beta gamma delta words here"),
         (2, "totally different text content here now")],
        ["doc_id", "text"],
    )
    assert ingest_batch(batch, root, "doc_id", "text", audit=True) == 2
    # at-least-once replay of the SAME batch
    assert ingest_batch(batch, root, "doc_id", "text", audit=True) == 0
    assert _ids(read_published(spark, root)) == [1, 2]
    from prefixtree_spark.sources.io import published_version as _pv

    assert _pv(spark, root + "_audit") == 0  # no audit table at all
    # a GENUINE duplicate from a different id still audits
    dup = spark.createDataFrame(
        [(9, "alpha beta gamma delta words here")], ["doc_id", "text"]
    )
    assert ingest_batch(dup, root, "doc_id", "text", audit=True) == 0
    audit = {(r.id, r.reason, r.matched_id) for r in
             read_published(spark, root + "_audit").collect()}
    assert audit == {(9, "exact_corpus", 1)}


def test_stored_text_hash_column_and_legacy_guard(spark, tmp_path):
    """Survivors carry sha-256(text) under the reserved ``_pt_sha`` column
    INSIDE the corpus segments (the stored exact-text evidence: the
    guard scans two narrow columns, never corpus text). A corpus
    published BEFORE the column existed reads back as NULL rows; the
    guard hashes those on the fly — so exact re-arrivals of legacy
    docs (including short docs with no LSH evidence) are still
    rejected after the chain turns mixed."""
    from prefixtree_spark.sources.io import publish_version

    root = str(tmp_path / "corpus")
    long2 = " ".join(f"legacy{i}" for i in range(20))
    publish_version(
        spark.createDataFrame([(1, "hi"), (2, long2)], ["doc_id", "text"]),
        root,
    )  # legacy segment: no _pt_sha column at all
    fresh4 = " ".join(f"new{i}" for i in range(20))
    # "hi" is shorter than one shingle: only the exact guard can reject
    # it, and the legacy corpus carries no stored hash for it
    assert ingest_batch(
        spark.createDataFrame([(3, "hi"), (4, fresh4)], ["doc_id", "text"]),
        root, "doc_id", "text",
    ) == 1
    corpus = read_published(spark, root)
    assert "_pt_sha" in corpus.columns
    assert _ids(corpus) == [1, 2, 4]
    # mixed chain: stored hashes only for the ingested segment
    assert corpus.where("_pt_sha is not null").count() == 1
    assert corpus.where(
        "_pt_sha is not null and doc_id = 4"
    ).count() == 1
    # batch 2 against the mixed chain: (5) dups the STORED-hash doc 4,
    # (6) dups the legacy NULL-hash doc 2, (7) is novel
    fresh7 = " ".join(f"zz{i}" for i in range(20))
    assert ingest_batch(
        spark.createDataFrame(
            [(5, fresh4), (6, long2), (7, fresh7)], ["doc_id", "text"]
        ),
        root, "doc_id", "text", audit=True,
    ) == 1
    assert _ids(read_published(spark, root)) == [1, 2, 4, 7]
    audit = {(r.id, r.reason, r.matched_id) for r in
             read_published(spark, root + "_audit").collect()}
    assert audit == {(5, "exact_corpus", 4), (6, "exact_corpus", 2)}


def test_hash_fast_path_not_fooled_by_compacted_mixed_chain(spark, tmp_path):
    """Compacting a mixed chain (legacy segment + ingest appends) folds
    everything into ONE segment whose schema HAS ``_pt_sha`` but whose
    legacy rows are NULL. A fast path keyed on schema presence alone
    would drop those rows from the exact guard and re-admit legacy
    short docs — the null-count footer check must reject the fast path
    there, while a pure-ingest corpus still passes it."""
    from prefixtree_spark.sources.io import compact_published, publish_version
    from prefixtree_spark.streaming.ingest import _all_segments_fully_hashed

    root = str(tmp_path / "corpus")
    publish_version(
        spark.createDataFrame([(1, "hi")], ["doc_id", "text"]), root
    )  # legacy: no hash column
    fresh = " ".join(f"mix{i}" for i in range(20))
    assert ingest_batch(
        spark.createDataFrame([(2, fresh)], ["doc_id", "text"]),
        root, "doc_id", "text",
    ) == 1
    compact_published(spark, root)  # one segment, schema has _pt_sha,
    assert not _all_segments_fully_hashed(spark, root, "_pt_sha")
    # "hi" is below one shingle: only the exact guard can reject it —
    # if the fast path engaged on the compacted chain, (3) would slip in
    assert ingest_batch(
        spark.createDataFrame(
            [(3, "hi"), (4, " ".join(f"ok{i}" for i in range(20)))],
            ["doc_id", "text"],
        ),
        root, "doc_id", "text",
    ) == 1
    assert _ids(read_published(spark, root)) == [1, 2, 4]
    # a pure-ingest corpus (every row hashed) does satisfy the fast path
    pure = str(tmp_path / "pure")
    ingest_batch(
        spark.createDataFrame([(1, fresh)], ["doc_id", "text"]),
        pure, "doc_id", "text",
    )
    assert _all_segments_fully_hashed(spark, pure, "_pt_sha")


def test_static_pruned_verify_twin(spark, tmp_path, monkeypatch):
    """The big-corpus verify plan (candidate ids collected and pushed
    into the corpus scan as a literal IN) must keep byte-identical
    greedy semantics with the small-corpus semi-join plan — forced here
    by zeroing the size threshold, over batches that exercise near-dup
    rejects, exact rejects, and accepted docs."""
    from prefixtree_spark.streaming import ingest as ing

    def batches():
        base = " ".join(f"w{i}" for i in range(30))
        near = " ".join(["w0x"] + [f"w{i}" for i in range(1, 30)])
        return [
            spark.createDataFrame(
                [(1, base), (2, " ".join(f"q{i}" for i in range(25)))],
                ["doc_id", "text"],
            ),
            spark.createDataFrame(
                [(3, near), (5, " ".join(f"z{i}" for i in range(25)))],
                ["doc_id", "text"],
            ),
            spark.createDataFrame([(4, base)], ["doc_id", "text"]),
        ]

    r_semi = str(tmp_path / "semi")
    out_semi = ingest_sequential(
        batches(), r_semi, "doc_id", "text", threshold=0.5, audit=True
    )
    ids_semi = _ids(out_semi)
    audit_semi = {(r.id, r.reason, r.matched_id) for r in
                  read_published(spark, r_semi + "_audit").collect()}

    monkeypatch.setattr(ing, "_CAND_STATIC_MIN_CORPUS_BYTES", 0)
    r_stat = str(tmp_path / "stat")
    out_stat = ingest_sequential(
        batches(), r_stat, "doc_id", "text", threshold=0.5, audit=True
    )
    assert _ids(out_stat) == ids_semi == [1, 2, 5]
    audit_stat = {(r.id, r.reason, r.matched_id) for r in
                  read_published(spark, r_stat + "_audit").collect()}
    assert audit_stat == audit_semi
    assert (3, "near_corpus", 1) in audit_stat
    assert (4, "exact_corpus", 1) in audit_stat


def test_empty_params_file_self_heals(spark, tmp_path):
    """A writer that crashed between creating and writing _params used
    to brick the root (every batch saw '' != its params); an empty
    params file is now treated as the crash artifact it is."""
    import os

    root = str(tmp_path / "corpus")
    batch = spark.createDataFrame(
        [(1, "some document text with words")], ["doc_id", "text"]
    )
    assert ingest_batch(batch, root, "doc_id", "text") == 1
    params_path = os.path.join(str(tmp_path), "corpus_bands", "_params")
    with open(params_path, "w"):
        pass  # truncate: simulate the crash artifact
    b2 = spark.createDataFrame(
        [(2, "a second unrelated document entirely")], ["doc_id", "text"]
    )
    assert ingest_batch(b2, root, "doc_id", "text") == 1
    with open(params_path) as fh:
        assert fh.read() == "3,64,32"


def test_ingest_max_df_cap_semantics(spark, tmp_path):
    """The boilerplate skew cap (r5 verdict #6): a huge max_df equals
    the uncapped run exactly; a tiny max_df still rejects exact
    replays (the exact-text guard needs no buckets) and still accepts
    genuinely new docs."""
    boiler = " ".join(f"cap{i}" for i in range(40))

    def docs(lo, hi):
        return spark.createDataFrame(
            [(i, f"{boiler} tail {i} {i * 7 + 3} {i * 13 + 1}")
             for i in range(lo, hi)],
            "doc_id long, text string",
        )

    clean = spark.createDataFrame(
        [(900, " ".join(f"fresh{i}x" for i in range(20)))],
        "doc_id long, text string",
    )
    # uncapped vs effectively-uncapped (max_df larger than any bucket):
    # identical survivor sets
    r1, r2 = str(tmp_path / "u"), str(tmp_path / "h")
    ingest_batch(docs(0, 20), r1, "doc_id", "text")
    ingest_batch(docs(0, 20), r2, "doc_id", "text", max_df=10_000)
    k1 = ingest_batch(docs(20, 30), r1, "doc_id", "text")
    k2 = ingest_batch(docs(20, 30), r2, "doc_id", "text", max_df=10_000)
    assert k1 == k2
    assert _ids(read_published(spark, r1)) == _ids(read_published(spark, r2))
    # tiny cap: exact replay of committed docs is still fully rejected,
    # and a clean doc is still accepted
    r3 = str(tmp_path / "t")
    ingest_batch(docs(0, 20), r3, "doc_id", "text", max_df=1)
    replay = docs(0, 10).withColumn("doc_id", F.col("doc_id") + 1000)
    assert ingest_batch(replay, r3, "doc_id", "text", max_df=1) == 0
    assert ingest_batch(clean, r3, "doc_id", "text", max_df=1) == 1


def test_maintain_ingest_clusters_corpus_by_id(spark, tmp_path):
    """maintain_ingest(cluster_ids=) range-clusters the corpus rewrite
    (key-sorted rows — the layout the pinned literal-IN candidate
    fetch prunes by id stats) while leaving content and later-batch
    dedup behavior identical; the bands table is untouched by design."""
    import os

    import pyarrow.parquet as pq

    from prefixtree_spark.sources.io import published_segments
    from prefixtree_spark.streaming.ingest import maintain_ingest

    root = str(tmp_path / "corpus")
    texts = [" ".join(f"c{b}_{i}" for i in range(12)) for b in range(3)]
    for b in range(3):
        ingest_batch(
            spark.createDataFrame([(b, texts[b])], ["doc_id", "text"]),
            root, "doc_id", "text",
        )
    maintain_ingest(spark, root, max_segments=2, keep=1, cluster_ids="doc_id")
    assert _ids(read_published(spark, root)) == [0, 1, 2]
    (vdir, _), = published_segments(spark, root)
    for dirpath, _, files in os.walk(os.path.join(root, vdir)):
        for f in files:
            if f.endswith(".parquet"):
                ids = pq.read_table(
                    os.path.join(dirpath, f), columns=["doc_id"]
                ).column("doc_id").to_pylist()
                assert ids == sorted(ids)
    # dedup against the clustered corpus: replay + novel
    ingest_batch(
        spark.createDataFrame(
            [(10, texts[1]), (11, " ".join(f"n{i}" for i in range(12)))],
            ["doc_id", "text"],
        ),
        root, "doc_id", "text",
    )
    assert _ids(read_published(spark, root)) == [0, 1, 2, 11]


def test_streaming_sink_keeps_bm25_index_in_sync(spark, tmp_path):
    """The streaming sink's sparse half: every micro-batch's corpus
    commit is followed by a BM25 sync, so the stored index equals a
    fresh build over the published survivors — from the stream
    boundary, exactly once."""
    from pyspark.sql import functions as F

    from prefixtree_spark.operators import ranking
    from prefixtree_spark.sources.io import read_published
    from prefixtree_spark.streaming.ingest import streaming_ingest_corpus

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    src = str(tmp_path / "src")
    docs.repartition(4).write.parquet(src)
    root = str(tmp_path / "corpus")
    ipath = str(tmp_path / "bm25")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = streaming_ingest_corpus(
        stream, root, "doc_id", "text",
        bm25_index_path=ipath,
        bm25_opts={"n_buckets": 4, "idf": "ratio"},
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    corpus = read_published(spark, root)
    qdf = corpus.select(
        F.col("doc_id").alias("qid"),
        F.slice(
            F.regexp_extract_all("text", F.lit(r"\S+"), 0), 1, 3
        ).alias("terms"),
    ).where("doc_id % 7 = 0 AND size(terms) >= 3")
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank(
            corpus, "doc_id", "text", qdf, "qid", "terms", idf="ratio"
        ).collect()
    }
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(
            spark, ipath, qdf, "qid", "terms"
        ).collect()
    }
    assert got == want and got
