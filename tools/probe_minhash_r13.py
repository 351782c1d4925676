"""r13 optimization-round-2 probe: dedup_minhash_lsh cross-stage fusion.

Current pipeline: shingles (cached) -> [signatures: xxhash64 + groupBy
collect_list + Arrow UDF] -> bands -> candidate equi-join -> [verify:
candidates x shingles double join + groupBy + two size joins].

Candidate fusion: group (doc, xxhash64(shingle)) ONCE into
(doc, hs: array<long>), cache THAT, and feed it to both the signature
UDF and a hash-set verify (size(array_intersect(hs1, hs2))).  The
verify's exploded candidates-x-shingles shuffle disappears; sizes come
from size(hs) (= exact distinct-shingle count) instead of a groupBy.
Identity: intersections over 64-bit shingle fingerprints equal shingle
intersections except on xxhash64 collisions (w.h.p.; same fingerprint
space the signatures already trust).

Measures old vs new wall (warm, interleaved) and asserts identical
result rows at sf0.1.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from prefixtree_spark.operators.dedup import (
        _band_buckets,
        _jaccard_from_shingles,
        minhash_signatures,
        token_shingles,
    )
    from prefixtree_spark.session import get_spark
    from prefixtree_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_minhash")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").cache()
    docs.count()
    threshold, num_perm, bands = 0.8, 64, 32
    rows = num_perm // bands

    def old_pipeline():
        sh = token_shingles(docs, "doc_id", "text", 3).cache()
        banded = _band_buckets(minhash_signatures(sh, num_perm=num_perm), bands, rows)
        x, y = banded.alias("x"), banded.alias("y")
        cand = (
            x.join(
                y,
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.doc") < F.col("y.doc")),
            )
            .select(F.col("x.doc").alias("id1"), F.col("y.doc").alias("id2"))
            .distinct()
        )
        out = _jaccard_from_shingles(sh, threshold, candidates=cand)
        res = out.collect()
        sh.unpersist()
        return res

    rng = np.random.default_rng(42)
    mults = (
        rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) << np.uint64(1)
    ) | np.uint64(1)

    @F.pandas_udf("array<long>")
    def sig_udf(hs: pd.Series) -> pd.Series:
        out = []
        with np.errstate(over="ignore"):
            for arr in hs:
                h = np.asarray(arr, dtype=np.uint64)
                m = (h[:, None] * mults[None, :]) >> np.uint64(3)
                out.append(m.min(axis=0).astype(np.int64))
        return pd.Series(out)

    def new_pipeline():
        sh = token_shingles(docs, "doc_id", "text", 3)
        hs = (
            sh.select("doc", F.xxhash64("shingle").alias("h"))
            .groupBy("doc")
            .agg(F.collect_list("h").alias("hs"))
            .cache()
        )
        sig = hs.select("doc", sig_udf("hs").alias("sig"))
        banded = _band_buckets(sig, bands, rows)
        x, y = banded.alias("x"), banded.alias("y")
        cand = (
            x.join(
                y,
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.doc") < F.col("y.doc")),
            )
            .select(F.col("x.doc").alias("id1"), F.col("y.doc").alias("id2"))
            .distinct()
        )
        h1 = hs.select(F.col("doc").alias("id1"), F.col("hs").alias("hs1"))
        h2 = hs.select(F.col("doc").alias("id2"), F.col("hs").alias("hs2"))
        out = (
            cand.join(h1, "id1")
            .join(h2, "id2")
            .select(
                "id1",
                "id2",
                F.size(F.array_intersect("hs1", "hs2")).alias("ic"),
                F.size("hs1").alias("sz1"),
                F.size("hs2").alias("sz2"),
            )
            .withColumn("jaccard", F.col("ic") / (F.col("sz1") + F.col("sz2") - F.col("ic")))
            .where(F.col("jaccard") >= threshold)
            .select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))
        )
        res = out.collect()
        hs.unpersist()
        return res

    # identity check once
    r_old = sorted((r.id1, r.id2, r.jaccard) for r in old_pipeline())
    r_new = sorted((r.id1, r.id2, r.jaccard) for r in new_pipeline())
    assert r_old == r_new, (
        len(r_old),
        len(r_new),
        [t for t in r_old if t not in set(r_new)][:5],
        [t for t in r_new if t not in set(r_old)][:5],
    )
    print(f"identity OK: {len(r_old)} rows")

    # interleaved warm timing
    for rep in range(4):
        t0 = time.time()
        old_pipeline()
        t_old = time.time() - t0
        t0 = time.time()
        new_pipeline()
        t_new = time.time() - t0
        print(f"[rep{rep}] old={t_old:.3f}s new={t_new:.3f}s")

    spark.stop()


if __name__ == "__main__":
    main()
