"""End-to-end corpus preparation: each stage's effect is visible on a
hand-built corpus, and the result is deterministic."""

from prefixtree_spark.pipeline import prepare_corpus


def _docs(spark):
    good = (
        "the project of the committee is to review and approve the annual "
        "report of the service in a fair and open manner for all members"
    )
    rows = [
        (1, good),
        (2, good + " extra tail words here"),          # near-dup of 1
        (3, "x! y? z. #, @! ~~ !!"),                   # junk → low quality
        (4, "der und die das ist nicht ein von mit auch sich auf es der und die"),  # German
        (5, "completely different clean text about the weather and the sea and the sky today"),
        (6, good.replace("annual", "yearly")),         # near-dup of 1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_prepare_corpus_stages(spark):
    docs = _docs(spark)
    test_set = spark.createDataFrame(
        [(100, "clean text about the weather and the sea")], ["doc_id", "text"]
    )
    out = prepare_corpus(
        docs,
        "doc_id",
        "text",
        test_set=test_set,
        min_quality=0.3,
        languages=["en"],
        dedup_threshold=0.5,
        decontaminate_n=5,
        splits={"train": 0.5, "test": 0.5},
        split_seed="s",
    ).collect()
    survivors = {r.doc_id for r in out}
    # 3 dies on quality, 4 on language, 2/6 lose near-dup to min-id 1,
    # 5 is decontaminated by the test set's 5-gram
    assert survivors == {1}
    row = out[0]
    assert row.quality >= 0.3
    assert row.lang_pred == "en"
    assert row.split in ("train", "test")


def test_prepare_corpus_deterministic(spark):
    docs = _docs(spark)
    a = sorted(
        (r.doc_id, r.split)
        for r in prepare_corpus(
            docs, "doc_id", "text", splits={"train": 0.5, "test": 0.5}
        ).collect()
    )
    b = sorted(
        (r.doc_id, r.split)
        for r in prepare_corpus(
            docs.repartition(7), "doc_id", "text",
            splits={"train": 0.5, "test": 0.5},
        ).collect()
    )
    assert a == b


def test_prepare_corpus_quota_and_packing(spark):
    rows = [
        (i, "src%d" % (i % 2), "token " * 10 + "word%d unique%d tail%d" % (i, i * 7, i * 13))
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = prepare_corpus(
        docs,
        "doc_id",
        "text",
        min_quality=0.0,
        dedup_threshold=0.95,
        quota_col="source",
        quota_n=4,
        splits={"train": 0.5, "test": 0.5},
        split_seed="s",
        pack_budget=20,
    ).collect()
    # quota: at most 4 docs per source survive
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert all(len(v) <= 4 for v in by_src.values()) and len(out) > 0
    # packing groups default to the split column: offsets restart per
    # split and every doc's window id is its offset div budget
    for split in {r.split for r in out}:
        grp = sorted((r for r in out if r.split == split), key=lambda r: r.doc_id)
        offset = 0
        for r in grp:
            assert (r.token_offset, r.bin_id) == (offset, offset // 20)
            offset += r.n_tokens


def test_quota_does_not_starve_splits(spark):
    """Quota ordering must use a seed DERIVED from split_seed, not the
    seed itself — sharing it hands every quota survivor to the first
    split name (review finding)."""
    rows = [(i, "s", "unique text %d %d %d" % (i, i * 7, i * 13)) for i in range(400)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = prepare_corpus(
        docs, "doc_id", "text",
        min_quality=0.0, dedup_threshold=0.99,
        quota_col="source", quota_n=100,
        splits={"train": 0.5, "test": 0.5}, split_seed="s",
    ).collect()
    by_split = {}
    for r in out:
        by_split[r.split] = by_split.get(r.split, 0) + 1
    assert len(out) == 100
    # both splits populated, neither hoarding > 75% of survivors
    assert set(by_split) == {"train", "test"}
    assert max(by_split.values()) <= 75, by_split


def test_ensure_cached_artifact_reraises_real_rename_failures(tmp_path, monkeypatch):
    """ADVICE r9 #4: only a lost RACE (artifact already published by
    the winner) may swallow the rename OSError — an EXDEV/permission
    failure that leaves nothing at the final path must re-raise, not
    surface later as a confusing parquet error far from the cause."""
    import os

    import pytest as _pt

    from prefixtree_spark.workloads_ext import _ensure_cached_artifact

    # failure case: rename raises, nothing at path -> re-raise
    path = str(tmp_path / "artifact")

    def _build(staging):
        os.makedirs(os.path.join(staging, "meta"))

    real_rename = os.rename

    def _bad_rename(src, dst):
        raise OSError(18, "Invalid cross-device link")  # EXDEV

    monkeypatch.setattr(os, "rename", _bad_rename)
    with _pt.raises(OSError):
        _ensure_cached_artifact(path, _build)

    # race case: a concurrent winner published DURING our build — the
    # rename failure is benign and must be swallowed
    path2 = str(tmp_path / "artifact2")

    def _racer_build(staging):
        os.makedirs(os.path.join(staging, "meta"))
        real_makedirs(os.path.join(path2, "meta"))  # the racer's publish

    real_makedirs = os.makedirs
    assert _ensure_cached_artifact(path2, _racer_build) == path2

    # and a fresh build isn't even attempted when the artifact exists
    monkeypatch.setattr(os, "rename", real_rename)

    def _boom(staging):
        raise AssertionError("build must not run when artifact exists")

    assert _ensure_cached_artifact(path2, _boom) == path2


def test_ensure_cached_artifact_rebuilds_meta_less_corpse(tmp_path):
    """r10 advice: a cache dir that exists WITHOUT meta/ (a crash
    inside an in-place maintenance swap deletes live meta/ before the
    staged rename lands) must be deleted and rebuilt — the rename
    cannot publish onto a non-empty dir, so the old behavior failed
    every subsequent run until the dir was removed by hand."""
    import os

    from prefixtree_spark.workloads_ext import _ensure_cached_artifact

    path = str(tmp_path / "corpse")
    os.makedirs(os.path.join(path, "postings"))  # meta-less corpse
    # age the corpse past the staleness threshold (r11 advice: a YOUNG
    # meta-less dir may be a healthy concurrent swap mid-window and
    # must NOT be reclaimed; only provably stale dirs are)
    import time

    old = time.time() - 3600
    os.utime(path, (old, old))
    built = []

    def _build(staging):
        built.append(staging)
        os.makedirs(os.path.join(staging, "meta"))

    assert _ensure_cached_artifact(path, _build) == path
    assert built and os.path.isdir(os.path.join(path, "meta"))
    assert not os.path.isdir(os.path.join(path, "postings"))


def test_ensure_cached_artifact_waits_out_concurrent_swap(tmp_path):
    """r11 advice: a meta-less dir younger than the staleness threshold
    is a concurrent maintenance swap's transient window, not a corpse —
    the sweep must WAIT for meta/ to land and then use the artifact,
    never delete it out from under the swapper."""
    import os
    import threading
    import time

    from prefixtree_spark.workloads_ext import _ensure_cached_artifact

    path = str(tmp_path / "swapping")
    os.makedirs(os.path.join(path, "postings"))  # mid-swap: no meta yet

    def _finish_swap():
        time.sleep(1.0)
        os.makedirs(os.path.join(path, "meta"))  # the swap lands

    t = threading.Thread(target=_finish_swap)
    t.start()

    def _boom(staging):
        raise AssertionError("must not rebuild over a live swap")

    try:
        assert _ensure_cached_artifact(path, _boom, stale_s=30.0) == path
    finally:
        t.join()
    assert os.path.isdir(os.path.join(path, "postings"))  # untouched
