"""Generic columnar-agnostic sources and sinks.

The engine's pipelines are format-independent (everything downstream
is DataFrame-in / DataFrame-out); these helpers make the boundary
explicit and keep the scan declarative so Catalyst's pushdown/pruning
applies wherever the format supports it.

Format guidance at 100 TB, stated once here rather than re-litigated
per call site:
  - parquet (default): columnar, predicate pushdown + column pruning
    reach the scan; always the answer for analytics-shaped data.
  - csv / json: row-major interchange formats — schema inference costs
    an extra full pass, so ALWAYS pass ``schema`` for datasets that
    matter; pushdown is filter-only (no column pruning at the byte
    level). Use for ingest boundaries, convert to parquet immediately
    (``convert_to_parquet``).
  - orc: columnar alternative, same planner benefits as parquet.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

_READ_FORMATS = ("parquet", "orc", "csv", "json")


def read_source(
    spark: SparkSession,
    path: str,
    *,
    format: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Declarative scan of ``path`` in the given format. ``schema`` is
    a DDL string (``"id BIGINT, name STRING"``); omitting it on
    csv/json triggers inference (an extra pass over the data — fine
    interactively, wrong inside a 100 TB pipeline). csv defaults to
    ``header=true`` unless overridden."""
    if format not in _READ_FORMATS:
        raise ValueError(f"format must be one of {_READ_FORMATS}, got {format!r}")
    reader = spark.read.format(format)
    if format == "csv":
        reader = reader.option("header", options.pop("header", "true"))
        if schema is None:
            reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_sink(
    df: DataFrame,
    path: str,
    *,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write ``df`` to ``path``. ``partition_by`` produces the
    hive-style directory layout that turns downstream equality filters
    on those columns into PARTITION PRUNING (entire directories never
    open) — the first layout decision for any table re-read by key
    (e.g. split=train/val/test from ``split_assign``, or per-source
    corpus shards)."""
    writer = df.write.format(format).mode(mode)
    if format == "csv":
        writer = writer.option("header", options.pop("header", "true"))
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    format: str = "parquet",
    target_file_mb: int = 256,
) -> int:
    """Small-files compaction: rewrite ``src_path`` into files of
    ~``target_file_mb`` each; returns the output file count.

    The operational problem this solves: streaming sinks, incremental
    ingests, and over-parallel writes leave thousands of KB-sized
    files, and at 100 TB the NameNode/listing cost plus per-file open
    overhead dominates the scan. File count is sized from the SOURCE
    byte size (listing metadata — no data pass); the rewrite is one
    job whose only wide stage is the ``repartition`` round-robin
    exchange. Rewrites to a NEW path: an in-place rewrite that crashes
    mid-job loses the table. For a swap WITHOUT a caller-visible
    window, use the manifest-pointer tables below
    (``publish_version`` / ``compact_published`` — the plain-directory
    OPTIMIZE); Delta/Iceberg replace both with log commits."""
    sc = spark.sparkContext
    hadoop_path = sc._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = hadoop_path.getFileSystem(sc._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hadoop_path).getLength()
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = read_source(spark, src_path, format=format)
    write_sink(df.repartition(n_files), dst_path, format=format)
    out_path = sc._jvm.org.apache.hadoop.fs.Path(dst_path)
    listed = fs.listStatus(out_path)
    return sum(
        1 for st in listed if st.getPath().getName().endswith(f".{format}")
    )


def convert_to_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    format: str = "csv",
    schema: str | None = None,
    partition_by: list[str] | None = None,
    **options: str,
) -> DataFrame:
    """Ingest boundary: read a row-major interchange format once,
    land it as parquet (optionally hive-partitioned), return the
    parquet-backed frame. The one place a pipeline should ever scan
    csv/json twice is never."""
    df = read_source(spark, src_path, format=format, schema=schema, **options)
    write_sink(df, dst_path, format="parquet", partition_by=partition_by)
    return spark.read.parquet(dst_path)


# ---------------------------------------------------------------------------
# atomic publish: manifest-pointer versioned tables on plain directories
# ---------------------------------------------------------------------------
#
# compact/add_words outputs rewrite whole tables; on plain directories
# the old "write to new path, caller swaps" dance had a window where a
# crashed rewrite could strand readers (SCALING.md ACID appendix).
# This closes it without a table-format dependency, using the pattern
# Structured Streaming's HDFSMetadataLog uses for exactly-once file
# sinks: immutable version directories plus a log of numbered manifest
# files, where a manifest entry is CREATED ATOMICALLY (write to a temp
# name, then rename — atomic on HDFS and POSIX; rename-if-absent also
# arbitrates concurrent publishers). Readers resolve the newest
# manifest entry; a writer that dies before its rename leaves only an
# unreferenced data directory, never a partial table.

_MANIFEST_DIR = "_manifest"

import re as _re

# txn ids live inside the tab-separated manifest payload
_TXN_OK = _re.compile(r"[A-Za-z0-9._:\-]{1,200}")

# Retired-txn markers (Delta's setTransaction-retention idea): vacuum
# deletes manifest entries of superseded versions, which would erase
# the txn= tags append_published's exactly-once replay check scans — a
# foreachBatch replay landing after an aggressive vacuum would then
# re-append its batch. So BEFORE deleting a txn-tagged entry, vacuum
# drops a tiny marker file under root/_txns recording (txn id,
# committed version); the replay check consults markers after the
# manifest scan. Markers are one small file per retired txn,
# independent of snapshot retention (keep=1 stays safe), and are named
# by a hash of the id because txn ids admit ':' which Hadoop Path
# rejects in a filename component.
_TXN_DIR = "_txns"


def _txn_marker_path(root: str, txn: str) -> str:
    import hashlib

    h = hashlib.sha256(txn.encode("utf-8")).hexdigest()[:40]
    return f"{root}/{_TXN_DIR}/t_{h}"


def _retire_txn(spark: SparkSession, root: str, txn: str, version: int) -> bool:
    """Record (txn, version) create-if-absent. Returns True iff the
    marker is CONFIRMED on the filesystem with the expected body —
    losing a create race to another vacuum is fine (both write the
    same committed version, and the exists+body check confirms it),
    but a genuine write failure (permissions, transient FS error)
    returns False so the caller keeps the txn-tagged manifest entry:
    deleting it anyway would erase the txn's only record and let a
    foreachBatch replay re-append the batch."""
    fs, jvm = _fs(spark, root)
    mp = _txn_marker_path(root, txn)
    p = jvm.org.apache.hadoop.fs.Path(mp)
    try:
        out = fs.create(p, False)
        try:
            out.write(bytearray(f"{txn}\t{version}".encode("utf-8")))
        finally:
            out.close()
        return True
    except Exception:
        # create-if-absent failed: either the marker already exists
        # (racer / earlier vacuum — same content) or the write itself
        # failed. Only filesystem evidence distinguishes them; a body
        # mismatch (partial write, or a truncated-hash collision with
        # a DIFFERENT txn) also counts as unconfirmed — never
        # overwrite, the colliding txn's marker is load-bearing.
        try:
            if not fs.exists(p):
                return False
            body = _read_small_file(spark, mp).split("\t")
            return len(body) == 2 and body[0] == txn and body[1] == str(version)
        except Exception:
            return False


def _retired_txn_version(spark: SparkSession, root: str, txn: str) -> int | None:
    fs, jvm = _fs(spark, root)
    p = jvm.org.apache.hadoop.fs.Path(_txn_marker_path(root, txn))
    if not fs.exists(p):
        return None
    body = _read_small_file(spark, _txn_marker_path(root, txn)).split("\t")
    # the full id is stored in the body: a (vanishingly unlikely)
    # truncated-hash collision must not replay the WRONG txn
    if len(body) == 2 and body[0] == txn:
        return int(body[1])
    return None

# manifest entry payload: "vdirs\tformat[\tmode]" where mode is
# "replace" (default; the entry's directories ARE the table) or
# "append" (the entry adds segments on top of the previous live
# snapshot — the add-file commit of a Delta-style log, giving
# O(|delta|) ingest commits instead of O(|corpus|) rewrites).
# Two-field entries written before append support read as replace —
# old tables stay valid. ``vdirs`` is one directory name or several
# joined by "," — the multi-dir form is the COPY-ON-WRITE commit
# (delete_published / upsert_published): a new snapshot that
# RE-REFERENCES untouched immutable segment directories and adds only
# the rewritten ones, so a row-level delete costs O(matching segments)
# instead of O(table). Single-dir readers written before COW support
# parse the multi-dir form too (the split is unconditional).


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), jvm


def _manifest_entries(spark: SparkSession, root: str) -> list[tuple[int, str]]:
    """Sorted (version, manifest-path) pairs; tolerates foreign files."""
    fs, jvm = _fs(spark, root)
    mdir = jvm.org.apache.hadoop.fs.Path(f"{root}/{_MANIFEST_DIR}")
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.isdigit():
            out.append((int(name), str(st.getPath())))
    return sorted(out)


def _read_small_file(spark: SparkSession, path: str) -> str:
    """Whole-file read in ONE py4j round trip: manifest resolution runs
    per segment per read_published call — e.g. every ingest micro-batch
    — so the old byte-per-round-trip loop cost ~N_bytes driver↔JVM hops
    per entry. commons-io ships on Spark's classpath; the byte loop
    stays as the fallback for exotic classpaths."""
    fs, jvm = _fs(spark, path)
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(path))
    try:
        try:
            return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        except Exception:
            data = bytearray()
            while True:
                b = stream.read()
                if b < 0:
                    break
                data.append(b)
            return data.decode("utf-8")
    finally:
        stream.close()


def _range_cluster(df: DataFrame, cluster_by: list[str]) -> DataFrame:
    """Lay ``df`` out range-clustered on ``cluster_by``: disjoint key
    ranges per output partition (one shuffle + a sampling pass), rows
    sorted within each. The point is parquet/ORC min-max FILE stats:
    a later point/IN/range filter on the key skips every file whose
    range can't match — the plain-directory analog of Delta's
    OPTIMIZE ZORDER for the single-key case, and what makes the
    ingest path's pinned literal-IN candidate fetch prune I/O instead
    of scanning the corpus. Hash layouts give overlapping per-file
    ranges, so stats prune nothing there."""
    return df.repartitionByRange(*cluster_by).sortWithinPartitions(*cluster_by)


def publish_version(
    df: DataFrame,
    root: str,
    *,
    format: str = "parquet",
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
) -> int:
    """Write ``df`` as a NEW immutable version of the table at ``root``
    and atomically make it the live one; returns the version number.

    Write order is the whole guarantee: (1) the data lands complete
    under ``root/v_<n>/`` (a crash here leaves an unreferenced
    directory — garbage, not corruption); (2) the manifest entry is
    written to a temp name and RENAMED to ``root/_manifest/<n>`` —
    readers either resolve the previous version or the new one, never
    anything partial. Rename-if-absent arbitrates racing publishers:
    the loser's rename fails (the number is taken) and it retries with
    the next number against the new snapshot — single-writer pipelines
    never loop.

    ``cluster_by`` range-clusters the layout on those columns (see
    ``_range_cluster``) so key-filtered re-reads prune files by
    min-max stats. Pick the column your readers filter by (doc id for
    ingest corpora); composes with ``partition_by`` (cluster within
    hive partitions)."""
    if cluster_by:
        df = _range_cluster(df, cluster_by)
    return _publish_entry(df, root, "replace", format, partition_by)


def append_published(
    df: DataFrame,
    root: str,
    *,
    format: str = "parquet",
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    txn: str | None = None,
) -> int:
    """Atomically ADD ``df`` as a new segment of the table at ``root``
    (readers see old-snapshot-or-new, never partial) and return the
    version number. The live table becomes the previous snapshot plus
    this segment — the add-file commit shape, costing O(|df|) per
    commit where ``publish_version`` would rewrite the whole table.
    This is what incremental ingest (streaming sinks, ``add_words``
    deltas, crawl snapshots) should call per batch; run
    ``compact_published`` out of band to fold long append chains back
    into one directory before segment-count listing costs show up.

    ``cluster_by`` range-clusters THIS batch's files; ranges across
    different append segments still overlap (each batch spans the key
    space), so compaction — which re-clusters globally when given the
    same ``cluster_by`` — is what restores whole-table pruning.

    ``txn`` makes the append EXACTLY-ONCE under retries (the Delta
    txnAppId/txnVersion idea on the manifest): the id is recorded in
    the committed entry, and a later append carrying the same id
    returns that entry's version without writing anything — so a
    crashed-and-retried streaming micro-batch (see
    ``streaming.sink.stream_append_published``) can never land twice.
    The replay check re-scans manifest payloads inside the commit
    retry loop, so two racers with the same id resolve to one commit:
    the loser's number-taken retry re-reads the winner's entry. Scan
    cost is one small-file read per still-retained manifest entry —
    ``vacuum_published`` is what keeps that bounded, and it retires the
    txn tags of the entries it deletes into ``_txns`` markers the
    replay check also consults, so exactly-once survives ANY vacuum
    ``keep`` (no minimum-retention coupling between snapshot cleanup
    and stream replay windows)."""
    if txn is not None and not _TXN_OK.fullmatch(txn):
        raise ValueError(
            f"txn id {txn!r} must match {_TXN_OK.pattern} (it is stored "
            "inside the tab-separated manifest payload)"
        )
    if cluster_by:
        df = _range_cluster(df, cluster_by)
    return _publish_entry(df, root, "append", format, partition_by, txn=txn)


class ConcurrentPublishError(RuntimeError):
    """The snapshot moved between resolving it and committing a version
    built FROM it (e.g. an append landed while a compaction was
    rewriting). The caller must re-resolve and redo its derived write —
    retrying the commit alone would publish a stale-snapshot replace
    that silently drops the interleaved segment."""


def _publish_entry(
    df: DataFrame,
    root: str,
    mode: str,
    format: str,
    partition_by: list[str] | None,
    expected_version: int | None = None,
    txn: str | None = None,
) -> int:
    import uuid as _uuid

    fs, jvm = _fs(spark := df.sparkSession, root)
    attempts = 0
    while True:
        entries = _manifest_entries(spark, root)
        if txn is not None:
            # exactly-once replay check, INSIDE the retry loop: a racer
            # that loses the version number re-lists and finds the
            # winner's txn tag here before trying again
            tag = f"txn={txn}"
            for vn, mpath in entries:
                # membership, not equality: future payload fields must
                # not blind the replay check into duplicating a batch
                if tag in _read_small_file(spark, mpath).split("\t")[3:]:
                    return vn
            # the entry may have been vacuumed away — its txn survives
            # as a retired-txn marker (see _retire_txn)
            rv = _retired_txn_version(spark, root, txn)
            if rv is not None:
                return rv
        n = entries[-1][0] + 1 if entries else 1
        if expected_version is not None and n != expected_version:
            raise ConcurrentPublishError(
                f"snapshot at {root!r} moved: expected to commit version "
                f"{expected_version}, next is {n}"
            )
        vdir = f"v_{n:011d}_{_uuid.uuid4().hex[:8]}"
        write_sink(
            df, f"{root}/{vdir}", format=format, partition_by=partition_by
        )
        payload = f"{vdir}\t{format}\t{mode}"
        if txn is not None:
            payload += f"\ttxn={txn}"
        if _try_commit(spark, root, n, payload):
            return n
        # lost the race: clean our orphan data dir, retry
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/{vdir}"), True)
        if expected_version is not None:
            raise ConcurrentPublishError(
                f"lost the commit race for version {n} at {root!r}"
            )
        attempts += 1
        if attempts > 100:
            raise RuntimeError(f"_publish_entry: contended beyond reason at {root}")


def _try_commit(spark: SparkSession, root: str, n: int, payload: str) -> bool:
    """One attempt at atomically installing manifest entry ``n`` with
    ``payload``; True iff WE committed it (False = another publisher
    owns that version number; the caller cleans up its own data dirs)."""
    return _atomic_create(spark, f"{root}/{_MANIFEST_DIR}/{n}", payload)


def _atomic_create(spark: SparkSession, final_path: str, payload: str) -> bool:
    """Create ``final_path`` with ``payload`` iff it does not exist;
    True iff WE created it — the create-if-absent primitive behind
    manifest commits and the maintenance writer lease.

    Arbitration: HDFS rename refuses an existing destination, but
    RawLocalFileSystem delegates to rename(2), which silently REPLACES
    it — two claimants would both "win" and the first's committed
    content would vanish. On a local FS, claim via link(2) instead
    (java.nio.Files.createLink): hard-linking the fully-written tmp
    onto the final name is atomic AND fails if the destination exists,
    so exactly one racer can ever claim a given name — no
    exists→rename window at all. On HDFS the rename itself arbitrates
    (no-replace semantics); the read-back content check (payloads
    embed the claimant's uuid) stays as belt-and-braces on both
    paths."""
    import uuid as _uuid

    fs, jvm = _fs(spark, final_path)
    parent, name = final_path.rsplit("/", 1)
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{parent}/.tmp-{name}-{_uuid.uuid4().hex}"
    )
    final = jvm.org.apache.hadoop.fs.Path(final_path)
    out = fs.create(tmp, False)
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()
    if fs.getScheme() == "file":
        # java.io.File(...).toPath(), not Paths.get: py4j cannot
        # dispatch Paths.get's String varargs signature
        try:
            jvm.java.nio.file.Files.createLink(
                jvm.java.io.File(
                    fs.makeQualified(final).toUri().getPath()
                ).toPath(),
                jvm.java.io.File(
                    fs.makeQualified(tmp).toUri().getPath()
                ).toPath(),
            )
            linked = True
        except Exception:
            linked = False
        fs.delete(tmp, False)
        return linked and _read_small_file(spark, str(final)) == payload
    won = (
        not fs.exists(final)
        and fs.rename(tmp, final)
        and not fs.exists(tmp)
        and _read_small_file(spark, str(final)) == payload
    )
    if not won:
        fs.delete(tmp, False)
    return won


def _parse_entry(content: str) -> tuple[list[str], str, str]:
    """(vdirs, format, mode) from a manifest payload; two-field entries
    predate append support and mean replace; the first field is one
    directory name or several comma-joined (the COW commit shape)."""
    parts = content.split("\t")
    return (
        parts[0].split(","),
        parts[1],
        (parts[2] if len(parts) > 2 else "replace"),
    )


def _resolve_chain(
    spark: SparkSession, entries: list[tuple[int, str]]
) -> list[tuple[str, str]]:
    """The (vdir, format) segments of the snapshot defined by the LAST
    entry: that entry plus, walking backwards, every append under it
    until (and including) the first replace. Oldest segment first;
    multi-dir (COW) entries expand to one element per directory, in
    the order the committer listed them."""
    chain: list[tuple[str, str]] = []
    for _, mpath in reversed(entries):
        vdirs, fmt, mode = _parse_entry(_read_small_file(spark, mpath))
        chain.extend((vdir, fmt) for vdir in reversed(vdirs))
        if mode == "replace":
            break
    return list(reversed(chain))


def _entries_at(
    spark: SparkSession, root: str, version: int | None
) -> list[tuple[int, str]]:
    """Manifest entries up to and including ``version`` (all of them
    when ``version`` is None). Raises when the table is empty or the
    requested version is not resolvable — vacuumed-away versions lose
    their manifest entries, so a stale pin fails HERE with the
    still-available range, never half-resolves."""
    entries = _manifest_entries(spark, root)
    if not entries:
        raise FileNotFoundError(f"no published version under {root!r}")
    if version is None:
        return entries
    idx = next((i for i, (n, _) in enumerate(entries) if n == version), None)
    if idx is None:
        raise ValueError(
            f"version {version} is not resolvable at {root!r}; "
            f"available: {[n for n, _ in entries]} (older versions are "
            "dropped by vacuum_published — raise its `keep` to retain "
            "pinned snapshots longer)"
        )
    return entries[: idx + 1]


def read_published(
    spark: SparkSession, root: str, *, version: int | None = None
) -> DataFrame:
    """Scan a snapshot of a published table: resolve the manifest
    entry's segment chain (its base replace version plus any appends
    on top), union the immutable directories. By default the LIVE
    snapshot; ``version=`` pins a historical one — the time-travel
    read that makes a training run reproducible (record
    ``published_version`` at run start, read that number forever
    after). A concurrent (even crashing) publish never changes what an
    already-resolved reader scans — segment directories are immutable,
    and compaction REWRITES into new directories, so a pinned version
    stays byte-stable until ``vacuum_published`` drops it (at which
    point the pin fails loudly with the available range).

    Schema drift across segments is tolerated: an append batch that
    adds a column (the normal crawl-evolution case the source layer
    already merges via ``mergeSchema``) must not make every later read
    throw, so the union fills columns missing on either side with
    NULL (``allowMissingColumns``). Column order follows the OLDEST
    segment first, with later additions appended. A version pinned
    BEFORE an evolving append reads back the old schema exactly."""
    entries = _entries_at(spark, root, version)
    out: DataFrame | None = None
    for vdir, fmt in _resolve_chain(spark, entries):
        seg = read_source(spark, f"{root}/{vdir}", format=fmt)
        if out is None:
            out = seg
        elif set(seg.columns) == set(out.columns):
            out = out.unionByName(seg)
        else:
            # evolved segment: new columns surface on the union schema,
            # dropped ones read back as NULL for that segment
            out = out.unionByName(seg, allowMissingColumns=True)
    return out


def published_segments(
    spark: SparkSession, root: str, *, version: int | None = None
) -> list[tuple[str, str]]:
    """The immutable (segment-dir-name, format) chain of the live
    snapshot (or of a pinned ``version``), oldest first. Segment
    directories are immutable by the publish contract, which is what
    makes them usable as cache keys for per-segment derived state
    (incremental aggregates, side indexes): state computed for a vdir
    never goes stale — compaction/vacuum produce NEW vdirs."""
    return _resolve_chain(spark, _entries_at(spark, root, version))


def describe_published(spark: SparkSession, root: str) -> list[dict]:
    """Operational health of a published table, one dict per LIVE
    segment (oldest first): ``{"vdir", "format", "bytes", "n_files"}``
    from listing metadata only — no data scan. The maintenance signal
    in one call: many segments → run ``compact_published``; many small
    files inside one → lower its writer parallelism or compact; big
    rewritten-bytes deltas after DML → check predicate clustering."""
    fs, jvm = _fs(spark, root)
    out = []
    for vdir, fmt in published_segments(spark, root):
        p = jvm.org.apache.hadoop.fs.Path(f"{root}/{vdir}")
        summary = fs.getContentSummary(p)
        out.append(
            {
                "vdir": vdir,
                "format": fmt,
                "bytes": int(summary.getLength()),
                "n_files": int(summary.getFileCount()),
            }
        )
    return out


def _health_from_listing(
    entries: "list[tuple[int, str]]",
    dir_stats: "dict[str, tuple[int, int]]",
    keep: int,
) -> dict:
    """The published-table health summary from raw listing data —
    ``entries`` = sorted (version, manifest payload), ``dir_stats`` =
    vdir → (bytes, files) for every ``v_*`` directory on disk. One
    implementation shared by the cluster-side (Hadoop FS) and the
    replica-side (plain ``os``) views so the two can never drift.

    ``vacuum_debt_*`` = what ``vacuum_published(keep=keep)`` would
    remove, IGNORING its in-flight grace window (debt is an
    observability number; the grace is a deletion-safety rule)."""

    def chain_dirs(idx: int) -> list[str]:
        dirs: list[str] = []
        for j in range(idx, -1, -1):
            vdirs, _fmt, mode = _parse_entry(entries[j][1])
            dirs.extend(vdirs)
            if mode == "replace":
                break
        return dirs

    live = chain_dirs(len(entries) - 1) if entries else []
    kept: set[str] = set()
    for i in range(max(0, len(entries) - keep), len(entries)):
        kept.update(chain_dirs(i))
    live_set = set(live)
    dead = sorted(d for d in dir_stats if d not in live_set)
    debt = sorted(d for d in dir_stats if d not in kept)
    return {
        "version": entries[-1][0] if entries else 0,
        "n_versions": len(entries),
        "chain_length": len(live),
        "live_bytes": sum(dir_stats.get(d, (0, 0))[0] for d in live_set),
        "live_files": sum(dir_stats.get(d, (0, 0))[1] for d in live_set),
        "dead_dirs": len(dead),
        "dead_bytes": sum(dir_stats[d][0] for d in dead),
        "dead_files": sum(dir_stats[d][1] for d in dead),
        "vacuum_debt_dirs": len(debt),
        "vacuum_debt_bytes": sum(dir_stats[d][0] for d in debt),
    }


def published_table_health(
    spark: SparkSession, root: str, *, keep: int = 2
) -> dict:
    """Table-level lifecycle observability for a published corpus —
    the ``describe_ivf_index``/``describe_bm25_index`` analog the r10
    verdict asked for (#6), complementing the per-segment
    ``describe_published`` listing: ``version``, ``n_versions`` (time-
    travel span), ``chain_length`` (segments every reader unions),
    ``live_bytes/files`` (the serving snapshot), ``dead_bytes/files``
    (superseded or orphaned ``v_*`` directories still on disk), and
    ``vacuum_debt_*`` (what ``vacuum_published(keep=keep)`` would
    reclaim). Listing metadata only — no data scan. The vacuum-policy
    loop (``maintain_published``) converges ``vacuum_debt_dirs`` to 0
    between ingest bursts; a debt that only grows means vacuum is not
    scheduled or ``keep`` is unbounded."""
    fs, jvm = _fs(spark, root)
    entries = []
    for n, p in _manifest_entries(spark, root):
        try:
            entries.append((n, _read_small_file(spark, p)))
        except Exception:
            # Tolerate ONLY the vacuum race (entry retired between the
            # listing and the read — same tolerance as
            # local_published_health, r11 advice). A still-present
            # entry that cannot be read is a real failure (permissions,
            # corruption, transient FS outage): re-raise, because a
            # health view that silently drops versions reports a
            # HEALTHIER table than exists (r12 review #4).
            if fs.exists(jvm.org.apache.hadoop.fs.Path(p)):
                raise
    dir_stats: dict[str, tuple[int, int]] = {}
    rootp = jvm.org.apache.hadoop.fs.Path(root)
    if fs.exists(rootp):
        for st in fs.listStatus(rootp):
            name = st.getPath().getName()
            if name.startswith("v_") and st.isDirectory():
                try:
                    s = fs.getContentSummary(st.getPath())
                except Exception:
                    continue  # dir vanished between listing and stat
                dir_stats[name] = (int(s.getLength()), int(s.getFileCount()))
    return _health_from_listing(entries, dir_stats, keep)


def local_published_health(root: str, *, keep: int = 2) -> dict:
    """The replica-side twin of ``published_table_health`` — plain
    ``os`` walks, no SparkSession — for serving processes reporting a
    local published corpus through ``/health`` (the same split as
    ``read_generation`` vs ``read_generation_cluster``)."""
    import os

    mdir = os.path.join(root, _MANIFEST_DIR)
    entries: list[tuple[int, str]] = []
    if os.path.isdir(mdir):
        for name in os.listdir(mdir):
            if name.isdigit():
                try:
                    with open(os.path.join(mdir, name)) as f:
                        entries.append((int(name), f.read()))
                except OSError:
                    pass  # racing vacuum retired this entry mid-listing
    entries.sort()
    dir_stats: dict[str, tuple[int, int]] = {}
    if os.path.isdir(root):
        for name in os.listdir(root):
            p = os.path.join(root, name)
            if name.startswith("v_") and os.path.isdir(p):
                nbytes = nfiles = 0
                for dp, _dirs, files in os.walk(p):
                    for fn in files:
                        if fn.startswith("."):
                            # Hadoop's ChecksumFileSystem hides .crc
                            # sidecars from its listings; skip them so
                            # both views report identical numbers
                            continue
                        try:
                            nbytes += os.path.getsize(os.path.join(dp, fn))
                            nfiles += 1
                        except OSError:
                            pass  # racing vacuum/compaction delete
                dir_stats[name] = (nbytes, nfiles)
    return _health_from_listing(entries, dir_stats, keep)


def published_versions(spark: SparkSession, root: str) -> list[int]:
    """Version numbers still resolvable at ``root`` (oldest first):
    the valid inputs to ``read_published(version=)``. Shrinks only
    when ``vacuum_published`` drops superseded snapshots."""
    return [n for n, _ in _manifest_entries(spark, root)]


def published_version(spark: SparkSession, root: str) -> int:
    """Live version number (0 when nothing is published yet)."""
    entries = _manifest_entries(spark, root)
    return entries[-1][0] if entries else 0


def published_chain_length(spark: SparkSession, root: str) -> int:
    """Segment count of the live snapshot (0 when nothing published):
    the maintenance signal for ``compact_published`` — every reader
    unions this many directories, so long append chains trade ingest
    cheapness for scan-time listing/open overhead."""
    entries = _manifest_entries(spark, root)
    return len(_resolve_chain(spark, entries)) if entries else 0


def compact_published(
    spark: SparkSession,
    root: str,
    *,
    target_file_mb: int = 256,
    cluster_by: list[str] | None = None,
    zorder: bool = False,
) -> int:
    """Crash-safe compaction of a published table — the plain-directory
    OPTIMIZE: read the live version, rewrite at the target file size as
    a NEW version, flip the manifest atomically. Readers concurrent
    with a crashed compaction keep the old version; returns the new
    version number. An append chain folds back into ONE replace
    directory — the listing-cost reset that makes per-batch
    ``append_published`` commits sustainable.

    ``cluster_by`` rewrites range-clustered on those columns at the
    same target file count: DISJOINT per-file key ranges across the
    whole table (per-batch append clustering can't give that), so this
    is where key-pruned layouts get restored after an append chain.
    With ``zorder=True`` (and ≥2 ``cluster_by`` columns) the rewrite
    follows the Z-curve instead (``sources.layout``): box filters on
    EVERY listed column prune files, not just the leading one."""
    for _ in range(10):
        entries = _manifest_entries(spark, root)
        if not entries:
            raise FileNotFoundError(f"no published version under {root!r}")
        chain = _resolve_chain(spark, entries)
        fmt = chain[0][1]
        fs, jvm = _fs(spark, root)
        total_bytes = sum(
            fs.getContentSummary(
                jvm.org.apache.hadoop.fs.Path(f"{root}/{vdir}")
            ).getLength()
            for vdir, _ in chain
        )
        n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
        df = read_published(spark, root)
        if cluster_by and zorder:
            from prefixtree_spark.sources.layout import zorder_cluster

            df = zorder_cluster(df, cluster_by, num_partitions=n_files)
        elif cluster_by:
            df = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
                *cluster_by
            )
        else:
            df = df.repartition(n_files)
        # CAS commit: the replace is built FROM snapshot entries[-1], so
        # it may only land as the very next version. If an append slips
        # in between resolve and commit, committing anyway would publish
        # a snapshot that silently drops that segment (the advertised
        # safe-beside-the-sink contract) — re-resolve and recompact.
        try:
            return _publish_entry(
                df, root, "replace", fmt, None,
                expected_version=entries[-1][0] + 1,
            )
        except ConcurrentPublishError:
            continue
    raise RuntimeError(
        f"compact_published: snapshot at {root!r} kept moving; "
        "retry when ingest pressure drops"
    )


def _commit_dirs(
    spark: SparkSession,
    root: str,
    dirs: list[str],
    fmt: str,
    mode: str,
    expected_version: int,
    own_dirs: list[str],
) -> int:
    """CAS-install a multi-dir (COW) manifest entry as exactly version
    ``expected_version``. On any failure — the snapshot moved, or the
    commit race was lost — delete ``own_dirs`` (the dirs THIS caller
    wrote; never the re-referenced immutable ones) and raise
    ``ConcurrentPublishError`` so the caller re-resolves and redoes
    its derived rewrite against the new snapshot."""
    fs, jvm = _fs(spark, root)
    entries = _manifest_entries(spark, root)
    n = entries[-1][0] + 1 if entries else 1
    payload = f"{','.join(dirs)}\t{fmt}\t{mode}"
    if n == expected_version and _try_commit(spark, root, n, payload):
        return n
    for d in own_dirs:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/{d}"), True)
    raise ConcurrentPublishError(
        f"snapshot at {root!r} moved while committing version "
        f"{expected_version}"
    )


def _chain_format(chain: list[tuple[str, str]], op: str) -> str:
    fmts = {fmt for _, fmt in chain}
    if len(fmts) > 1:
        raise ValueError(
            f"{op}: chain mixes formats {sorted(fmts)}; a COW entry "
            "carries one format for all its directories — run "
            "compact_published first"
        )
    return next(iter(fmts))


def _probe_chain(
    spark: SparkSession,
    root: str,
    chain: list[tuple[str, str]],
    filter_fn,
    tag_first: bool = False,
) -> tuple[dict[str, int], list[str]]:
    """Per-segment row counts of ``filter_fn(union of the chain)`` in
    ONE reader and ONE job, plus the union-schema column list. One
    reader matters: per-segment ``spark.read`` calls each pay a
    driver-side footer/schema round trip, which at typical chain
    lengths costs more wall clock than the probe job itself.
    ``mergeSchema`` presents drifted segments exactly as
    ``read_published`` does (missing columns NULL); the owning segment
    of each surviving row is recovered from ``input_file_name`` — the
    uuid'd ``v_<n>_<hex>`` dir-name pattern is unique per segment and
    survives hive partition subdirs."""
    fmt = chain[0][1]
    reader = spark.read.format(fmt)
    if fmt in ("parquet", "orc"):
        reader = reader.option("mergeSchema", "true")
    elif fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    try:
        df = reader.load([f"{root}/{vdir}" for vdir, _ in chain])
    except Exception:
        # hive-partitioned segments: partition discovery rejects the
        # non-key=value vdir components between the paths and their
        # partition dirs (CONFLICTING_DIRECTORY_STRUCTURES; basePath
        # doesn't help) — fall back to one reader per segment with
        # deterministic lit() tags, which filters still push through
        return _probe_chain_per_segment(spark, root, chain, filter_fn)
    # greedy .* takes the LAST matching component: segment dirs are
    # the only engine-minted names of this shape, but a root that
    # itself lives under such a path must not win the extraction
    vd_name = "_vd"
    while vd_name in df.columns:
        vd_name += "_"
    vd = F.regexp_extract(
        F.input_file_name(), ".*(v_[0-9]{11}_[0-9a-f]{8})", 1
    ).alias(vd_name)
    if tag_first:
        # joins can't evaluate input_file_name above two sources, so
        # the tag is projected scan-side BEFORE filter_fn joins
        tagged = filter_fn(df.select(*df.columns, vd)).select(vd_name)
    else:
        # predicate filters go FIRST: a filter cannot be pushed through
        # a projection containing the nondeterministic file-name tag,
        # and the probe's whole point is the pushed-down pruned scan
        tagged = filter_fn(df).select(vd)
    counts = {
        r[vd_name]: r["cnt"]
        for r in tagged.groupBy(vd_name)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    return counts, df.columns


def _probe_chain_per_segment(
    spark: SparkSession,
    root: str,
    chain: list[tuple[str, str]],
    filter_fn,
) -> tuple[dict[str, int], list[str]]:
    """Per-segment-reader probe for chains the multi-path reader can't
    load (hive-partitioned segments). Each branch is tagged with a
    deterministic ``lit(vdir)`` — filters push through those — and
    widened to the union schema with NULLs before one union +
    ``filter_fn`` + tiny aggregate. Costs one driver schema round trip
    per segment, which is exactly what ``_probe_chain`` avoids on the
    common unpartitioned path."""
    segs = [
        (vdir, read_source(spark, f"{root}/{vdir}", format=f))
        for vdir, f in chain
    ]
    union_cols: list[str] = []
    for _, seg in segs:
        union_cols.extend(c for c in seg.columns if c not in union_cols)
    vd_name = "_vd"
    while vd_name in union_cols:
        vd_name += "_"
    tagged: DataFrame | None = None
    for vdir, seg in segs:
        ev = seg
        for c in union_cols:
            if c not in seg.columns:
                ev = ev.withColumn(c, F.lit(None))
        t = ev.select(*union_cols, F.lit(vdir).alias(vd_name))
        tagged = t if tagged is None else tagged.unionByName(t)
    counts = {
        r[vd_name]: r["cnt"]
        for r in filter_fn(tagged)
        .groupBy(vd_name)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    return counts, union_cols


def delete_published(
    spark: SparkSession,
    root: str,
    predicate,
    *,
    cluster_by: list[str] | None = None,
) -> dict[str, int]:
    """Row-level DELETE from a published table, copy-on-write: rows
    where ``predicate`` (a Column or SQL string) is TRUE leave the
    live snapshot; rows where it is FALSE or NULL stay (the SQL DELETE
    contract). Cost is O(matching segments), NOT O(table): each
    segment of the live chain is probed with the predicate (a
    pushed-down scan — on range-clustered/Z-ordered layouts file stats
    prune it to the key range), untouched segments are RE-REFERENCED
    in the new manifest entry as-is, and only segments containing
    matches are rewritten without their matching rows. One atomic
    multi-dir replace commit flips the table; concurrent appends CAS
    the commit and the delete re-resolves (same contract as
    ``compact_published``).

    Physical removal semantics (the right-to-be-forgotten case):
    this removes rows from the LIVE snapshot; prior versions still
    reference the old segment directories until ``vacuum_published``
    drops them — run it (with ``keep`` small enough) to make deletion
    physical, exactly as Delta's DELETE + VACUUM pair.

    Schema drift: the predicate is evaluated under the union schema —
    a segment missing a predicate column sees NULL there (matching
    what ``read_published`` returns for its rows), so e.g.
    ``lang IS NULL`` deletes pre-evolution rows.

    Returns ``{"version", "deleted", "rewritten_segments",
    "kept_segments"}``; a no-match delete commits nothing and returns
    the current version."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    keep_cond = ~F.coalesce(pred.cast("boolean"), F.lit(False))
    for _ in range(10):
        entries = _manifest_entries(spark, root)
        if not entries:
            raise FileNotFoundError(f"no published version under {root!r}")
        expected = entries[-1][0] + 1
        chain = _resolve_chain(spark, entries)
        fmt = _chain_format(chain, "delete_published")
        # ONE probe — one reader (one schema-inference round trip, not
        # one per segment: at 8 segments those footers cost more
        # driver time than the job itself) and one job. mergeSchema
        # surfaces the union schema, so drifted segments evaluate the
        # predicate with NULLs exactly as read_published presents
        # them; the segment a match belongs to is recovered from
        # input_file_name (segment dir names are uuid'd and unique).
        match_counts, union_cols = _probe_chain(
            spark, root, chain, lambda df: df.where(pred)
        )
        new_dirs: list[str] = []
        own: list[str] = []
        deleted = 0
        rewritten = 0
        for vdir, f in chain:
            n_match = match_counts.get(vdir, 0)
            if n_match == 0:
                new_dirs.append(vdir)
                continue
            deleted += n_match
            rewritten += 1
            seg = read_source(spark, f"{root}/{vdir}", format=f)
            # keep_cond is the exact complement of pred (TRUE goes,
            # FALSE/NULL stays), so emptiness is arithmetic on the
            # footer-metadata row count — no survivor rescan job
            if seg.count() == n_match:
                continue  # the whole segment vanishes from the entry
            ev = seg
            for c in union_cols:
                if c not in seg.columns:
                    ev = ev.withColumn(c, F.lit(None))
            survivors = ev.where(keep_cond).select(*seg.columns)
            if cluster_by:
                survivors = _range_cluster(survivors, cluster_by)
            nd = f"v_{expected:011d}_{_uuid_hex()}"
            write_sink(survivors, f"{root}/{nd}", format=f)
            new_dirs.append(nd)
            own.append(nd)
        if rewritten == 0:
            return {
                "version": entries[-1][0],
                "deleted": 0,
                "rewritten_segments": 0,
                "kept_segments": len(chain),
            }
        if not new_dirs:
            # everything deleted: one empty segment keeps the table
            # readable with its union schema
            nd = f"v_{expected:011d}_{_uuid_hex()}"
            write_sink(
                read_published(spark, root).where(F.lit(False)),
                f"{root}/{nd}",
                format=fmt,
            )
            new_dirs, own = [nd], own + [nd]
        try:
            v = _commit_dirs(
                spark, root, new_dirs, fmt, "replace", expected, own
            )
        except ConcurrentPublishError:
            continue
        return {
            "version": v,
            "deleted": deleted,
            "rewritten_segments": rewritten,
            "kept_segments": len(chain) - rewritten,
        }
    raise RuntimeError(
        f"delete_published: snapshot at {root!r} kept moving; "
        "retry when ingest pressure drops"
    )


def update_published(
    spark: SparkSession,
    root: str,
    predicate,
    assignments: dict,
    *,
    cluster_by: list[str] | None = None,
) -> dict[str, int]:
    """Row-level UPDATE on a published table, copy-on-write (the
    third of the DML triad with ``delete_published`` /
    ``upsert_published``): rows where ``predicate`` is TRUE get each
    ``assignments`` column set to its expression (a Column or SQL
    string); FALSE/NULL rows are byte-identical. Untouched segments
    are re-referenced; only segments containing matches are rewritten,
    in one atomic multi-dir commit.

    An assignment to a column a hit segment doesn't have yet ADDS it
    there (non-matching rows read NULL) — the same schema-drift
    contract appends already follow; segments without matches are not
    widened. Predicates see drifted columns as NULL, as in
    ``delete_published``.

    Returns ``{"version", "updated", "rewritten_segments",
    "kept_segments"}``; no matches commits nothing."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    hit = F.coalesce(pred.cast("boolean"), F.lit(False))
    assigns = {
        c: (F.expr(e) if isinstance(e, str) else e)
        for c, e in assignments.items()
    }
    for _ in range(10):
        entries = _manifest_entries(spark, root)
        if not entries:
            raise FileNotFoundError(f"no published version under {root!r}")
        expected = entries[-1][0] + 1
        chain = _resolve_chain(spark, entries)
        fmt = _chain_format(chain, "update_published")
        match_counts, union_cols = _probe_chain(
            spark, root, chain, lambda df: df.where(pred)
        )
        new_dirs: list[str] = []
        own: list[str] = []
        updated = 0
        rewritten = 0
        for vdir, f in chain:
            n_match = match_counts.get(vdir, 0)
            if n_match == 0:
                new_dirs.append(vdir)
                continue
            updated += n_match
            rewritten += 1
            seg = read_source(spark, f"{root}/{vdir}", format=f)
            ev = seg
            for c in union_cols:
                if c not in seg.columns:
                    ev = ev.withColumn(c, F.lit(None))
            out_cols = list(seg.columns) + [
                c for c in assigns if c not in seg.columns
            ]
            def _out(c):
                old = F.col(c) if c in ev.columns else F.lit(None)
                if c in assigns:
                    return F.when(hit, assigns[c]).otherwise(old).alias(c)
                return old.alias(c)

            rewritten_seg = ev.select(*(_out(c) for c in out_cols))
            if cluster_by:
                rewritten_seg = _range_cluster(rewritten_seg, cluster_by)
            nd = f"v_{expected:011d}_{_uuid_hex()}"
            write_sink(rewritten_seg, f"{root}/{nd}", format=f)
            new_dirs.append(nd)
            own.append(nd)
        if rewritten == 0:
            return {
                "version": entries[-1][0],
                "updated": 0,
                "rewritten_segments": 0,
                "kept_segments": len(chain),
            }
        try:
            v = _commit_dirs(
                spark, root, new_dirs, fmt, "replace", expected, own
            )
        except ConcurrentPublishError:
            continue
        return {
            "version": v,
            "updated": updated,
            "rewritten_segments": rewritten,
            "kept_segments": len(chain) - rewritten,
        }
    raise RuntimeError(
        f"update_published: snapshot at {root!r} kept moving; "
        "retry when ingest pressure drops"
    )


def upsert_published(
    df: DataFrame,
    root: str,
    key_cols: list[str],
    *,
    cluster_by: list[str] | None = None,
) -> dict[str, int]:
    """MERGE a batch into a published table by key, copy-on-write:
    existing rows whose ``key_cols`` match a batch row are replaced by
    it; batch rows with unseen keys are inserted (the re-crawl /
    updated-record shape). Like ``delete_published``, cost is
    O(matching segments + batch): segments with no key hits are
    re-referenced untouched, hit segments are rewritten without the
    matched rows (one anti-join each — Spark broadcasts the key side
    when small), and the batch lands as one new clustered segment in
    the SAME atomic multi-dir commit, so readers never see the
    delete-without-insert intermediate state.

    Contract notes: batch rows are written verbatim — two batch rows
    sharing a key both land (dedupe upstream if that's not intended);
    NULL keys never match existing rows (SQL join semantics), so they
    always insert; a segment missing some key column can't match and
    is kept as-is; batch columns absent from old segments surface as
    NULL on old rows (``read_published`` schema drift).

    Returns ``{"version", "updated", "inserted", "rewritten_segments",
    "kept_segments"}``. ``updated`` counts REPLACED existing rows — if
    plain appends left duplicate keys in the table, one batch row
    replaces all of them, so ``updated`` can exceed the batch's matched
    keys and ``inserted`` (= batch rows − replaced rows) can go
    negative; upsert-by-key is also how such duplicates get healed."""
    spark = df.sparkSession
    keys = df.select(*key_cols).dropDuplicates().persist()
    try:
        keys.count()  # materialize once; reused per segment probe
        n_batch = df.count()
        for _ in range(10):
            entries = _manifest_entries(spark, root)
            if not entries:
                raise FileNotFoundError(
                    f"no published version under {root!r}"
                )
            expected = entries[-1][0] + 1
            chain = _resolve_chain(spark, entries)
            fmt = _chain_format(chain, "upsert_published")
            # one reader + one semi-join probe across the chain (see
            # _probe_chain); a segment missing a key column reads it
            # as NULL under the merged schema, matches nothing, and is
            # kept as-is — the same contract, no per-segment scan
            hit_counts, _cols = _probe_chain(
                spark,
                root,
                chain,
                lambda df: df.join(keys, key_cols, "left_semi"),
                tag_first=True,
            )
            new_dirs: list[str] = []
            own: list[str] = []
            updated = 0
            rewritten = 0
            for vdir, f in chain:
                n_hit = hit_counts.get(vdir, 0)
                if n_hit == 0:
                    new_dirs.append(vdir)
                    continue
                seg = read_source(spark, f"{root}/{vdir}", format=f)
                updated += n_hit
                rewritten += 1
                # anti = total − semi, so emptiness is footer-count
                # arithmetic, not a rescan job
                if seg.count() == n_hit:
                    continue
                survivors = seg.join(keys, key_cols, "left_anti")
                nd = f"v_{expected:011d}_{_uuid_hex()}"
                write_sink(survivors, f"{root}/{nd}", format=f)
                new_dirs.append(nd)
                own.append(nd)
            batch = _range_cluster(df, cluster_by) if cluster_by else df
            bd = f"v_{expected:011d}_{_uuid_hex()}"
            write_sink(batch, f"{root}/{bd}", format=fmt)
            new_dirs.append(bd)
            own.append(bd)
            try:
                v = _commit_dirs(
                    spark, root, new_dirs, fmt, "replace", expected, own
                )
            except ConcurrentPublishError:
                continue
            return {
                "version": v,
                "updated": updated,
                "inserted": n_batch - updated,
                "rewritten_segments": rewritten,
                "kept_segments": len(chain) - rewritten,
            }
        raise RuntimeError(
            f"upsert_published: snapshot at {root!r} kept moving; "
            "retry when ingest pressure drops"
        )
    finally:
        keys.unpersist()


def _uuid_hex() -> str:
    import uuid as _uuid

    return _uuid.uuid4().hex[:8]


def vacuum_published(
    spark: SparkSession, root: str, *, keep: int = 2, grace_s: int = 3600
) -> int:
    """Delete segment directories (and manifest entries) not referenced
    by the newest ``keep`` SNAPSHOTS' chains, plus orphaned data
    directories no manifest references (failed publishes). A snapshot's
    chain includes its base replace version and every append between —
    an old base directory stays live as long as any kept snapshot
    stacks on it. Returns directories removed. Run OUT of band, with
    ``keep`` ≥ the longest reader you allow — a reader that resolved a
    snapshot still scans its files.

    Concurrency: a publisher mid-commit has written its data directory
    but not yet renamed its manifest entry — indistinguishable from a
    crashed publish by state alone. UNREFERENCED directories are
    therefore only deleted once untouched for ``grace_s`` seconds
    (default 1 h ≫ any commit), so vacuum is safe to schedule alongside
    an active ingest; superseded REFERENCED versions carry manifest
    proof of being old and delete immediately."""
    import time as _time

    fs, jvm = _fs(spark, root)
    entries = _manifest_entries(spark, root)
    kept_entries = entries[-keep:] if keep else []
    live_dirs: set[str] = set()
    live_versions: set[int] = set()
    referenced: set[str] = set()
    # live = the entries (and their dirs) on some KEPT snapshot's
    # chain — the entry-version walk, not a dirs-are-live test: a COW
    # (delete/upsert) commit re-references its predecessors' untouched
    # dirs, so "this entry's dirs all survive" no longer implies "this
    # entry resolves" (its own BASE entry may be vacuumed away, and a
    # kept-but-unresolvable pin would fail mid-chain, exactly what
    # _entries_at promises never happens).
    for i in range(len(entries) - len(kept_entries), len(entries)):
        for j in range(i, -1, -1):
            nj, mpath = entries[j]
            vdirs, _fmt, mode = _parse_entry(_read_small_file(spark, mpath))
            live_dirs.update(vdirs)
            live_versions.add(nj)
            if mode == "replace":
                break
    for n, mpath in entries:
        referenced.update(_parse_entry(_read_small_file(spark, mpath))[0])
    removed = 0
    now_ms = _time.time() * 1000
    rootp = jvm.org.apache.hadoop.fs.Path(root)
    if fs.exists(rootp):
        for st in fs.listStatus(rootp):
            name = st.getPath().getName()
            if not name.startswith("v_") or name in live_dirs:
                continue
            if name not in referenced and (
                now_ms - st.getModificationTime() < grace_s * 1000
            ):
                continue  # possibly an in-flight publish — let it land
            fs.delete(st.getPath(), True)
            removed += 1
    for n, mpath in entries:
        if n not in live_versions:
            # preserve exactly-once: retire any txn tag to a marker
            # BEFORE the entry (the tag's only other home) disappears;
            # an UNCONFIRMED marker keeps the entry alive (its tag is
            # the txn's only record) — the next vacuum retries
            confirmed = True
            for fld in _read_small_file(spark, mpath).split("\t")[3:]:
                if fld.startswith("txn="):
                    confirmed = _retire_txn(spark, root, fld[4:], n) and confirmed
            if confirmed:
                fs.delete(jvm.org.apache.hadoop.fs.Path(mpath), False)
    return removed


def maintain_published(
    spark: SparkSession,
    root: str,
    *,
    max_chain: int = 8,
    small_file_mb: int = 32,
    max_small_files: int = 64,
    target_file_mb: int = 256,
    cluster_by: list[str] | None = None,
    zorder: bool = False,
    vacuum: bool = True,
    keep: int = 2,
    grace_s: int = 3600,
) -> dict:
    """The maintenance policy loop for a published table: read the
    health listing (``describe_published`` — listing metadata only, no
    data scan), compact when the append chain or the small-file count
    crosses a threshold, then vacuum superseded snapshots. Call it out
    of band on a schedule (or after every N ingest batches); repeated
    append/DML + ``maintain_published`` converges to a bounded chain
    and bounded file count, with time travel over the ``keep`` newest
    snapshots and txn replay (retired-txn markers) intact.

    Triggers:
    - chain length > ``max_chain`` — every reader unions that many
      directories; compaction folds them into one replace segment;
    - > ``max_small_files`` files in segments whose MEAN file size is
      under ``small_file_mb`` (per-file sizes would need a deep
      listing; the mean is the same signal at listing cost) — the
      many-small-parquet-footers tax on scan open/planning.

    Returns a report dict: ``{"chain_length", "small_files",
    "compacted", "version", "vacuum_removed"}`` — ``version`` is the
    new live version when compaction ran, else the current one."""
    entries = _manifest_entries(spark, root)
    if not entries:
        return {
            "chain_length": 0, "small_files": 0, "compacted": False,
            "version": 0, "vacuum_removed": 0,
        }
    desc = describe_published(spark, root)
    small = sum(
        d["n_files"]
        for d in desc
        if d["n_files"] and d["bytes"] / d["n_files"] < small_file_mb * 1024 * 1024
    )
    need = len(desc) > max_chain or small > max_small_files
    version = entries[-1][0]
    if need:
        version = compact_published(
            spark, root, target_file_mb=target_file_mb,
            cluster_by=cluster_by, zorder=zorder,
        )
    removed = (
        vacuum_published(spark, root, keep=keep, grace_s=grace_s) if vacuum else 0
    )
    return {
        "chain_length": len(desc),
        "small_files": small,
        "compacted": need,
        "version": version,
        "vacuum_removed": removed,
    }
