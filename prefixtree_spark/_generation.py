"""The layout-generation protocol, shared by every persisted index
family (published string indexes, IVF vector layouts, BM25 sparse
layouts).

One contract, one implementation (r9 verdict #6 — previously the bump
lived in ``ann`` under an IVF-specific name while stamping BM25
layouts too, and three serving watchers were copies of one
poll-load-flip loop):

- ``bump_generation`` (cluster side, Hadoop FS): writers call it AFTER
  their writes/swaps complete, so any readable value names a
  consistent layout; a crash before the bump leaves replicas on the
  previous generation (stale but never mixed) until the next
  maintenance call bumps. Read-modify-write is safe under the standing
  single-writer contract.
- ``read_generation`` (replica side, plain ``open``): 0 when absent or
  torn — a torn read only delays a reload by one poll.
- ``watch_generation`` (replica side): ONE generic poll-load-flip loop
  behind ``watch_published_index`` / ``watch_ivf_index`` /
  ``watch_bm25_index``. Load-then-flip with a post-load verify hook
  (the torn-swap discard): the outgoing handle keeps serving until the
  incoming one is fully loaded AND provably consistent, so a request
  is answered entirely by one generation, never a mix.
"""

from __future__ import annotations

import threading
from collections.abc import Callable


def bump_generation(spark, path: str) -> int:
    """Advance the layout's ``_generation`` marker — the serving-side
    reload signal. Returns the new generation."""
    from prefixtree_spark.sources.io import _fs, _read_small_file

    fs, jvm = _fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/_generation")
    cur = 0
    try:
        if fs.exists(p):
            cur = int(_read_small_file(spark, f"{path}/_generation").strip())
    except Exception:
        cur = 0
    out = fs.create(p, True)
    try:
        out.write(bytearray(str(cur + 1).encode()))
    finally:
        out.close()
    return cur + 1


def read_generation_cluster(spark, path: str) -> int:
    """``read_generation`` through the Hadoop FS API — the form
    cluster-side probes use, so hdfs:// and s3a:// layouts work."""
    from prefixtree_spark.sources.io import _fs, _read_small_file

    fs, jvm = _fs(spark, path)
    try:
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{path}/_generation")):
            return 0
        return int(_read_small_file(spark, f"{path}/_generation").strip())
    except Exception:
        return 0


def mark_swapping(spark, path: str) -> None:
    """Raise the ``_swapping`` intent marker — maintenance sets it
    immediately before its rename sequence and clears it right after,
    so the marker brackets exactly the window in which a concurrent
    reader could see a mixed or half-renamed layout. Single-writer by
    the standing contract."""
    from prefixtree_spark.sources.io import _fs

    fs, jvm = _fs(spark, path)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(f"{path}/_swapping"), True)
    try:
        out.write(bytearray(b"1"))
    finally:
        out.close()


def clear_swapping(spark, path: str) -> None:
    from prefixtree_spark.sources.io import _fs

    fs, jvm = _fs(spark, path)
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/_swapping"), True)


def is_swapping(spark, path: str) -> bool:
    from prefixtree_spark.sources.io import _fs

    fs, jvm = _fs(spark, path)
    return bool(
        fs.exists(jvm.org.apache.hadoop.fs.Path(f"{path}/_swapping"))
    )


class MaintenanceLeaseHeld(RuntimeError):
    """Another maintainer holds the layout's writer lease."""


def acquire_maintenance_lease(
    spark, path: str, *, ttl_s: float = 3600.0
) -> str:
    """Claim the single-writer lease for a persisted layout (r11
    verdict #3): ``maintain_*_index`` calls this before touching the
    layout, so two concurrent maintainers can no longer interleave
    staged renames — the swap protocol is reader-safe but assumes ONE
    writer, and this makes the engine enforce what docstrings used to
    delegate to an external scheduler.

    Mechanics: create-if-absent of ``path/_maintenance_lease`` through
    the same atomic claim primitive as manifest commits
    (``sources.io._atomic_create`` — link(2) on local FS, no-replace
    rename on HDFS), body = a fresh uuid token returned to the caller.
    A live lease raises ``MaintenanceLeaseHeld`` (fail loud, don't
    queue — the caller's scheduler decides). A lease older than
    ``ttl_s`` (filesystem mtime) is a crashed maintainer's: it is
    stolen and the crashed run's half-done swap is then healed by the
    normal recovery path at the start of the maintenance body.
    ``ttl_s`` must exceed the longest plausible maintenance run —
    stealing from a LIVE slow maintainer re-opens the race the lease
    closes."""
    import uuid

    from prefixtree_spark.sources.io import _atomic_create, _fs

    fs, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    lease = f"{path}/_maintenance_lease"
    lp = P(lease)
    token = uuid.uuid4().hex

    def _age_ms(p) -> "int | None":
        try:
            return (
                jvm.java.lang.System.currentTimeMillis()
                - fs.getFileStatus(p).getModificationTime()
            )
        except Exception:
            return None  # absent (or vanished mid-check)

    # GC stray corpses from crashed fencing/claim operations (harmless
    # dotfiles, but unbounded accumulation is litter): the steal/release
    # rename targets AND the _atomic_create tmps a claimant strands if
    # it crashes between fs.create(tmp) and the link/rename (r12 advice
    # #4 — those carry the .tmp-_maintenance_lease- prefix, which the
    # .lease_ match missed, so repeated claimant crashes accumulated
    # them unboundedly)
    try:
        for st in fs.listStatus(P(path)):
            name = st.getPath().getName()
            if (
                name.startswith(".lease_")
                or name.startswith(".tmp-_maintenance_lease-")
            ) and (
                jvm.java.lang.System.currentTimeMillis()
                - st.getModificationTime()
            ) > ttl_s * 1000:
                fs.delete(st.getPath(), False)
    except Exception:
        pass

    for attempt in range(2):  # second pass only after a steal
        age = _age_ms(lp)
        if age is not None:
            if age < ttl_s * 1000:
                raise MaintenanceLeaseHeld(
                    f"maintenance lease at {path!r} is held "
                    f"(age {age / 1000.0:.1f}s < ttl {ttl_s}s); "
                    "another maintain_*_index run is in flight"
                )
            # STEAL, fenced (r12 review #1): delete-then-create would
            # let two concurrent stealers each delete the OTHER's
            # fresh lease (stat-stale / stat-stale / B steals+claims /
            # C deletes B's claim). Rename-to-unique instead: the
            # source vanishes with the first rename, so exactly one
            # stealer removes the stale lease; losers fall through to
            # _atomic_create and lose that too. Post-rename verify:
            # if the renamed file is YOUNG, the stale holder released
            # and a NEW maintainer claimed between our stat and
            # rename — restore it and report held. (Residual: a
            # third claimant landing inside the restore window orphans
            # the restored owner — three actors inside one mtime
            # check; the delete design failed with two.)
            corpse = P(f"{path}/.lease_steal_{token}")
            try:
                renamed = fs.rename(lp, corpse)
            except Exception:
                renamed = False
            if renamed:
                cage = _age_ms(corpse)
                if cage is not None and cage < ttl_s * 1000:
                    try:
                        if not fs.rename(corpse, lp):
                            fs.delete(corpse, False)
                    except Exception:
                        pass
                    raise MaintenanceLeaseHeld(
                        f"maintenance lease at {path!r} was re-claimed "
                        "while this steal was in flight"
                    )
                fs.delete(corpse, False)
        if _atomic_create(spark, lease, token):
            return token
        # lost the claim race to another maintainer
        if attempt == 0:
            continue  # their lease might itself be stale; re-examine
    raise MaintenanceLeaseHeld(
        f"maintenance lease at {path!r} was claimed by a concurrent "
        "maintainer"
    )


def release_maintenance_lease(spark, path: str, token: str) -> None:
    """Release the writer lease — FENCED: only the holder of ``token``
    can remove the live lease. A read-then-delete would leave a window
    in which a just-stolen-from maintainer deletes its successor's
    fresh lease (r12 review #2); instead the lease is renamed to a
    unique name FIRST (atomic claim of the file), its body checked,
    and a mismatched lease renamed straight back.

    r13 (r12 advice #3): the rename-aside is gated behind a READ IN
    PLACE. The r12 shape renamed EVERY late release aside, so a
    stolen-from maintainer's release could resurrect a successor's
    already-released lease with only two actors (A renames aside; B
    releases, sees nothing, succeeds; A restores B's dead lease — an
    orphan blocking all maintenance for up to ttl). Reading first means
    a release whose token no longer matches returns WITHOUT touching
    the file; the aside/restore machinery now runs only when the body
    matched moments ago, narrowing the restore hazard from "every late
    release" to a steal landing inside one read-to-rename window — and
    a restore in THAT window puts back a lease that was live at the
    read, not a released corpse."""
    import uuid

    from prefixtree_spark.sources.io import _fs, _read_small_file

    fs, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    lp = P(f"{path}/_maintenance_lease")
    try:
        body0 = _read_small_file(spark, str(lp))
    except Exception:
        return  # lease gone (stolen + released, or never created)
    if body0 != token:
        return  # a stealer owns the lease now — don't touch it
    tmp = P(f"{path}/.lease_release_{uuid.uuid4().hex}")
    try:
        if not fs.rename(lp, tmp):
            return  # vanished between read and rename (released twice)
    except Exception:
        return
    try:
        body = _read_small_file(spark, str(tmp))
    except Exception:
        body = None
    if body == token:
        fs.delete(tmp, False)
        return
    # a steal replaced the lease between our read and rename — the
    # renamed file is the STEALER's live lease; put it back untouched
    try:
        if not fs.rename(tmp, lp):
            fs.delete(tmp, False)
    except Exception:
        pass


def refresh_maintenance_lease(spark, path: str, token: str) -> None:
    """Heartbeat + fence for a long maintenance run (r12 advice #2).

    The lease TTL is mtime-based and was never refreshed mid-run, so
    any ``maintain_*`` run longer than ``lease_ttl_s`` silently lost
    exclusion to a stealing concurrent maintainer — re-opening the
    two-writer staged-rename race the lease exists to close. The locked
    maintenance bodies call this between phases and IMMEDIATELY BEFORE
    each live-layout swap:

    - fence: re-read the lease body; if it no longer carries ``token``
      the lease was stolen (this run overran its TTL and a new
      maintainer owns the layout) — raise ``MaintenanceLeaseHeld``
      BEFORE mutating the layout, so the steal costs this run its
      result, never the layout its consistency;
    - heartbeat: push the lease mtime forward (``fs.setTimes``) so the
      TTL clock restarts at every phase boundary — a run whose phases
      each fit inside the TTL now holds exclusion for the whole run,
      however long, and ``ttl_s`` only needs to exceed the longest
      PHASE, not the longest run. Best-effort: a filesystem that
      refuses setTimes degrades to the r12 behavior (fence still
      enforced)."""
    from prefixtree_spark.sources.io import _fs, _read_small_file

    fs, jvm = _fs(spark, path)
    lp = jvm.org.apache.hadoop.fs.Path(f"{path}/_maintenance_lease")
    try:
        body = _read_small_file(spark, f"{path}/_maintenance_lease")
    except Exception:
        body = None
    if body != token:
        raise MaintenanceLeaseHeld(
            f"maintenance lease at {path!r} was stolen mid-run (this "
            "run overran its ttl); aborting before the layout swap"
        )
    try:
        fs.setTimes(lp, jvm.java.lang.System.currentTimeMillis(), -1)
    except Exception:
        pass


def probe_consistent(spark, path: str, fn, *, retries: int = 2,
                     wait_seconds: float = 0.2, consume=None):
    """THE cluster-side reader-during-swap contract (r9 missing #3),
    stated and enforced: a probe (``bm25_rank_indexed``, a loaded-IVF
    search, ...) that runs concurrently with a ``maintain_*_index``
    staged swap returns a result computed entirely against ONE layout
    — entirely-old or entirely-new — or cleanly retries; never a
    mixed or erroring read.

    Protocol: capture the generation, skip/wait while the writer's
    ``_swapping`` intent marker is up, run ``fn()`` and MATERIALIZE
    the result eagerly (``localCheckpoint`` — later actions read the
    pinned blocks, not files), then re-check marker + generation. A
    swap that completed mid-read moves the generation; a swap still
    in flight shows the marker; either way the attempt discards and
    retries. A read error (half-renamed directory) retries the same
    way. After ``retries`` failed attempts raises RuntimeError — a
    marker that never clears means a maintenance process crashed
    mid-swap; the next ``maintain_*_index`` call recovers the swap
    and clears it.

    STORAGE DUTY (r10 advice): the returned DataFrame is
    ``localCheckpoint``-ed, and on checkpoints ``unpersist()`` is a
    silent no-op and GC does not drain the blocks
    (``plans/lifecycle``) — so a scheduler wrapping every probe would
    pin one result set in executor storage per successful call for
    the session lifetime. Two supported shapes:

    - pass ``consume``: the checkpointed result is handed to
      ``consume(df)`` (collect / count / write inside it), its pinned
      blocks are released immediately after, and ``consume``'s return
      value is returned. The DataFrame must not escape ``consume``.
    - no ``consume``: the caller OWNS the checkpoint and must call
      ``prefixtree_spark.release_checkpoint(df)`` once done reading.

    Plain un-wrapped probes remain correct under the WEAKER standing
    contract (don't serve from a layout mid-rebuild); this wrapper is
    for schedulers that cannot guarantee that exclusion."""
    import time

    from prefixtree_spark.plans.lifecycle import release_checkpoint

    last_err: "Exception | None" = None
    for attempt in range(retries + 1):
        if attempt:
            time.sleep(wait_seconds)
        if is_swapping(spark, path):
            last_err = None
            continue
        g0 = read_generation_cluster(spark, path)
        try:
            out = fn().localCheckpoint(eager=True)
        except Exception as e:  # half-renamed dir mid-swap
            last_err = e
            continue
        if (not is_swapping(spark, path)
                and read_generation_cluster(spark, path) == g0):
            if consume is None:
                return out
            try:
                return consume(out)
            finally:
                release_checkpoint(out)
        # discarded attempt: free its pinned blocks now — a plain
        # unpersist() is a no-op on checkpoints (plans/lifecycle), and
        # waiting for GC would accumulate one result set per retry
        release_checkpoint(out)
        last_err = None
    if last_err is not None:
        raise last_err
    raise RuntimeError(
        f"probe_consistent: layout at {path!r} kept swapping across "
        f"{retries + 1} attempts — if no maintenance is running, a "
        "crashed swap left the _swapping marker; run maintain_*_index "
        "to recover"
    )


def read_generation(path: str) -> int:
    """The layout's ``_generation`` marker (0 when absent or torn —
    writers bump it only after a swap/append completes, so any
    readable value names a consistent layout)."""
    import os

    try:
        with open(os.path.join(path, "_generation")) as f:
            return int(f.read().strip())
    except Exception:
        return 0


def watch_generation(
    *,
    read_marker: Callable[[], int],
    load: Callable[[], tuple],
    swap: Callable,
    initial: int,
    verify: "Callable[[object], bool] | None" = None,
    poll_seconds: float = 5.0,
    name: str = "prefixtree-watcher",
) -> threading.Event:
    """The generic replica hot-reload loop. Each poll: read the on-disk
    marker; if it moved past ``initial``/the last swapped marker, fully
    ``load`` a fresh handle (→ ``(handle, marker)``), run ``verify``
    (the torn-swap discard — a swap that COMPLETED mid-load may have
    produced a mixed handle; returning False discards it and the next
    poll reloads at the new marker), then flip it in via ``swap``.
    Residual window, documented: a swap that starts mid-load and is
    still unfinished at the verify isn't caught — it flips in briefly
    and is replaced when its own bump lands next poll; single-writer
    maintenance makes that a back-to-back-swaps race, not a steady
    state. Any load/verify failure leaves the current handle serving
    and retries next poll. Returns a stop event: ``set()`` it to end
    the watcher thread."""
    stop = threading.Event()
    state = {"v": initial}

    def run() -> None:
        while not stop.wait(poll_seconds):
            try:
                m = read_marker()
                if m <= state["v"]:
                    continue
                handle, loaded = load()
                if verify is not None and not verify(handle):
                    continue
            except Exception:
                continue  # serve the current handle; retry next poll
            swap(handle)
            state["v"] = max(m, loaded)

    threading.Thread(target=run, name=name, daemon=True).start()
    return stop
