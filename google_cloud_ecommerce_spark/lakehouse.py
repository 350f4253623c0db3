"""Minimal copy-on-write table format: N-version manifests + VACUUM.

Round-10 generalization (VERDICT r9 next #2) of the round-9 two-version
``time_travel_read`` stand-in: a real, append-only manifest chain that
every versioned writer in the repo routes through, so no writer ever
overwrites a path it is reading (ADVICE r9 on merge_upsert_rewrite).

Round-11 (VERDICT r10 next #1/#2/#3/#5 + ADVICE r10): manifests now
carry per-partition min/max FILE STATS for a declared stats column and
the commit-time SCHEMA; ``table_read`` prunes on a partition-name
predicate and/or a stats range BEFORE listing anything; commits get a
Delta-style optimistic-concurrency rebase (a race loser whose touched
partitions are disjoint from the winner's re-merges and retries);
``table_changes`` / ``write_change_feed`` expose the version chain as a
row-level change feed (the readChangeFeed half of the MERGE story); and
VACUUM gained an orphan retention window so it can no longer delete a
concurrent writer's still-uncommitted staging.

Layout (all under one table root):

    root/
      _manifest/
        v0.json, v1.json, ...      # one immutable manifest per version
      slices/
        v0-3fa9c1d2/day=2024-01-01/*.parquet   # slice dir per
        v1-0b7e44aa/day=2024-01-03/...         #   (commit, partition)

A manifest maps partition directory name -> the slice directory that
holds the partition's newest rows as of that version, plus (round 11)
``stats_column`` / per-partition ``stats`` ``[min, max]`` pairs read
from the parquet FOOTERS of the slice files (metadata-only — never a
data scan; the Iceberg/Delta commit-time stats discipline) and
``schema`` (the committing DataFrame's schema as JSON, so a column-add
commit reads correctly at both the pre- and post-evolution versions).
Commit protocol (the Delta/Iceberg/Hudi copy-on-write discipline):

1. write the rewritten partitions' data under a FRESH, WRITER-UNIQUE
   ``slices/v{n}-{token}/`` prefix — committed slices are immutable, so
   concurrent readers of any older version are never disturbed, and two
   writers racing for the same version can never commingle part files
   in one directory (each stages under its own token; the loser's
   staging becomes a VACUUM-able orphan);
2. publish by hard-linking a fully written temp file to
   ``_manifest/v{n}.json`` — the manifest's content is complete the
   instant it becomes visible (no torn reads for concurrent readers,
   no permanently bricked table if the writer dies mid-publish), and
   link() is create-if-absent so the loser of a version race detects
   the loss. On filesystems without hard links the fallback claims the
   version through an O_CREAT|O_EXCL ``.claim`` sentinel and then
   os.replace()s the fully written temp file into place (ADVICE r10:
   the old fallback made the manifest visible before its content
   landed, so a concurrent reader could hit a torn JSON; the sentinel
   keeps the race check atomic while readers only ever see complete
   content);
3. (round 11) a publish loser REBASES instead of failing when its
   touched partitions are disjoint from everything that changed since
   its base version: the already-staged slices are reused verbatim
   (immutable — no data rewrite), the pointer map is re-merged onto
   the new latest manifest, and the publish retries at the next
   version. Overlapping writers still fail loudly with
   ``CommitConflictError`` — that is the Delta optimistic-concurrency
   protocol, not last-writer-wins.

Deletes: a rewrite that leaves a touched partition EMPTY writes no
slice dir for it, so the prior pointer would silently survive —
callers must declare emptied partitions via ``drop_partitions``, which
removes their manifest entries for the new version (older versions
still see them: that is what makes the delete time-travelable).

Reads resolve a manifest into one Spark scan per referenced slice
prefix, each listing EXACTLY its slice directories — version
resolution costs file-listing on the touched partitions only, never a
data-proportional filter, and dead (expired/orphaned/pruned) slices
are never listed at all. With a partition predicate or stats range the
listing shrinks further to the matching partitions (at 100 TB, a
day-bounded query on a 3-year table lists ~0.1% of the manifest's
dirs); stats pruning is a PERFORMANCE contract only — surviving
partitions still contain non-matching rows, so callers keep their row
filters and Catalyst pushes them into the pruned scan.

VACUUM classifies every slice directory as live (referenced by a
retained manifest), expired (referenced only by dropped manifests),
orphan (referenced by none — a failed/lost commit or a race loser's
staging) or — round 11 — pending (unreferenced but YOUNGER than the
retention window: indistinguishable from a concurrent writer's
mid-commit staging, so never deleted; ADVICE r10), deletes the
non-live aged ones, and returns the classification.

Local-filesystem implementation: manifest IO is plain Python file
handling — on cloud object stores this step is the table format's
catalog/metastore commit (the reference keeps this state in BigQuery /
Spanner; see /root/reference/batch_pipeline/write_session_batch.py),
not a Spark job. Slice data always moves through Spark writers.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import shutil
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# link() errnos meaning "hard links unsupported here" — shared with the
# wire sink, whose manifest commit uses the identical discipline.
from google_cloud_ecommerce_spark.sources.wire import _LINK_UNSUPPORTED_ERRNOS

_MANIFEST_DIR = "_manifest"
_SLICES_DIR = "slices"

# How long an unreferenced slice dir must sit untouched before VACUUM
# may call it an orphan (Delta's default retention is 7 days; ours is
# shorter because staging -> publish is seconds, not a long job — but
# the guard exists for the same reason: a concurrent writer's staged
# slices are unreferenced until its manifest lands, and deleting them
# would corrupt the commit it is about to publish).
ORPHAN_RETAIN_SECONDS_DEFAULT = 24 * 3600.0

# How long a publish loser waits for the racing winner's manifest to
# become visible before giving up on the rebase (the no-hardlink
# fallback claims the version a beat before the content lands; same
# deadline the wire sink polls with).
_REBASE_POLL_DEADLINE_S = 2.0

# A .claim sentinel (no-hardlink publish fallback) whose manifest never
# appeared within this window belongs to a writer that died between
# claim and replace — later writers break it instead of treating the
# version as permanently taken. Claim -> replace is microseconds, so
# seconds of age is already conclusive; 60 s is paranoid-generous.
_CLAIM_STALE_SECONDS = 60.0


class CommitConflictError(RuntimeError):
    """Two writers committed overlapping partitions concurrently; the
    loser's rewrite was computed against a base the winner has since
    replaced, so rebasing would silently drop the winner's rows."""


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"v{version}.json")


def table_versions(root: str) -> list[int]:
    """Committed versions, ascending. Empty if the root is not a table."""
    mdir = os.path.join(root, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_manifest_doc(root: str, version: int) -> dict:
    with open(_manifest_path(root, version), encoding="utf-8") as fh:
        doc = json.load(fh)
    if doc.get("version") != version:  # a renamed/corrupt manifest file
        raise ValueError(f"manifest {version} self-reports {doc.get('version')}")
    return doc


def _read_manifest(root: str, version: int) -> dict[str, str]:
    return _read_manifest_doc(root, version)["partitions"]


def _publish_manifest(
    root: str,
    version: int,
    partitions: dict[str, str],
    *,
    schema_json: str | None = None,
    stats_column: str | None = None,
    stats: dict[str, list] | None = None,
    deletes: dict[str, str] | None = None,
    delete_key: str | None = None,
    txn: dict[str, int] | None = None,
) -> None:
    """Commit-by-link: the manifest is fully written to a temp file
    first, so it is complete the instant it becomes visible (a writer
    crash mid-publish leaves only the temp file, never a torn
    v{n}.json that would brick every read and VACUUM). link() is
    create-if-absent, so the loser of a version race fails loudly; its
    slice staging becomes a VACUUM-able orphan. Where hard links are
    unsupported, an O_CREAT|O_EXCL ``.claim`` sentinel carries the
    create-if-absent race check and the content lands via os.replace —
    readers never observe a partially written manifest (ADVICE r10)."""
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    body: dict = {"version": version, "partitions": dict(sorted(partitions.items()))}
    if schema_json is not None:
        body["schema"] = json.loads(schema_json)
    if stats_column is not None:
        body["stats_column"] = stats_column
        body["stats"] = {k: stats[k] for k in sorted(stats or {})}
    if deletes:
        body["deletes"] = dict(sorted(deletes.items()))
        body["delete_key"] = delete_key
    if txn:
        body["txn"] = dict(sorted(txn.items()))
    doc = json.dumps(body, indent=0, sort_keys=True)
    final = _manifest_path(root, version)
    tmp = f"{final}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as out:
        out.write(doc)
    race = FileExistsError(
        f"version {version} already committed at {root}: a concurrent "
        "writer won the race; this writer's slice staging is a "
        "VACUUM-able orphan"
    )
    try:
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise race from None
        except OSError as exc:
            if exc.errno not in _LINK_UNSUPPORTED_ERRNOS:
                raise  # a real failure (EACCES, EMLINK, ...) must surface
            if os.path.exists(final):
                raise race from None
            claim = f"{final}.claim"
            # fencing token (ADVICE r11): identifies THIS writer's claim
            # so a claim broken during a long stall is detected before
            # the replace, not silently overwritten after it
            token = f"{os.getpid()}.{uuid.uuid4().hex}"
            for attempt in (0, 1):
                try:
                    fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    try:
                        os.write(fd, token.encode("ascii"))
                    finally:
                        os.close(fd)
                    break
                except FileExistsError:
                    # a claim with no manifest is either a racing writer
                    # mid-publish (claim -> replace is microseconds) or a
                    # writer that DIED in that window; an aged claim is
                    # the corpse — break it so the version stays
                    # commitable (self-review r11: a stale claim used to
                    # brick every future commit on no-hardlink FSes)
                    if (
                        attempt == 0
                        and not os.path.exists(final)
                        and time.time() - os.path.getmtime(claim)
                        > _CLAIM_STALE_SECONDS
                    ):
                        try:
                            os.unlink(claim)
                        except FileNotFoundError:
                            pass  # another claim-breaker got there first
                        continue
                    raise race from None
            # re-verify ownership IMMEDIATELY before the replace: if this
            # writer stalled past _CLAIM_STALE_SECONDS between claim and
            # replace (SIGSTOP, VM pause), a breaker may have re-claimed
            # and published — replacing then would silently overwrite a
            # committed manifest (ADVICE r11)
            try:
                with open(claim, encoding="ascii") as cf:
                    owner = cf.read()
            except OSError:
                owner = None
            if owner != token:
                raise race from None  # claim broken while stalled
            try:
                # content is already complete in tmp; replace is atomic,
                # so no reader ever sees a partial v{n}.json
                os.replace(tmp, final)
            except Exception:
                os.unlink(claim)  # keep the version retryable
                raise
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _stats_value(v):
    """JSON-encodable, order-preserving projection of a footer stat
    (dates/timestamps via isoformat — lexicographic == chronological)."""
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (int, float, str)):
        return v
    return None  # binary/decimal/etc.: no pruning rather than wrong pruning


def _collect_partition_stats(
    root: str, parts: dict[str, str], stats_col: str
) -> dict[str, list]:
    """Per-partition [min, max] of ``stats_col`` read from the parquet
    FOOTERS of the just-written slice files — metadata-only (the
    Iceberg manifest-stats discipline; a data scan here would double
    the commit's IO). A partition where any row group lacks usable
    min/max gets NO entry: missing stats mean "cannot prune", never
    "prune wrongly"."""
    import pyarrow.parquet as pq

    out: dict[str, list] = {}
    for name, rel in parts.items():
        pdir = os.path.join(root, rel)
        lo = hi = None
        usable = True
        for fn in os.listdir(pdir):
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(pdir, fn)).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            if stats_col not in names:
                usable = False
                break
            ci = names.index(stats_col)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                if st is None or not st.has_min_max:
                    usable = False
                    break
                mn, mx = _stats_value(st.min), _stats_value(st.max)
                if mn is None or mx is None:
                    usable = False
                    break
                lo = mn if lo is None or mn < lo else lo
                hi = mx if hi is None or mx > hi else hi
            if not usable:
                break
        if usable and lo is not None:
            out[name] = [lo, hi]
    return out


def _write_slices(
    df: DataFrame, root: str, version: int, partition_col: str
) -> dict[str, str]:
    """Write df's partitions under a writer-unique slices/v{version}-
    {token}/ staging prefix and return the partition -> slice-dir
    mapping they create. The token is what keeps two writers racing for
    one version from ever interleaving part files in a directory the
    winner's manifest will reference. (After a rebase the committed
    version can exceed the staged prefix's number — the prefix is a
    staging label, never an address: only the manifest maps versions
    to slices.)"""
    vname = f"v{version}-{uuid.uuid4().hex[:8]}"
    vdir = os.path.join(root, _SLICES_DIR, vname)
    df.write.mode("errorifexists").partitionBy(partition_col).parquet(vdir)
    rel = f"{_SLICES_DIR}/{vname}"
    return {
        name: f"{rel}/{name}"
        for name in os.listdir(vdir)
        if name.startswith(f"{partition_col}=")
        and os.path.isdir(os.path.join(vdir, name))
    }


def table_create(
    df: DataFrame, root: str, partition_col: str = "day", stats_col: str | None = None
) -> int:
    """Create version 0 of a table from df. Returns the version (0)."""
    if table_versions(root):
        raise ValueError(f"table already exists at {root}")
    parts = _write_slices(df, root, 0, partition_col)
    stats = _collect_partition_stats(root, parts, stats_col) if stats_col else None
    _publish_manifest(
        root, 0, parts,
        schema_json=df.schema.json(), stats_column=stats_col, stats=stats,
    )
    return 0


def _await_version(root: str, version: int) -> dict:
    """Read a manifest that is known to be committed or mid-publish (the
    loser saw the winner's claim); poll briefly for visibility on the
    no-hardlink fallback path where the claim lands a beat early."""
    deadline = time.monotonic() + _REBASE_POLL_DEADLINE_S
    while True:
        try:
            return _read_manifest_doc(root, version)
        except FileNotFoundError:
            if time.monotonic() >= deadline:
                raise
            time.sleep(0.02)


def table_commit_rewrite(
    df: DataFrame,
    root: str,
    partition_col: str = "day",
    drop_partitions: list[str] | None = None,
    stats_col: str | None = None,
    max_commit_retries: int = 3,
    _race_hook: Callable[[], None] | None = None,
) -> int:
    """Commit df — the full rewritten rows of the TOUCHED partitions
    only — as the next version. Untouched partitions keep their prior
    slice pointers; nothing the rewrite read is ever overwritten (the
    new slices land under a fresh staging prefix and only then does the
    manifest flip — commit-after-write). A touched partition the
    rewrite left EMPTY must be named in ``drop_partitions`` (e.g.
    ``["day=2024-01-05"]``) — an empty partition writes no slice dir,
    so without the declaration its old pointer would silently survive
    into the new version.

    Optimistic concurrency (round 11, the Delta protocol): losing the
    publish race no longer fails outright. If every partition this
    writer touched (wrote or dropped) is untouched between its base
    version and the new latest, the already-staged slices are re-merged
    onto the winner's manifest and the publish retries at the next
    version — data is written exactly once. Overlap raises
    ``CommitConflictError``; more than ``max_commit_retries`` straight
    losses re-raises the race error. Returns the committed version.

    ``_race_hook`` is a test seam: called once after slices are staged
    and before the first publish attempt (the window a concurrent
    winner lands in)."""
    versions = table_versions(root)
    if not versions:
        raise ValueError(f"no table at {root}; table_create first")
    base_version = versions[-1]
    base_doc = _read_manifest_doc(root, base_version)
    base_parts = base_doc["partitions"]
    for name in drop_partitions or ():
        if name not in base_parts:
            raise ValueError(
                f"drop_partitions entry {name!r} is not a partition of "
                f"version {base_version} at {root}"
            )
    new_parts = _write_slices(df, root, base_version + 1, partition_col)
    touched = set(new_parts) | set(drop_partitions or ())
    eff_stats_col = stats_col or base_doc.get("stats_column")
    new_stats = (
        _collect_partition_stats(root, new_parts, eff_stats_col)
        if eff_stats_col
        else {}
    )
    if _race_hook is not None:
        _race_hook()

    cur_version, cur_doc = base_version, base_doc
    for _ in range(max_commit_retries + 1):
        merged = dict(cur_doc["partitions"])
        for name in drop_partitions or ():
            merged.pop(name, None)  # overlap with a winner's drop is caught below
        merged.update(new_parts)
        stats = None
        if eff_stats_col:
            carried = (
                cur_doc.get("stats", {})
                if cur_doc.get("stats_column") == eff_stats_col
                else {}
            )
            stats = {
                p: carried[p] for p in merged if p in carried and p not in new_parts
            }
            stats.update(new_stats)
        # deletion vectors: a REWRITTEN partition's DV is materialized —
        # the rewrite df was computed from the DV-applied logical view,
        # so the fresh slice already excludes the deleted rows and the
        # DV pointer must not survive (it would re-delete re-inserted
        # keys); untouched partitions carry their DVs forward.
        deletes = {
            p: rel
            for p, rel in cur_doc.get("deletes", {}).items()
            if p in merged and p not in new_parts
        }
        try:
            _publish_manifest(
                root,
                cur_version + 1,
                merged,
                schema_json=df.schema.json(),
                stats_column=eff_stats_col,
                stats=stats,
                deletes=deletes,
                delete_key=cur_doc.get("delete_key") if deletes else None,
                txn=cur_doc.get("txn"),
            )
            return cur_version + 1
        except FileExistsError as race:
            cur_version, cur_doc = _rebase_or_conflict(
                root, base_doc, touched, cur_version
            )
            last_race = race
    raise last_race


def _pointer_map(doc: dict) -> dict[str, tuple]:
    """Per-partition (slice, dv) pointer pair — the unit of commit
    conflict: two writers conflict iff any partition's pair changed
    under one while the other assumed the old state."""
    dvs = doc.get("deletes", {})
    return {
        p: (tuple(_rels_of(rel)), dvs.get(p))
        for p, rel in doc["partitions"].items()
    } | {p: (None, rel) for p, rel in dvs.items() if p not in doc["partitions"]}


def _schema_shape(doc: dict):
    """(name, type) pairs of the recorded schema, IGNORING nullability:
    a rewrite that sets a column via a literal flips nullable without
    changing what the table stores, and treating that as a metadata
    conflict would make nearly every rebase fail."""
    raw = doc.get("schema")
    if not raw:
        return None
    st = StructType.fromJson(raw)
    return tuple((f.name, f.dataType.simpleString()) for f in st.fields)


def _metadata_conflict_guard(root: str, base_doc: dict, latest_doc: dict) -> None:
    """Manifest-GLOBAL metadata (schema shape, stats column, delete
    key) conflicts with EVERYTHING (the Delta rule): a loser that
    rebased past a concurrent schema evolution would republish its own
    stale schema_json and silently undo the winner's column-add
    table-wide (self-review r11)."""
    if _schema_shape(base_doc) != _schema_shape(latest_doc):
        raise CommitConflictError(
            f"concurrent commit at {root} changed table metadata "
            "(schema); metadata changes conflict with every in-flight "
            "commit — recompute against the new latest version"
        ) from None
    for field in ("stats_column", "delete_key"):
        if base_doc.get(field) != latest_doc.get(field):
            raise CommitConflictError(
                f"concurrent commit at {root} changed table metadata "
                f"({field}); metadata changes conflict with every "
                "in-flight commit — recompute against the new latest "
                "version"
            ) from None


def _rebase_or_conflict(
    root: str, base_doc: dict, touched: set[str], cur_version: int
) -> tuple[int, dict]:
    """Shared publish-race handler (rewrites and DV deletes): wait for
    the winner's manifest, then either hand back the new base for a
    retry (every partition this writer touched has an unchanged
    (slice, dv) pointer pair since its base, and no table-global
    metadata moved) or raise CommitConflictError."""
    latest = table_versions(root)[-1]
    try:
        latest_doc = _await_version(root, max(latest, cur_version + 1))
    except FileNotFoundError:
        # the winner's claim exists but its manifest never appeared —
        # the claim holder likely died mid-publish. Surface the
        # RETRYABLE race error, not a bare FileNotFoundError; a retried
        # commit reaches the stale-claim breaker once the claim ages
        # past _CLAIM_STALE_SECONDS (ADVICE r11).
        raise FileExistsError(
            f"version {cur_version + 1} at {root} is claimed but its "
            "manifest never became visible; the claim holder likely died "
            "mid-publish — retry the commit (the stale-claim breaker "
            f"frees the version after {_CLAIM_STALE_SECONDS}s)"
        ) from None
    _metadata_conflict_guard(root, base_doc, latest_doc)
    base_map, latest_map = _pointer_map(base_doc), _pointer_map(latest_doc)
    changed_since_base = {
        p
        for p in set(base_map) | set(latest_map)
        if base_map.get(p) != latest_map.get(p)
    }
    overlap = touched & changed_since_base
    if overlap:
        raise CommitConflictError(
            f"concurrent commit at {root} touched partitions this "
            f"writer also touched ({sorted(overlap)[:5]}...); "
            "rebasing would drop the winner's rows — recompute "
            "against the new latest version"
        ) from None
    return latest_doc["version"], latest_doc


def _align_to_schema(scan: DataFrame, target: StructType | None) -> DataFrame:
    """Project a slice scan onto the manifest's recorded schema: columns
    the slice predates (schema evolution) read as typed NULLs, columns
    a later schema dropped disappear, order follows the manifest. Cast
    nothing that exists — the slice's own parquet types are
    authoritative for data it actually stores."""
    if target is None:
        return scan
    have = set(scan.columns)
    return scan.select(
        *[
            F.col(f.name) if f.name in have else F.lit(None).cast(f.dataType).alias(f.name)
            for f in target.fields
        ]
    )


def read_slices(
    spark: SparkSession,
    root: str,
    rels: list[str],
    schema: StructType | None = None,
) -> DataFrame:
    """Scan an explicit set of slice-relative dirs: one Spark scan per
    slice prefix, each listing exactly the given dirs (the partition
    column is recovered via basePath), unioned. When a manifest schema
    is supplied each scan is aligned to it first (schema evolution:
    older slices null-fill columns they predate). Used by version
    resolution, the change feed, and VACUUM accounting reads."""
    by_prefix: dict[str, list[str]] = {}
    for rel in rels:
        by_prefix.setdefault(rel.split("/")[1], []).append(rel)
    out: DataFrame | None = None
    for vdir, group in sorted(by_prefix.items()):
        base = os.path.join(root, _SLICES_DIR, vdir)
        paths = [os.path.join(root, rel) for rel in sorted(group)]
        scan = _align_to_schema(
            spark.read.option("basePath", base).parquet(*paths), schema
        )
        out = scan if out is None else out.unionByName(scan)
    if out is None:
        raise ValueError("empty slice set")
    return out


def _manifest_schema(doc: dict) -> StructType | None:
    raw = doc.get("schema")
    return StructType.fromJson(raw) if raw else None


def _partition_col_of(names) -> str:
    """The partition column name, recovered from any partition dir name
    (every name is '<col>=<value>')."""
    return next(iter(names)).split("=", 1)[0]


def _rels_of(pointer) -> list[str]:
    """A partition pointer is one slice-relative dir (str — the common
    rewrite case, and the only pre-round-11 form) or a list of them
    (append commits accumulate slices until an OPTIMIZE re-packs the
    partition). Normalize to a list."""
    return [pointer] if isinstance(pointer, str) else list(pointer)


def _pointer_of(rels: list[str]):
    """Inverse of _rels_of: singletons serialize as plain strings so
    rewrite-only tables keep the exact pre-append manifest form."""
    return rels[0] if len(rels) == 1 else rels


def _read_logical(
    spark: SparkSession, root: str, doc: dict, names: list[str]
) -> DataFrame:
    """Resolve the LOGICAL content of the given partitions of one
    manifest: slice scans, with each deletion-vectored partition's rows
    anti-joined against its DV keys (merge-on-read, the Delta
    deletion-vector / Iceberg equality-delete read path). Partitions
    without a DV never pay the anti-join — the scan splits into a clean
    union branch and a DV'd branch, so at 100 TB the join touches only
    the deleted-from partitions' data (DV key sets are tiny relative to
    data and AQE broadcasts them)."""
    parts = doc["partitions"]
    dvs = doc.get("deletes", {})
    schema = _manifest_schema(doc)
    clean = [r for n in names if n not in dvs for r in _rels_of(parts[n])]
    dirty = [n for n in names if n in dvs]
    out: DataFrame | None = None
    if clean:
        out = read_slices(spark, root, clean, schema=schema)
    if dirty:
        pcol = _partition_col_of(dirty)
        key = doc["delete_key"]
        data = read_slices(
            spark, root, [r for n in dirty for r in _rels_of(parts[n])], schema=schema
        )
        dv_keys = read_slices(spark, root, [dvs[n] for n in dirty]).select(pcol, key)
        undeleted = data.join(dv_keys, [pcol, key], "left_anti")
        out = undeleted if out is None else out.unionByName(undeleted)
    if out is None:
        raise ValueError("empty partition set")
    return out


def _resolve_version(root: str, version: int | None) -> int:
    versions = table_versions(root)
    if not versions:
        raise ValueError(f"no table at {root}")
    if version is None:
        return versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in {versions} at {root}")
    return version


def table_read(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    *,
    partition_filter: Callable[[str], bool] | None = None,
    stats_range: tuple | None = None,
) -> DataFrame:
    """Resolve a version (default: latest) into a DataFrame. Slice dirs
    a newer rewrite superseded are never even listed.

    Round 11 (VERDICT r10 next #1): ``partition_filter`` is a predicate
    over partition directory NAMES (``"day=2024-01-15"`` — lexicographic
    range tests work because the day encoding is ISO); ``stats_range``
    is an inclusive ``(lo, hi)`` over the manifest's ``stats_column`` —
    a partition whose recorded footer [min, max] misses the range is
    skipped WITHOUT LISTING IT (partitions with no recorded stats are
    kept: missing stats never prune). Both prune at manifest-resolution
    time, before any filesystem listing — on a 100 TB table a
    day-bounded read lists only the matching days' slice dirs. Stats
    pruning is a superset guarantee, not a filter: callers keep their
    row predicates; Catalyst pushes them into the shrunken scan."""
    version = _resolve_version(root, version)
    doc = _read_manifest_doc(root, version)
    parts = doc["partitions"]
    names = sorted(parts)
    if partition_filter is not None:
        names = [n for n in names if partition_filter(n)]
    if stats_range is not None:
        # manifest stats store temporal values as ISO strings
        # (_stats_value), so datetime/date bounds must be normalized the
        # same way before comparing — a raw datetime bound against a
        # string stat is a TypeError (ADVICE r11). ISO comparison is
        # chronological, so the pruning decision is unchanged.
        lo, hi = (_stats_value(b) for b in stats_range)
        if lo is None or hi is None:
            raise ValueError(
                f"stats_range bounds {stats_range!r} are not comparable "
                "against manifest stats (use int/float/str/date/datetime)"
            )
        stats = doc.get("stats", {})
        names = [
            n
            for n in names
            if n not in stats or (stats[n][1] >= lo and stats[n][0] <= hi)
        ]
    schema = _manifest_schema(doc)
    if not names:
        if schema is None:
            raise ValueError(
                f"no partitions of version {version} at {root} match the "
                "predicate (and the manifest predates recorded schemas, "
                "so an empty frame cannot be typed)"
            )
        return spark.createDataFrame([], schema)
    return _read_logical(spark, root, doc, names)


_CHANGE_TYPE_COL = "_change_type"
_COMMIT_VERSION_COL = "_commit_version"


def table_changes(
    spark: SparkSession, root: str, v_from: int, v_to: int, key_col: str
) -> DataFrame:
    """Row-level change feed between two committed versions (Delta
    readChangeFeed / Iceberg incremental read, VERDICT r10 next #3):
    emits ``insert`` / ``delete`` / ``update_preimage`` /
    ``update_postimage`` rows plus ``_commit_version``. Input is
    MANIFEST-PRUNED — only partitions whose slice pointer changed are
    listed (the version_diff_pruned discipline made row-level), so the
    diff costs the delta, not the table. Within each changed partition
    the old and new slices full-outer join on ``key_col``; a row copied
    verbatim by the rewrite null-safe-compares equal and emits nothing.
    Single pass: each joined row explodes into its 0-2 change records —
    no per-change-type re-scan of the join."""
    doc_from = _read_manifest_doc(root, _resolve_version(root, v_from))
    doc_to = _read_manifest_doc(root, _resolve_version(root, v_to))
    map0, map1 = _pointer_map(doc_from), _pointer_map(doc_to)
    # a partition participates when its (slice, dv) pointer PAIR changed
    # — covering rewrites, DV-only delete commits, and OPTIMIZE (slice
    # changed + DV materialized away: the logical diff is empty and the
    # feed correctly emits nothing, because both sides resolve through
    # their DVs)
    changed = sorted(p for p in set(map0) | set(map1) if map0.get(p) != map1.get(p))
    schema = _manifest_schema(doc_to) or _manifest_schema(doc_from)
    if not changed:
        # Empty diffs are reachable — an empty micro-batch append or a
        # txn-only redelivery publishes a new version with unchanged
        # pointers, and write_change_feed walks every consecutive pair —
        # so emit an empty TYPED feed instead of crashing in pcol
        # derivation (ADVICE r11).
        if schema is None:
            raise ValueError(
                f"change feed {v_from}->{v_to} at {root} is an empty diff "
                "and the manifests predate recorded schemas, so an empty "
                "frame cannot be typed"
            )
        from pyspark.sql.types import LongType, StringType, StructField

        by_name = {f.name: f for f in schema.fields}
        out_schema = StructType(
            [by_name[key_col]]
            + [f for f in schema.fields if f.name != key_col]
            + [
                StructField(_CHANGE_TYPE_COL, StringType()),
                StructField(_COMMIT_VERSION_COL, LongType()),
            ]
        )
        return spark.createDataFrame([], out_schema)
    old_names = [p for p in changed if p in doc_from["partitions"]]
    new_names = [p for p in changed if p in doc_to["partitions"]]
    if schema is not None:
        cols = [f.name for f in schema.fields]
    else:  # pre-round-11 manifests: derive columns from a slice scan
        probe_doc, probe_names = (
            (doc_to, new_names) if new_names else (doc_from, old_names)
        )
        cols = _read_logical(spark, root, probe_doc, probe_names).columns
    data_cols = [c for c in cols if c != key_col]

    def side(doc: dict, names: list[str], tag: str) -> DataFrame:
        if names:
            # align both sides to the newer schema: across a column-add
            # commit the old side null-fills, exactly like a read at the
            # new version would present the old slices
            df = _align_to_schema(_read_logical(spark, root, doc, names), schema)
        else:
            df = spark.createDataFrame([], schema) if schema is not None else None
            if df is None:
                raise ValueError("change feed on empty side needs a recorded schema")
        return df.select(
            F.col(key_col).alias(f"{tag}_{key_col}"),
            *[F.col(c).alias(f"{tag}_{c}") for c in data_cols],
        )

    o, n = side(doc_from, old_names, "o"), side(doc_to, new_names, "n")
    # join per (partition, key), not key alone: ``key_col`` need only be
    # unique WITHIN a partition — a key value repeated across partitions
    # (per-day sequence numbers, say) must not cross-match and fabricate
    # update pairs between unrelated rows (self-review r11). A row that
    # genuinely moves partitions therefore feeds delete + insert, which
    # is the honest CDC rendering of a partition move.
    pcol = _partition_col_of(changed)
    j = o.join(
        n,
        (o[f"o_{key_col}"] == n[f"n_{key_col}"])
        & (o[f"o_{pcol}"] == n[f"n_{pcol}"]),
        "full_outer",
    )

    def record(tag: str, change: str):
        return F.struct(
            F.col(f"{tag}_{key_col}").alias(key_col),
            *[F.col(f"{tag}_{c}").alias(c) for c in data_cols],
            F.lit(change).alias(_CHANGE_TYPE_COL),
        )

    differs = F.lit(False)
    for c in data_cols:
        differs = differs | ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}"))
    changes = (
        F.when(F.col(f"o_{key_col}").isNull(), F.array(record("n", "insert")))
        .when(F.col(f"n_{key_col}").isNull(), F.array(record("o", "delete")))
        .when(
            differs,
            F.array(record("o", "update_preimage"), record("n", "update_postimage")),
        )
        .otherwise(F.array())
    )
    return (
        j.select(F.explode(changes).alias("ch"))
        .select("ch.*")
        .withColumn(_COMMIT_VERSION_COL, F.lit(v_to).cast("long"))
    )


def write_change_feed(
    spark: SparkSession,
    root: str,
    feed_dir: str,
    key_col: str,
    versions: list[int] | None = None,
    files_per_commit: int = 1,
) -> list[int]:
    """Materialize the change feed of consecutive version transitions
    as parquet under ``feed_dir`` — the commit-time change-file
    discipline (Delta CDF writes these during MERGE; computing them
    from the manifest chain afterwards is equivalent for CoW tables
    because slices are immutable). One file batch per commit, so a
    file-source stream with maxFilesPerTrigger=1 replays the chain one
    COMMIT per micro-batch. ``files_per_commit`` bounds the coalesce —
    at scale this stays at the natural shuffle width and the stream
    triggers on listing order instead. Returns the versions written."""
    vs = versions if versions is not None else table_versions(root)
    done = []
    for v_prev, v in zip(vs, vs[1:]):
        (
            table_changes(spark, root, v_prev, v, key_col)
            .coalesce(files_per_commit)
            .write.mode("append")
            .parquet(feed_dir)
        )
        done.append(v)
    return done


def table_commit_append(
    df: DataFrame,
    root: str,
    partition_col: str = "day",
    stats_col: str | None = None,
    txn: tuple[str, int] | None = None,
    max_commit_retries: int = 3,
    _race_hook: Callable[[], None] | None = None,
) -> int:
    """Blind APPEND: commit df's rows as ADDITIONAL slices of their
    partitions — no survivors join, no partition rewrite, no prior data
    read (the streaming-ingest write path: each micro-batch costs its
    own rows, while table_commit_rewrite costs the touched partitions).
    A partition accumulates a slice list until OPTIMIZE re-packs it.

    Appends never conflict (the Delta blind-append rule): losing the
    publish race always rebases — the staged slice is appended onto
    whatever the winner left, even for the same partition, because
    appended rows cannot invalidate a concurrent rewrite's survivor
    set. The one exclusion is a partition currently carrying a
    DELETION VECTOR: the DV's keys would anti-join freshly appended
    rows that reuse a deleted key, so appends to DV'd partitions raise
    — OPTIMIZE the partition first (Delta avoids this because its DVs
    are per-file; ours are per-partition equality deletes).

    ``txn`` is the Delta idempotent-writer protocol: (app_id, version)
    — a commit whose version is <= the manifest's recorded high-water
    mark for app_id is a REDELIVERY and is skipped without writing
    (exactly-once for restarted streaming epochs). Per-partition stats
    WIDEN: the appended slice's footer range unions into the carried
    range; a partition with no prior stats record gains none (the old
    rows' range is unknown — missing stats never prune wrongly).
    Returns the committed (or already-applied) version."""
    versions = table_versions(root)
    if not versions:
        raise ValueError(f"no table at {root}; table_create first")
    base_version = versions[-1]
    base_doc = _read_manifest_doc(root, base_version)

    def already_applied(doc: dict) -> bool:
        return (
            txn is not None
            and doc.get("txn", {}).get(txn[0], -1) >= txn[1]
        )

    if already_applied(base_doc):
        return base_version
    new_parts = _write_slices(df, root, base_version + 1, partition_col)
    eff_stats_col = stats_col or base_doc.get("stats_column")
    new_stats = (
        _collect_partition_stats(root, new_parts, eff_stats_col)
        if eff_stats_col
        else {}
    )
    if _race_hook is not None:
        _race_hook()

    cur_version, cur_doc = base_version, base_doc
    for _ in range(max_commit_retries + 1):
        if already_applied(cur_doc):  # the race winner was our own retry
            return cur_version
        dv_hit = set(new_parts) & set(cur_doc.get("deletes", {}))
        if dv_hit:
            raise ValueError(
                f"append touches deletion-vectored partitions "
                f"{sorted(dv_hit)[:5]} at {root}: the per-partition DV "
                "would anti-join the appended rows — run table_optimize "
                "first"
            )
        merged = dict(cur_doc["partitions"])
        for name, rel in new_parts.items():
            merged[name] = _pointer_of(_rels_of(merged[name]) + [rel]
                                       if name in merged else [rel])
        stats = None
        if eff_stats_col:
            carried = (
                cur_doc.get("stats", {})
                if cur_doc.get("stats_column") == eff_stats_col
                else {}
            )
            stats = {p: carried[p] for p in merged if p in carried}
            for name, (lo, hi) in new_stats.items():
                if name in stats:
                    stats[name] = [min(stats[name][0], lo), max(stats[name][1], hi)]
                elif name not in cur_doc["partitions"]:
                    stats[name] = [lo, hi]  # brand-new partition: exact
            for name in new_parts:
                if name not in new_stats:
                    # the appended slice's footers were unusable (NaN
                    # row groups, missing column): a carried range no
                    # longer bounds the partition, and keeping it would
                    # prune freshly appended rows (self-review r11)
                    stats.pop(name, None)
        merged_txn = dict(cur_doc.get("txn", {}))
        if txn is not None:
            merged_txn[txn[0]] = txn[1]
        try:
            _publish_manifest(
                root,
                cur_version + 1,
                merged,
                schema_json=df.schema.json(),
                stats_column=eff_stats_col,
                stats=stats,
                deletes=cur_doc.get("deletes"),
                delete_key=cur_doc.get("delete_key"),
                txn=merged_txn or None,
            )
            return cur_version + 1
        except FileExistsError as race:
            # blind appends rebase past any DATA change: wait for the
            # winner and re-merge (appends commute with rewrites and
            # deletes — the DV exclusion re-checks against the new base
            # at the top of the loop). Table-GLOBAL metadata still
            # conflicts (the Delta rule; self-review r11).
            latest = table_versions(root)[-1]
            try:
                latest_doc = _await_version(root, max(latest, cur_version + 1))
            except FileNotFoundError:
                # same translation as _rebase_or_conflict: a died claim
                # holder must surface as the retryable race (ADVICE r11)
                raise FileExistsError(
                    f"version {cur_version + 1} at {root} is claimed but "
                    "its manifest never became visible; retry the commit "
                    "(the stale-claim breaker frees the version after "
                    f"{_CLAIM_STALE_SECONDS}s)"
                ) from None
            _metadata_conflict_guard(root, base_doc, latest_doc)
            cur_version, cur_doc = latest_doc["version"], latest_doc
            last_race = race
    raise last_race


def table_delete_rows(
    spark: SparkSession,
    root: str,
    keys_df: DataFrame,
    key_col: str,
    partition_col: str = "day",
    max_commit_retries: int = 3,
    _race_hook: Callable[[], None] | None = None,
) -> int:
    """Row-level DELETE as a deletion-vector commit (merge-on-read: the
    Delta deletion-vector / Iceberg equality-delete discipline) —
    ``keys_df`` is (partition_col, key_col) rows naming what to delete;
    the commit writes ONLY those tiny key sets (staged under the same
    writer-unique slice prefix) and the new manifest points each
    touched partition at its cumulative DV. No data file is rewritten
    or even read — on a 100 TB table a million-row delete costs a
    million-row write, not a partition rewrite; reads anti-join the
    DV'd partitions only, and the next rewrite or OPTIMIZE of a
    partition materializes its DV away. Successive deletes UNION into
    the partition's DV (the prior keys are re-staged with the new ones
    — DV sets stay tiny relative to data; a DV that grows toward its
    partition's size is the signal to OPTIMIZE). Per-partition footer
    stats stay valid: the remaining rows are a subset of the recorded
    [min, max], so pruning is still a superset guarantee. Same
    optimistic concurrency as table_commit_rewrite — the (slice, dv)
    pointer pair is the conflict unit, so a delete races a rewrite of
    the same partition into a CommitConflictError. Returns the
    committed version."""
    versions = table_versions(root)
    if not versions:
        raise ValueError(f"no table at {root}; table_create first")
    base_version = versions[-1]
    base_doc = _read_manifest_doc(root, base_version)
    base_key = base_doc.get("delete_key")
    if base_key is not None and base_key != key_col:
        raise ValueError(
            f"table at {root} already carries deletion vectors keyed on "
            f"{base_key!r}; mixed delete keys cannot anti-join in one pass"
        )
    keys = keys_df.select(partition_col, key_col)
    prior = base_doc.get("deletes", {})
    if prior:  # cumulative DV: union the prior keys of touched partitions
        prior_keys = read_slices(spark, root, sorted(set(prior.values()))).select(
            partition_col, key_col
        )
        touched_parts = keys.select(partition_col).distinct()
        keys = keys.unionByName(
            prior_keys.join(touched_parts, partition_col, "left_semi")
        ).distinct()
    new_dvs = _write_slices(keys, root, base_version + 1, partition_col)
    unknown = set(new_dvs) - set(base_doc["partitions"])
    if unknown:
        raise ValueError(
            f"delete keys name partitions not in version {base_version} "
            f"at {root}: {sorted(unknown)[:5]}"
        )
    touched = set(new_dvs)
    if _race_hook is not None:
        _race_hook()

    cur_version, cur_doc = base_version, base_doc
    for _ in range(max_commit_retries + 1):
        deletes = {
            p: rel
            for p, rel in cur_doc.get("deletes", {}).items()
            if p in cur_doc["partitions"]
        }
        deletes.update(new_dvs)
        try:
            _publish_manifest(
                root,
                cur_version + 1,
                cur_doc["partitions"],
                schema_json=json.dumps(cur_doc["schema"])
                if cur_doc.get("schema")
                else None,
                stats_column=cur_doc.get("stats_column"),
                stats=cur_doc.get("stats"),
                deletes=deletes,
                delete_key=key_col,
                txn=cur_doc.get("txn"),
            )
            return cur_version + 1
        except FileExistsError as race:
            cur_version, cur_doc = _rebase_or_conflict(
                root, base_doc, touched, cur_version
            )
            last_race = race
    raise last_race


def table_optimize(spark: SparkSession, root: str) -> int:
    """OPTIMIZE: commit a new version whose every partition is the
    current LOGICAL content rewritten as one compacted slice —
    bin-packing away small files (every prior commit/stream epoch left
    its own part files) and MATERIALIZING deletion vectors (the
    merge-on-read debt is paid once; subsequent reads drop the
    anti-join). Logical content is byte-identical across the optimize —
    table_changes across it emits NOTHING, because both sides resolve
    through their DVs. A partition whose rows were all DV-deleted is
    declared dropped (an empty rewrite writes no slice dir, and
    silently keeping the pointer would resurrect the deleted rows once
    its DV is discarded). Old slices and DVs become VACUUM-able
    ``expired``. At 100 TB this is the nightly compaction job: one
    shuffle keyed on the partition column, one file per partition
    target (real deployments target a size, not a count)."""
    versions = table_versions(root)
    if not versions:
        raise ValueError(f"no table at {root}")
    doc = _read_manifest_doc(root, versions[-1])
    names = sorted(doc["partitions"])
    if not names:
        raise ValueError(
            f"nothing to optimize at {root}: version {versions[-1]} has "
            "no partitions (everything was deleted/dropped)"
        )
    pcol = _partition_col_of(names)
    cur = _read_logical(spark, root, doc, names)
    # fully-deleted partitions: present in the manifest, absent from the
    # logical view — driver-side partition-value list (metadata-scale).
    # The drop list may OVER-approximate for partition values whose dir
    # name Spark escapes (str(value) != Hive-escaped name): such a name
    # lands in drops but the rewrite's own slice re-adds it, and
    # table_commit_rewrite applies drops before merging new slices —
    # so the net manifest is (base - drops) ∪ rewritten, which is
    # correct for every partition with surviving rows. Only genuinely
    # row-less partitions end up dropped.
    present_vals = cur.groupBy().agg(
        F.collect_set(F.col(pcol).cast("string")).alias("vals")
    ).first()["vals"]
    present = {f"{pcol}={v}" for v in present_vals}
    drops = [n for n in names if n not in present]
    return table_commit_rewrite(
        cur.repartition(F.col(pcol)),
        root,
        partition_col=pcol,
        drop_partitions=drops,
    )


def _slice_age_seconds(root: str, rel: str) -> float:
    """Age of a slice dir = now minus the newest mtime among the
    partition dir and its version prefix (file creation bumps the dir
    mtime, so an actively-staging commit always looks young)."""
    pdir = os.path.join(root, rel)
    vdir = os.path.dirname(pdir)
    newest = 0.0
    for p in (pdir, vdir):
        try:
            newest = max(newest, os.path.getmtime(p))
        except OSError:
            pass
    return time.time() - newest


def table_slice_states(
    root: str,
    retain_latest: int = 1,
    orphan_retain_seconds: float = ORPHAN_RETAIN_SECONDS_DEFAULT,
) -> dict[str, list[str]]:
    """Classify every slice dir under slices/: ``live`` (referenced by
    a retained manifest — the newest ``retain_latest`` versions),
    ``expired`` (referenced only by older manifests), ``orphan``
    (referenced by no manifest at all AND older than
    ``orphan_retain_seconds``: a failed/lost commit or a race loser's
    staging) or ``pending`` (unreferenced but young — indistinguishable
    from a concurrent writer's mid-commit staging, so VACUUM must not
    touch it; ADVICE r10). Values are slice-relative paths, sorted."""
    versions = table_versions(root)
    retained = set(versions[-retain_latest:]) if retain_latest > 0 else set()
    live: set[str] = set()
    referenced: set[str] = set()
    for v in versions:
        doc = _read_manifest_doc(root, v)
        # deletion-vector dirs are referenced slices too: vacuuming a
        # live DV would resurrect its deleted rows
        refs = {
            r for v in doc["partitions"].values() for r in _rels_of(v)
        } | set(doc.get("deletes", {}).values())
        referenced |= refs
        if v in retained:
            live |= refs
    on_disk: set[str] = set()
    sdir = os.path.join(root, _SLICES_DIR)
    for vname in os.listdir(sdir):
        vpath = os.path.join(sdir, vname)
        if not os.path.isdir(vpath):
            continue
        for pname in os.listdir(vpath):
            if os.path.isdir(os.path.join(vpath, pname)):
                on_disk.add(f"{_SLICES_DIR}/{vname}/{pname}")
    unreferenced = on_disk - referenced
    orphan = {
        rel
        for rel in unreferenced
        if _slice_age_seconds(root, rel) >= orphan_retain_seconds
    }
    return {
        "live": sorted(live),
        "expired": sorted((referenced - live) & on_disk),
        "orphan": sorted(orphan),
        "pending": sorted(unreferenced - orphan),
    }


def table_vacuum(
    root: str,
    retain_latest: int = 1,
    orphan_retain_seconds: float = ORPHAN_RETAIN_SECONDS_DEFAULT,
) -> dict[str, list[str]]:
    """Delete expired and (aged) orphan slice dirs and the manifests of
    dropped versions; keep the newest ``retain_latest`` versions fully
    readable and leave ``pending`` (young unreferenced) staging alone —
    a concurrent writer mid-commit is indistinguishable from a dead
    orphan until the retention window passes (ADVICE r10). Returns the
    classification that was applied."""
    states = table_slice_states(root, retain_latest, orphan_retain_seconds)
    for rel in states["expired"] + states["orphan"]:
        shutil.rmtree(os.path.join(root, rel), ignore_errors=True)
    versions = table_versions(root)
    for v in versions[:-retain_latest] if retain_latest > 0 else versions:
        os.remove(_manifest_path(root, v))
        claim = f"{_manifest_path(root, v)}.claim"
        if os.path.exists(claim):
            os.remove(claim)
    return states
