"""Self-growing streaming-index layout: marker-aware probe views,
replay-safe compaction, and an exact-probe Bloom sidecar.

The self-growing indexes (streaming/curation.py, the self-neardup key
index in streaming/neardup.py) write one small hive partition per
micro-batch forever. Two scale problems follow at stream lifetimes of
weeks (r07 VERDICT findings #1/#2):

1. file listing: millions of tiny ``batch_id=N`` partitions dominate
   probe cost long before data volume does;
2. probe volume: an exact-key probe cannot partition-prune on the key,
   so every batch re-scans (and re-shuffles) the whole index.

`compact_index` solves (1): it folds every partition below a committed
batch watermark into a single negative-numbered TIER partition and
commits the fold with an atomically-replaced marker file — probes
switch views on the marker, so a crash at ANY point during compaction
leaves readers on a consistent view (the half-written new tier is
invisible until the marker lands; the folded partitions stay readable
until it does — and for one further compaction cycle after: superseded
files are reclaimed at the START of the next compaction, so a probe
that caught the old marker always finishes against present files).

`bloom_rows` / `split_by_bloom` solve (2) for the exact-key probe: each
batch appends a tall integer Bloom of its keys (kb, slot, bits rows —
mergeable with bit_or, compactable like any other partition), and the
next batches test their keys against the OR-merge of the sidecar.
Definite negatives (the common case in a mostly-novel stream) skip the
index entirely; only suspected duplicates take the exact anti-join, and
that join prunes the index to the suspects' kb partitions. False
positives cost extra verify work, never correctness — at any corpus
size the probe degrades toward the plain anti-join, and is never wrong.

Batch-id space contract: real micro-batches are ``batch_id >= 0``; a
pre-seeded corpus may use ``batch_id = -1``; compaction tiers count
down from ``-2``. An unmarked probe view reads ``batch_id >= -1`` only,
so a crashed first compaction (orphan ``-2`` files, no marker) is
invisible.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: marker file name — the leading underscore makes Spark's parquet
#: reader skip it, so it can live inside the index directory itself
MARKER = "_compaction.json"
#: layout file: correctness-load-bearing index constants (the kb
#: bucket count — Bloom rows and the anti-join's partition pruning are
#: keyed by kb, so a probe running with a DIFFERENT bucket count would
#: silently classify every duplicate as definite-new)
LAYOUT = "_layout.json"
#: first compaction tier (counts DOWN for each later compaction);
#: batch_id = -1 stays reserved for pre-seeded corpus partitions
FIRST_TIER = -2

#: Bloom sidecar geometry: bits per kb bucket and probes per key.
#: 2^24 bits/bucket keeps the tall form under 2^18 occupied slots per
#: bucket; 4 probes put the false-positive knee around ~2M keys/bucket,
#: past which the probe gracefully degrades toward the plain anti-join.
BLOOM_BITS = 1 << 24
BLOOM_HASHES = 4

logger = logging.getLogger(__name__)

#: retries for a marker/layout read that catches a non-atomic URI write
#: mid-flight (HDFS create+write+close is not a PUT): a partial file
#: fails json.loads, and the writer finishes within milliseconds — a
#: few short retries turn the race into a stall instead of a failed
#: micro-batch. A file that STAYS unparseable is corrupt and raises.
_READ_RETRIES = 5
_READ_RETRY_SEC = 0.2


def is_missing_index(e: AnalysisException) -> bool:
    """True iff `e` means "no index data yet": the root directory does
    not exist (PATH_NOT_FOUND) or exists but holds no data files —
    e.g. only a _SUCCESS marker after a zero-survivor first batch
    (UNABLE_TO_INFER_SCHEMA). Anything else (transient FS error,
    corrupt partition) is NOT missing and must fail the batch loudly."""
    s = str(e)
    return "PATH_NOT_FOUND" in s or "UNABLE_TO_INFER_SCHEMA" in s


def _is_uri(path: str) -> bool:
    return "://" in path


def ensure_layout(
    spark: SparkSession, root: str, layout: dict
) -> None:
    """Persist index layout constants on first use and REFUSE to run
    against an index built with different ones: kb is derived from a
    hash MOD the bucket count, so a stream restarted with a different
    `buckets` would probe the wrong Bloom rows and prune the anti-join
    to the wrong partitions — admitting every duplicate, silently,
    forever. Raising here turns that into a loud config error.

    Upgrade note: an index written BEFORE layout files existed has no
    _layout.json — the first post-upgrade probe adopts whatever value
    the caller passes, so operators restarting such an index must pass
    the ORIGINAL parameters (the value cannot be inferred from data;
    kb is a modulus, and observed kb values are consistent with many
    bucket counts).

    Concurrency: the first write uses create-if-absent semantics
    (O_EXCL locally, fs.create(overwrite=False) on URI roots), so two
    streams racing to initialize a fresh index cannot silently
    overwrite each other's layout — the loser re-reads the winner's
    file and either agrees or raises the mismatch error immediately,
    BEFORE any mis-bucketed row is written."""
    cur = _read_json(root, LAYOUT, spark)
    if cur is None:
        if not _is_uri(root):
            os.makedirs(root, exist_ok=True)
        if _write_json_exclusive(root, LAYOUT, layout, spark):
            return
        # lost the create race: adopt the winner's file for comparison
        cur = _read_json(root, LAYOUT, spark)
        if cur is None:  # winner's write still in flight and unreadable
            raise ValueError(
                f"index layout at {root} was created concurrently but "
                "could not be read back; retry the stream start"
            )
    if cur != layout:
        raise ValueError(
            f"index layout mismatch at {root}: persisted {cur}, "
            f"caller expects {layout} — probes keyed on a different "
            "bucket count would silently stop deduplicating; rebuild "
            "the index or restore the original parameters"
        )


def read_layout(root: str, spark: SparkSession | None = None) -> dict | None:
    """The persisted layout constants under `root`, or None."""
    return _read_json(root, LAYOUT, spark)


def read_marker(root: str, spark: SparkSession | None = None) -> dict | None:
    """The committed compaction marker under `root`, or None."""
    return _read_json(root, MARKER, spark)


def _read_json(
    root: str, name: str, spark: SparkSession | None = None
) -> dict | None:
    """Read a marker/layout file, tolerating a concurrent non-atomic
    write: on URI filesystems without atomic replace, a reader can
    catch the file empty or half-written — retried a few times before
    treating it as corrupt (see _READ_RETRIES). Missing → None."""
    p = os.path.join(root, name)
    last_err: Exception | None = None
    for attempt in range(_READ_RETRIES):
        if attempt:
            time.sleep(_READ_RETRY_SEC)
        try:
            if _is_uri(root):
                assert spark is not None, "URI-schemed roots need the session"
                jvm = spark._jvm
                jpath = jvm.org.apache.hadoop.fs.Path(p)
                fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
                if not fs.exists(jpath):
                    return None
                stream = fs.open(jpath)
                try:
                    data = jvm.org.apache.commons.io.IOUtils.toString(
                        stream, "UTF-8"
                    )
                finally:
                    stream.close()
                return json.loads(data)
            with open(p) as f:
                return json.load(f)
        except FileNotFoundError:
            return None
        except (json.JSONDecodeError, ValueError) as e:
            last_err = e
            logger.warning(
                "partial/unparseable %s under %s (attempt %d/%d): %s",
                name, root, attempt + 1, _READ_RETRIES, e,
            )
    raise ValueError(
        f"{name} under {root} stayed unparseable after "
        f"{_READ_RETRIES} attempts — corrupt marker/layout file"
    ) from last_err


def write_marker(
    root: str, tier: int, upto: int, spark: SparkSession | None = None
) -> None:
    """Atomically publish a compaction: after this returns, probe views
    read partition `tier` plus batches >= `upto` and ignore everything
    the fold superseded (whether or not its files were cleaned up)."""
    _write_json(root, MARKER, {"tier": tier, "upto": upto}, spark)


def _write_json(
    root: str, name: str, data: dict, spark: SparkSession | None = None
) -> None:
    """Atomic small-file publish: local paths via os.replace (atomic
    POSIX rename); URI roots via one FileSystem create(overwrite=True)
    PUT."""
    body = json.dumps(data)
    p = os.path.join(root, name)
    if _is_uri(root):
        assert spark is not None, "URI-schemed roots need the session"
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        out = fs.create(jpath, True)
        try:
            out.write(bytearray(body.encode()))
        finally:
            out.close()
        return
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        f.write(body)
    os.replace(tmp, p)


def _write_json_exclusive(
    root: str, name: str, data: dict, spark: SparkSession | None = None
) -> bool:
    """Create-if-absent publish for first-use files (layout): returns
    False when the file already exists (another writer won the race)
    instead of overwriting it. Local = O_EXCL open; URI =
    fs.create(overwrite=False), which raises FileAlreadyExists on HDFS
    and object stores with conditional-put support.

    On object stores WITHOUT conditional put (plain S3A),
    create(overwrite=False) is check-then-put — two racing
    initializers can both "win" and the later PUT silently clobbers
    the earlier (r09 ADVICE). So the URI branch reads the file back
    after writing and claims victory only when the surviving content
    is ITS OWN; a mismatch is reported as a lost race, which sends
    the caller down ensure_layout's re-read-and-compare path. Two
    writers racing with EQUAL content need no arbitration."""
    body = json.dumps(data)
    p = os.path.join(root, name)
    if _is_uri(root):
        assert spark is not None, "URI-schemed roots need the session"
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        try:
            out = fs.create(jpath, False)
        except Exception:
            # py4j wraps FileAlreadyExistsException generically — treat
            # the failure as a lost race ONLY when the file actually
            # exists now; anything else (permissions, quota, transient
            # FS) must surface, not masquerade as a race (r09 review)
            if fs.exists(jpath):
                return False
            raise
        try:
            out.write(bytearray(body.encode()))
        finally:
            out.close()
        # last-writer-wins arbitration: whoever's bytes SURVIVED is the
        # winner; everyone else lost the race and must re-read/compare
        try:
            return _read_json(root, name, spark) == data
        except ValueError:
            return False
    try:
        fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as f:
        f.write(body)
    return True


def read_index_view(
    spark: SparkSession,
    root: str,
    before_batch: int | None = None,
    schema=None,
) -> DataFrame | None:
    """The consistent probe view of a self-growing index: rows visible
    to a probe running at micro-batch `before_batch` (filter
    batch_id < before_batch keeps replays from matching a batch against
    its own earlier crashed write; None = no upper bound, e.g. for
    compaction input or offline audits).

    Marker-aware: with a committed compaction {tier, upto}, the view is
    (batch_id == tier) OR (upto <= batch_id < before_batch) — folded
    partitions and superseded tiers are excluded even when their files
    still exist (cleanup is best-effort). Without a marker the view is
    (-1 <= batch_id < before_batch): the -1 floor hides a half-written
    never-committed tier.

    Returns None when the index holds no data yet (first batch). Pass
    `schema` (the writer's schema) to keep an all-empty index readable;
    without it an empty directory is treated as missing.

    The marker is read BEFORE the parquet reader lists files: a
    compaction committing between the two steps then leaves this view
    on the OLD marker over a listing that still contains every old
    partition (folded files are deleted only after the commit,
    best-effort and late) — consistent. The reverse order could pair a
    fresh marker with a listing taken mid-tier-write: folded
    partitions filtered out, the new tier only partially listed —
    silently missing keys."""
    m = read_marker(root, spark)
    try:
        reader = spark.read if schema is None else spark.read.schema(schema)
        idx = reader.parquet(root)
    except AnalysisException as e:
        if not is_missing_index(e):
            raise
        return None
    if m is None:
        cond = F.col("batch_id") >= -1
    else:
        cond = (F.col("batch_id") == m["tier"]) | (
            F.col("batch_id") >= m["upto"]
        )
    if before_batch is not None:
        cond = cond & (F.col("batch_id") < before_batch)
    return idx.filter(cond)


def compact_index(
    spark: SparkSession,
    root: str,
    upto_batch: int,
    partition_cols: Sequence[str] = ("batch_id",),
    or_merge: Sequence[str] = (),
    reclaim_min_age_sec: float = 0.0,
    elect: dict | None = None,
) -> dict | None:
    """Fold every index partition with batch_id < `upto_batch`
    (including the -1 seed tier and any previous compaction tier) into
    one new tier partition, commit via the marker, then best-effort
    delete the superseded partition directories. Probe views are
    identical before and after by construction — the fold is a pure
    re-layout of the same rows (`or_merge` names long columns to
    bit_or-merge on the remaining key columns instead, for Bloom
    sidecars, where the fold SHOULD collapse per-batch rows).

    `elect` (r12 VERDICT ask #6) switches the fold to CANONICAL
    RE-ELECTION: ``{"keys": [...], "quality": col, "id": col}`` keeps,
    per distinct `keys` group, the single row with the highest
    `quality` (ties to the lowest `id`) — the keep-best rule of
    queries.dedup_canonical_by_quality, applied at compaction time so
    a streaming dedup index stops pinning the FIRST-seen copy forever
    (at 100 TB the first crawl of a page is often the worst copy).
    Election is an argmax, hence an associative-commutative fold: a
    tier already elected re-elects correctly against later batches on
    the next compaction (max over tier∪new = global max), so the
    cadence doesn't change the converged canon. Mutually exclusive
    with or_merge. NOTE: unlike the pure re-layout, an elected fold
    CHANGES the probe view on purpose — probes thereafter match
    against cluster canonicals only (the bounded-index production
    shape); callers own that semantic switch.

    Replay-safety contract: `upto_batch` must not exceed (last
    checkpoint-COMMITTED batch id + 1). Streaming replays only re-run
    batches newer than the committed watermark, so a replayed batch
    always rewrites partitions >= upto_batch, never a folded one.
    Crash-safety: the new tier is written to a batch_id no probe view
    admits until the marker commits (see write_marker).

    Reclamation is DEFERRED one compaction cycle: partitions this fold
    supersedes are left on disk and deleted at the START of the next
    compaction (along with any crashed attempt's orphan tier). A probe
    that read the old marker just before this commit can therefore
    still finish against fully-present files — the inter-compaction
    interval is the grace period; deleting eagerly here could yank
    files out from under a concurrent micro-batch on a long listing.
    Call with upto_batch = the current watermark again (a no-op fold)
    to force reclamation early — but note that collapses the grace
    period to the gap between the two calls: against a LIVE stream,
    either quiesce it first or pass `reclaim_min_age_sec` > the
    micro-batch interval, which skips deletion while the current
    marker is younger than that age (so a probe that read the previous
    marker is guaranteed to have finished before its files go).

    Returns the new marker dict, or None when there was nothing to
    compact (missing/empty index)."""
    m = read_marker(root, spark)
    # reclaim the PREVIOUS fold's garbage: everything invisible under
    # the current marker has been unreferenced since that marker's
    # commit — any probe that could still read it has long finished
    # (or, under reclaim_min_age_sec, provably finished)
    reclaim = True
    if m and reclaim_min_age_sec > 0:
        age = _marker_age_sec(root, spark)
        if age is not None and age < reclaim_min_age_sec:
            logger.info(
                "skipping reclamation under %s: marker is %.1fs old "
                "(< %.1fs grace) — superseded files stay one more cycle",
                root, age, reclaim_min_age_sec,
            )
            reclaim = False
    if reclaim:
        for b in _list_batch_ids(spark, root):
            invisible = (
                (b != m["tier"] and b < m["upto"]) if m else b < -1
            )
            if invisible:
                _delete_partition_dir(spark, root, b)
    new_tier = (m["tier"] - 1) if m else FIRST_TIER
    view = read_index_view(spark, root, before_batch=None)
    if view is None:
        return None
    fold = view.filter(F.col("batch_id") < upto_batch).drop("batch_id")
    if or_merge and elect:
        raise ValueError(
            "compact_index: or_merge and elect are mutually exclusive "
            "(bit-merge collapses per-key rows; election picks one)"
        )
    if or_merge:
        keys = [c for c in fold.columns if c not in or_merge]
        fold = fold.groupBy(*keys).agg(
            *[F.bit_or(c).alias(c) for c in or_merge]
        )
    if elect:
        missing = [
            c
            for c in [*elect["keys"], elect["quality"], elect["id"]]
            if c not in fold.columns
        ]
        if missing:
            raise ValueError(
                f"compact_index elect: columns {missing} not in index "
                f"schema {fold.columns} — refusing a fold that would "
                "elect on nothing"
            )
        w = Window.partitionBy(*elect["keys"]).orderBy(
            F.desc(elect["quality"]), F.asc(elect["id"])
        )
        fold = (
            fold.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    (
        fold.withColumn("batch_id", F.lit(new_tier))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(root)
    )
    write_marker(root, new_tier, upto_batch, spark)
    return {"tier": new_tier, "upto": upto_batch}


def _marker_age_sec(root: str, spark: SparkSession | None = None) -> float | None:
    """Seconds since the compaction marker was last committed, by file
    mtime (None if unreadable) — the reclamation grace clock.

    On URI filesystems "now" comes from the SAME filesystem's clock: a
    probe file is touched next to the marker and ITS mtime is the
    reference, so namenode/object-store clock skew against the driver
    cannot overstate the marker's age and cut the reclaim_min_age_sec
    grace short against a live stream (r09 ADVICE). Both timestamps
    are then stamped by the same clock; residual error is the touch
    round-trip, which only AGES the marker estimate conservatively
    (the probe is stamped after the marker, so marker_age >= 0 and is
    never overstated)."""
    p = os.path.join(root, MARKER)
    try:
        if _is_uri(root):
            assert spark is not None, "URI-schemed roots need the session"
            jvm = spark._jvm
            jpath = jvm.org.apache.hadoop.fs.Path(p)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            if not fs.exists(jpath):
                return None
            mtime_ms = fs.getFileStatus(jpath).getModificationTime()
            probe = jvm.org.apache.hadoop.fs.Path(
                os.path.join(root, "_now.probe")
            )
            out = fs.create(probe, True)
            out.close()
            now_ms = fs.getFileStatus(probe).getModificationTime()
            fs.delete(probe, False)  # best-effort; '_' prefix is
            # parquet-invisible even if the delete loses a race
            return max(0.0, (now_ms - mtime_ms) / 1000.0)
        return max(0.0, time.time() - os.path.getmtime(p))
    except OSError:
        return None


def _list_batch_ids(spark: SparkSession, root: str) -> list[int]:
    out = []
    if _is_uri(root):
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(root)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(jpath):
            return []
        for st in fs.listStatus(jpath):
            name = st.getPath().getName()
            if name.startswith("batch_id="):
                out.append(int(name.split("=", 1)[1]))
        return out
    if not os.path.isdir(root):
        return []
    for name in os.listdir(root):
        if name.startswith("batch_id="):
            out.append(int(name.split("=", 1)[1]))
    return out


def delete_dir(spark: SparkSession, path: str) -> None:
    """Recursively delete a directory on ANY Hadoop-visible filesystem —
    local paths via shutil, URI-schemed roots (hdfs://, s3a://, ...)
    through the FileSystem API. Missing path is a no-op. This is the
    cleanup primitive for stale-artifact guards: a local-only rmtree
    silently skips shared-storage roots, leaving stale files for the
    next directory glob to re-ingest (r08 VERDICT finding #3)."""
    if _is_uri(path):
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            fs.delete(jpath, True)
        return
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def _delete_partition_dir(spark: SparkSession, root: str, batch: int) -> None:
    delete_dir(spark, os.path.join(root, f"batch_id={batch}"))


def _bloom_probes(key_col: str):
    """The BLOOM_HASHES (slot, bits) probe structs for a key: double
    hashing p_i = (h1 + i*h2) mod BLOOM_BITS over two independent
    64-bit seeds of xxhash64, split into a 64-bit-word slot and an
    in-word bit — the tall, bit_or-mergeable Bloom form. Pure SQL
    expressions (shiftleft needs a column bit count, which only the
    SQL form accepts); `key_col` must be a plain column name."""
    structs = []
    for i in range(BLOOM_HASHES):
        # reduce each hash mod m BEFORE combining: the raw 64-bit
        # h1 + i*h2 overflows long under ANSI mode; in modular space
        # the sum stays under (BLOOM_HASHES+1) * BLOOM_BITS
        p = (
            f"pmod(pmod(xxhash64(`{key_col}`, 1), {BLOOM_BITS}L)"
            f" + {i}L * pmod(xxhash64(`{key_col}`, 2), {BLOOM_BITS}L),"
            f" {BLOOM_BITS}L)"
        )
        structs.append(
            f"struct(CAST({p} DIV 64 AS INT) AS slot,"
            f" shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))"
            f" AS bits)"
        )
    return F.expr("array(" + ", ".join(structs) + ")")


def bloom_rows(
    keys: DataFrame, key_col: str, kb_col: str = "kb"
) -> DataFrame:
    """One batch's Bloom sidecar rows: (kb, slot, bits) with bits the
    bit_or of every probe landing in that word — tall integer Bloom,
    mergeable across batches with a further bit_or."""
    return (
        keys.select(F.col(kb_col).alias("kb"), _bloom_probes(key_col)
                    .alias("__p"))
        .select("kb", F.explode("__p").alias("p"))
        .groupBy("kb", F.col("p.slot").alias("slot"))
        .agg(F.bit_or("p.bits").alias("bits"))
    )


def split_by_bloom(
    batch_keys: DataFrame,
    bloom: DataFrame,
    key_col: str,
    kb_col: str = "kb",
) -> tuple[DataFrame, DataFrame]:
    """Split a batch into (definite_new, suspects) against the
    OR-merged Bloom sidecar `bloom` (kb, slot, bits — pass the raw
    multi-batch rows; the merge happens here). A key is a suspect iff
    ALL of its probe words contain its probe bits; anything else is
    definitely absent from the index and can skip the exact probe.
    Exactness: false positives land in `suspects` and get verified by
    the caller's anti-join; false negatives cannot occur.

    NULL keys never equi-join (so they would vanish from both sides of
    the re-tag join): they are routed to `definite_new` explicitly — a
    null key cannot match any indexed key, which is exactly what
    definite-new means. Curation callers never produce one (norm_key
    is a digest), but this utility must not lose rows either way.

    Cost shape (r08 VERDICT note #4): the sidecar is NOT pre-merged —
    the probe rows join the RAW multi-batch sidecar on (kb, slot) and
    bit_or only the rows they actually touch, so per-batch merge work
    is O(matched rows) = O(batch keys × sidecar rows per slot), not
    O(whole sidecar). A compacted sidecar has ~1 row per occupied slot
    in its tier plus the post-tier batches; uncompacted it degrades
    gracefully toward the old full-merge cost, never past it."""
    nulls = batch_keys.filter(F.col(key_col).isNull())
    batch_keys = batch_keys.filter(F.col(key_col).isNotNull())
    probes = (
        batch_keys.select(
            F.col(key_col).alias("__key"), F.col(kb_col).alias("kb")
        )
        .select("__key", "kb", F.explode(_bloom_probes("__key")).alias("p"))
        .select(
            "__key", "kb", F.col("p.slot").alias("slot"),
            F.col("p.bits").alias("__need"),
        )
    )
    hit = (
        probes.join(bloom, ["kb", "slot"], "left")
        # per probe word: OR together the matched sidecar rows only
        .groupBy("__key", "kb", "slot", "__need")
        .agg(F.bit_or("bits").alias("bits"))
        .withColumn(
            "__hit",
            F.coalesce(
                (
                    F.col("bits").bitwiseAND(F.col("__need"))
                    == F.col("__need")
                ),
                F.lit(False),
            ),
        )
        .groupBy("__key")
        .agg(F.min("__hit").alias("__all_hit"))
    )
    tagged = batch_keys.join(
        hit.select(F.col("__key").alias(key_col), "__all_hit"), key_col
    )
    return (
        tagged.filter(~F.col("__all_hit")).drop("__all_hit")
        .unionByName(nulls),
        tagged.filter(F.col("__all_hit")).drop("__all_hit"),
    )


def _pending_parts(path: str) -> tuple[str, str]:
    root, base = os.path.split(path.rstrip("/"))
    return root, f"{base}.layout.pending"


def mark_pending_write(
    spark: SparkSession | None, path: str, layout: dict
) -> None:
    """Publish a SIBLING pending marker before an index overwrite-write
    (r11 ADVICE): the row write wipes `path` (including any layout
    file), so a crash between the rows landing and ensure_layout
    publishing leaves a fully-populated index with NO _layout.json —
    indistinguishable from a pre-upgrade legacy index, which loaders
    admit under ANY caller geometry. The sibling marker (it lives
    NEXT TO the index dir, so the wipe cannot eat it) makes the two
    states distinguishable: layout missing + marker present =
    interrupted write, refuse; both missing = legacy, admit."""
    root, name = _pending_parts(path)
    if not _is_uri(path) and root:
        os.makedirs(root, exist_ok=True)
    _write_json(root, name, layout, spark)


def clear_pending_write(spark: SparkSession | None, path: str) -> None:
    root, name = _pending_parts(path)
    p = os.path.join(root, name)
    if _is_uri(path):
        assert spark is not None
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            fs.delete(jpath, False)
        return
    try:
        os.unlink(p)
    except FileNotFoundError:
        pass


def check_pending_write(spark: SparkSession | None, path: str) -> None:
    """Raise if `path` carries a pending-write marker but no layout —
    a half-completed rebuild must not be probeable under stale params
    (loaders call this before admitting a layout-less index as
    legacy)."""
    root, name = _pending_parts(path)
    if _read_json(root, name, spark) is not None:
        raise ValueError(
            f"index at {path} has a pending-write marker but no layout "
            "— a rebuild crashed between the row write and the layout "
            "publish; rebuild the index (a half-written index probed "
            "under stale geometry silently returns wrong results)"
        )
