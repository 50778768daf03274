"""Custom stateful streaming operators via applyInPandasWithState.

Where built-in windowed aggregation can't express the semantics —
running lifetime counters, cross-batch exact dedup — the state-store
API holds per-key state across micro-batches. State size is the scale
constraint: keep per-key state O(1) (counters, sketches), never O(rows)
(the exact-dedup variant bounds its seen-set per key and is marked
accordingly).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_running(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Lifetime per-user counters, one updated row per user per
    micro-batch. O(1) state per key — the shape that scales to any
    stream length."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EXPIRING_OUT_SCHEMA = "user_id long, n_events long, total_value double"
EXPIRING_STATE_SCHEMA = "n long, total double, last_ms long"


def expiring_user_sessions(events: DataFrame, gap_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Per-user session totals with event-time state TTL: state expires
    `gap_ms` after the user's last event (watermark-driven), emitting
    one finalized row per session and REMOVING the key's state — the
    property NoTimeout operators lack at 100 TB, where an open-ended
    user space would otherwise grow the state store forever. Append
    mode: rows are emitted only on expiry, so every emission is final.
    Input must carry a watermark on `ts` (the timeout fires when the
    watermark passes last_event + gap)."""

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            n, total, _last = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )
            return
        n, total, last_ms = state.get if state.exists else (0, 0.0, 0)
        # intra-batch gap splitting: a backlogged source delivers many
        # sessions' worth of a key in ONE micro-batch, where timeouts
        # alone would merge them all. Walk the batch in event-time order
        # and close a session whenever the gap exceeds gap_ms — the
        # stream then converges to exactly the batch assign_sessions
        # partitioning (asserted by the session-split parity test), not
        # just matching lifetime totals.
        parts = [p for p in pdfs if len(p)]
        out: list[tuple] = []
        if parts:
            batch = pd.concat(parts).sort_values("ts")
            for ts_val, val in zip(batch["ts"], batch["value"]):
                ts_ms = int(ts_val.value // 1_000_000)  # Timestamp.value is ns
                if n and ts_ms - last_ms > gap_ms:
                    out.append((key[0], n, total))
                    n, total = 0, 0.0
                n += 1
                total += float(val)
                last_ms = max(last_ms, ts_ms)
        if n or last_ms:
            state.update((n, total, last_ms))
            state.setTimeoutTimestamp(last_ms + gap_ms)
        yield pd.DataFrame(out, columns=["user_id", "n_events", "total_value"])

    return events.withWatermark("ts", "1 minute").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EXPIRING_OUT_SCHEMA,
        stateStructType=EXPIRING_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def assign_sessions(events: DataFrame, gap_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Batch-equivalent session assignment for expiring_user_sessions:
    adds a per-user `session_id` (0-based, in event-time order) where a
    gap > gap_ms between consecutive events starts a new session. The
    streaming operator converges to exactly this partitioning once the
    watermark passes every key (the stream-vs-batch parity test asserts
    it); the batch shape is one window shuffle on user_id.

    Session boundaries depend only on the ordering of distinct `ts`
    values (equal timestamps have gap 0 and always share a session), so
    orderBy("ts") is deterministic for the downstream per-session
    aggregates even when events tie."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    new_session = F.when(gap.isNull() | (gap > gap_ms * 1000), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        - 1,
    )


DEDUP_SCHEMA = "user_id long, event_id long, value double"
DEDUP_STATE_SCHEMA = "seen array<long>"


def _update_dedup(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (seen,) = state.get if state.exists else ([],)
    seen_set = set(seen)
    out = []
    for pdf in pdfs:
        for eid, val in zip(pdf["event_id"], pdf["value"]):
            if int(eid) not in seen_set:
                seen_set.add(int(eid))
                out.append((key[0], int(eid), float(val)))
    state.update((sorted(seen_set),))
    yield pd.DataFrame(out, columns=["user_id", "event_id", "value"])


def stream_dedup(events: DataFrame) -> DataFrame:
    """Cross-batch exact dedup by (user_id, event_id): emits each event
    id at most once across the whole stream.

    State is O(ids per key) — fine for bounded id spaces / keyed
    sessions; at open-ended 100 TB scale use stream_dedup_bloom (fixed
    state per key) or watermarked dropDuplicates instead.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_dedup,
        outputStructType=DEDUP_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BLOOM_DEDUP_NBITS = 1 << 13  # 8192 bits = 128 longs per key
BLOOM_DEDUP_HASHES = 4


def _bloom_positions(eid: int, nbits: int, k: int) -> list[int]:
    # Kirsch-Mitzenmacher double hashing over two splits of one md5 —
    # same construction as functions.decontam.build_gram_bloom, in
    # Python because it runs inside the state-update kernel
    import hashlib

    d = hashlib.md5(str(eid).encode()).hexdigest()
    h1 = int(d[:15], 16) % nbits
    h2 = int(d[15:30], 16) % nbits
    return [(h1 + i * h2) % nbits for i in range(k)]


def _update_dedup_bloom(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    nwords = BLOOM_DEDUP_NBITS // 64
    (words,) = state.get if state.exists else ([0] * nwords,)
    words = list(words)
    out = []
    for pdf in pdfs:
        for eid, val in zip(pdf["event_id"], pdf["value"]):
            pos = _bloom_positions(int(eid), BLOOM_DEDUP_NBITS, BLOOM_DEDUP_HASHES)
            hit = all((words[p >> 6] >> (p & 63)) & 1 for p in pos)
            if not hit:
                for p in pos:
                    words[p >> 6] |= 1 << (p & 63)
                # keep state in signed-long range for the array<long> schema
                for i in (p >> 6 for p in pos):
                    if words[i] >= 1 << 63:
                        words[i] -= 1 << 64
                out.append((key[0], int(eid), float(val)))
    state.update((words,))
    yield pd.DataFrame(out, columns=["user_id", "event_id", "value"])


def stream_dedup_bloom(events: DataFrame) -> DataFrame:
    """Cross-batch dedup with FIXED per-key state: the seen-set is a
    per-user Bloom filter (8192 bits = 1 KiB as 128 longs), so state
    size is constant regardless of how many event ids a key ever emits
    — the open-ended-id-space form stream_dedup's docstring promises.

    Semantics: AT-MOST-ONCE. A Bloom filter has no false negatives, so
    nothing is ever emitted twice (the exactly-once half that matters
    for downstream idempotence); false positives drop a genuinely-new
    event with probability ~(1 - e^(-kn/m))^k — at the shipped geometry
    (m=8192, k=4) that is ~2.2% per event after 1,000 distinct ids per
    key, and ~0.24% after 500; the drop rate is THE operational
    parameter of this operator, so size m from the curve, not from the
    state budget. Size
    BLOOM_DEDUP_NBITS to the expected per-key cardinality; keys are
    users, so the budget is per-user, not global. Bit-setting uses the
    same md5 double-hashing as the batch Bloom decontamination
    (functions.decontam), making stream and batch filters mergeable by
    OR if a pipeline checkpoints them side by side."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_dedup_bloom,
        outputStructType=DEDUP_SCHEMA,
        stateStructType="words array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CMS_OUT_SCHEMA = "i int, bucket long, cnt long"
CMS_STATE_SCHEMA = "cnt long"


def _update_cms(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    cnt = state.get[0] if state.exists else 0
    for pdf in pdfs:
        cnt += int(pdf["__w"].sum())
    state.update((cnt,))
    yield pd.DataFrame({"i": [key[0]], "bucket": [key[1]], "cnt": [cnt]})


def streaming_cms_cells(
    events: DataFrame, key_col: str = "user_id", d: int = 4, w: int = 64
) -> DataFrame:
    """Streaming count-min sketch: each micro-batch row lands in its d
    (i, bucket) cells (functions.sketch.cms_cell_rows, scan-side
    codegen) and each CELL is a stateful counter — the sketch lives as
    ≤ d×w keyed states, so total state is fixed no matter how long the
    stream runs or how many distinct keys it carries. This is the
    bounded-state alternative to running_user_totals when the key space
    is open-ended; estimates never undercount and overcount ≤ the CMS
    ε·N bound. Emits the updated cells per batch; the live sketch is the
    latest row per (i, bucket), and batch/streaming sketches built from
    the same rows are identical cell-for-cell (tested)."""
    from bearysta_spark.functions.sketch import cms_cell_rows

    return (
        cms_cell_rows(events, key_col, d=d, w=w)
        .groupBy("i", "bucket")
        .applyInPandasWithState(
            _update_cms,
            outputStructType=CMS_OUT_SCHEMA,
            stateStructType=CMS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HLL_OUT_SCHEMA = "bucket string, m int"
HLL_STATE_SCHEMA = "m int"


def _update_hll(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    m = state.get[0] if state.exists else 0
    for pdf in pdfs:
        if len(pdf):
            m = max(m, int(pdf["rank"].max()))
    state.update((m,))
    yield pd.DataFrame({"bucket": [key[0]], "m": [m]})


def streaming_hll_registers(
    events: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """Streaming HyperLogLog: the distinct-count sketch as ≤ 256 keyed
    register states. Each row maps scan-side to its (bucket, rank)
    (functions.sketch.hll_bucket_rank, pure codegen) and each REGISTER
    is a stateful max — registers only ratchet upward, so the update
    log's latest row per bucket IS the live sketch, and the stream
    sketch equals the batch sketch over the union of all micro-batches
    register-for-register (tested). Bounded state regardless of stream
    length or key cardinality — the streaming complement to exact
    dropDuplicates distinct counting, and register frames from stream
    checkpoints merge with historical batch sketches by max(m).
    Feed the output to functions.sketch.hll_estimate."""
    from pyspark.sql import functions as F

    from bearysta_spark.functions.sketch import hll_bucket_rank

    bucket, rank = hll_bucket_rank(F.col(key_col))
    # NULL keys excluded to count the same population as count_distinct
    # (matches the batch hll_registers filter)
    rows = events.filter(F.col(key_col).isNotNull()).select(
        bucket.alias("bucket"), rank.alias("rank")
    )
    return rows.groupBy("bucket").applyInPandasWithState(
        _update_hll,
        outputStructType=HLL_OUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HIST_OUT_SCHEMA = "bin int, cnt long"
HIST_STATE_SCHEMA = "cnt long"


def _update_hist(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    cnt = state.get[0] if state.exists else 0
    for pdf in pdfs:
        cnt += int(len(pdf))
    state.update((cnt,))
    yield pd.DataFrame({"bin": [key[0]], "cnt": [cnt]})


def streaming_hist_bins(
    events: DataFrame,
    value_col: str = "value",
    bin_width: float = 4.0,
    nbins: int = 256,
) -> DataFrame:
    """Streaming histogram sketch: each row maps scan-side to its bin
    (same clamp-floor arithmetic as functions.sketch.hist_bins) and each
    BIN is a stateful counter — ≤ nbins keyed states total, so quantile
    tracking over an unbounded stream costs fixed state, with the live
    sketch being the latest row per bin. Completes the stream/batch
    symmetry of the sketch family (CMS cells = sum, HLL registers = max,
    histogram bins = sum); stream == batch bin-for-bin over the union of
    micro-batches (tested). Feed functions.sketch.hist_quantiles for
    estimates."""
    from pyspark.sql import functions as F

    b = (
        F.least(
            F.greatest(F.floor(F.col(value_col) / F.lit(bin_width)), F.lit(0)),
            F.lit(nbins - 1),
        )
        .cast("int")
        .alias("bin")
    )
    return events.select(b).groupBy("bin").applyInPandasWithState(
        _update_hist,
        outputStructType=HIST_OUT_SCHEMA,
        stateStructType=HIST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
