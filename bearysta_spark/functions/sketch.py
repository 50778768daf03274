"""Mergeable sketch summaries as DataFrame state — count-min sketch and
HyperLogLog.

A CMS is d×w integer cells; cell (i, hash_i(key) % w) accumulates every
occurrence of `key`. Estimates read min over the key's d cells and never
undercount. The properties that matter at 100 TB:

- **The sketch IS a keyed aggregate**: cells are (i, bucket) group keys,
  so partial sketches combine by cell-wise sum — map-side combine and
  streaming state both apply with zero extra machinery.
- **Fixed size**: d×w cells regardless of corpus/stream length — the
  bounded-state frequency summary for open-ended key spaces where exact
  per-key counters (running_user_totals) would grow without limit.
- **md5-derived bucket hashing**: replayable in any SQL engine
  (('0x'||substr(md5(..),1,15))::BIGINT arithmetic), which is what lets
  the cms_heavy_hitters driver oracle check the sketch exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(key: Column, i: Column, w: int) -> Column:
    """Row-i CMS bucket for a string key: low 60 bits of
    md5(key || ':cms' || i) mod w — identical to the DuckDB
    ('0x'||substr(md5,1,15))::BIGINT % w arithmetic."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(key, F.lit(":cms"), i.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % w
    )


def cms_cell_rows(
    df: DataFrame,
    key_col: str = "user_id",
    weight_col: str | None = None,
    d: int = 4,
    w: int = 64,
) -> DataFrame:
    """Explode each input row into its d sketch cells:
    (i, bucket, __w). Pure scan-side codegen; feed to a groupBy-sum
    (batch) or a stateful counter (streaming)."""
    key = F.col(key_col).cast("string")
    wcol = F.col(weight_col) if weight_col else F.lit(1)
    return (
        df.select(
            key.alias("__k"),
            wcol.alias("__w"),
            F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i"),
        )
        .select(
            F.col("i").cast("int").alias("i"),
            cms_bucket(F.col("__k"), F.col("i"), w).alias("bucket"),
            "__w",
        )
    )


def cms_cells(
    df: DataFrame,
    key_col: str = "user_id",
    weight_col: str | None = None,
    d: int = 4,
    w: int = 64,
) -> DataFrame:
    """The batch sketch: (i, bucket, cnt) with cnt = total weight landing
    in the cell. One map-side-combined aggregate over ≤ d×w groups."""
    return (
        cms_cell_rows(df, key_col, weight_col, d, w)
        .groupBy("i", "bucket")
        .agg(F.sum("__w").cast("long").alias("cnt"))
    )


def cms_estimate(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 64,
) -> DataFrame:
    """Point estimates for a key set: join each key's d cells, take the
    min — adds (key_col, est) to `keys`. The cells frame is ≤ d×w rows,
    always broadcast."""
    key = F.col(key_col).cast("string")
    probes = keys.select(
        key_col,
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i"),
    ).select(
        key_col,
        F.col("i").cast("int").alias("i"),
        cms_bucket(key, F.col("i"), w).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["i", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch
#
# Same design constraints as the CMS above: the sketch is a keyed
# aggregate (bucket -> max rank), so partial sketches merge by
# elementwise MAX — map-side combine, cross-day unions, and streaming
# state all compose for free. Register addressing and rank extraction
# are pure string arithmetic on md5 hex, replayable verbatim in any SQL
# engine (no hex->int conversion, no libm log/pow), which is what lets a
# DuckDB oracle check the estimate bit-for-bit.
# ---------------------------------------------------------------------------

HLL_M = 256  # 2^8 registers (hex-prefix addressed); ~1.04/sqrt(m) = 6.5% err
HLL_RANK_CAP = 40  # bounds 2^(cap-rank) inside an exact BIGINT partial sum
HLL_ALPHA_M2 = 0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M
# alpha*m^2*2^cap, precomputed: *2^40 only shifts the exponent, so the
# product is exact and both engines divide the same double numerator.
HLL_NUM = HLL_ALPHA_M2 * float(1 << HLL_RANK_CAP)

# Small-range (linear-counting) correction, Flajolet et al.: when the raw
# estimate is <= 2.5m and some registers are empty, m*ln(m/V) is far more
# accurate (raw HLL overestimates badly below ~2.5m distinct keys). ln
# would be the one libm call whose last ulp differs across engines — but
# its argument m/V takes only m distinct values, so the whole correction
# is a 256-entry lookup table computed ONCE here in Python and embedded
# as identical double literals in both the Spark plan and the SQL
# oracle. HLL_LC[V-1] = round(m * ln(m / V), 4) for V in 1..m.
import math as _math

HLL_LC = [round(HLL_M * _math.log(HLL_M / v), 4) for v in range(1, HLL_M + 1)]
HLL_SMALL_RANGE = 2.5 * HLL_M


def hll_bucket_rank(key: Column, salt: str = "u") -> tuple[Column, Column]:
    """(bucket, rank) for one key: bucket = first 2 hex chars of
    md5(salt||key) (256 registers, no int conversion — the hex prefix
    itself is the group key); rank = 1 + leading zero bits of the next
    60 bits, read off the hex string (4 per leading '0' char plus a
    4-way CASE on the first nonzero digit), capped at HLL_RANK_CAP."""
    hx = F.md5(F.concat(F.lit(salt), key.cast("string")))
    bucket = F.substring(hx, 1, 2)
    stripped = F.regexp_replace(F.substring(hx, 3, 15), "^0+", "")
    first = F.substring(stripped, 1, 1)
    clz = (
        F.when(first.isin(*"89abcdef"), 0)
        .when(first.isin("4", "5", "6", "7"), 1)
        .when(first.isin("2", "3"), 2)
        .otherwise(3)
    )
    rank = F.when(stripped == "", F.lit(HLL_RANK_CAP)).otherwise(
        F.least(
            (F.lit(15) - F.length(stripped)) * 4 + clz + 1,
            F.lit(HLL_RANK_CAP),
        )
    )
    return bucket, rank.cast("int")


def hll_registers(
    df: DataFrame, key_col: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The HLL sketch as rows: (group_cols..., bucket, m) with
    m = max rank observed in the register. ≤ HLL_M rows per group after
    one map-side-combined aggregate — THE bounded-state distinct counter
    for open-ended key spaces (exact count_distinct shuffles every
    distinct key; this shuffles ≤ 256 cells per group). Sketches over
    disjoint slices merge with groupBy(...).agg(max(m)).

    NULL keys are filtered first so the sketch counts the same
    population as count_distinct (which ignores NULLs): without the
    filter, md5(NULL) yields a NULL-bucket register row that inflates
    the observed-register count while adding nothing to the harmonic
    sum, skewing the estimate on nullable key columns."""
    bucket, rank = hll_bucket_rank(F.col(key_col))
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("m"))
    )


def hll_estimate(
    regs: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """HyperLogLog estimate per group from a register frame: raw
    alpha*m^2 / sum(2^-M_j) (empty registers contributing 2^0), with the
    standard linear-counting correction below 2.5m. The harmonic sum is
    computed as an EXACT integer — sum of 2^(cap - M_j) — so the raw
    path's only floating op is one double division, and the correction
    is the precomputed HLL_LC lookup: the estimate is independent of
    partition count and bit-identical across engines. Adds
    (empty_buckets, est_hll)."""
    # coalesce: a zero-group aggregate over an EMPTY register frame
    # yields one row with a NULL sum; 0 routes it through the V = m
    # linear-counting branch, whose LUT entry m·ln(m/m) = 0 is the
    # correct distinct count of an empty input.
    agg = regs.groupBy(*group_cols).agg(
        F.coalesce(
            F.sum(F.expr(f"shiftleft(1L, {HLL_RANK_CAP} - m)")), F.lit(0)
        )
        .cast("long")
        .alias("__s_obs"),
        F.count("*").cast("long").alias("__observed"),
    )
    empty = (F.lit(HLL_M) - F.col("__observed")).cast("long")
    s_total = F.col("__s_obs") + empty * F.lit(1 << HLL_RANK_CAP)
    raw = F.lit(HLL_NUM) / s_total.cast("double")
    lc = F.element_at(F.array(*[F.lit(x) for x in HLL_LC]), empty.cast("int"))
    est = F.when(
        (empty > 0) & (raw <= F.lit(HLL_SMALL_RANGE)), lc
    ).otherwise(F.round(raw, 4))
    return agg.select(
        *group_cols,
        empty.alias("empty_buckets"),
        est.alias("est_hll"),
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram quantile sketch
#
# The third member of the mergeable-sketch family (CMS = frequency,
# HLL = distinct, histogram = quantiles): per-group (bin, cnt) rows
# merge by cnt-sum, so map-side combine / cross-day unions / streaming
# state compose exactly like the other two. Exact quantiles sort every
# group's values; the histogram shuffles <= nbins cells per group and
# answers any quantile afterwards with rank interpolation. Bin width is
# a power of two, so value/width is an EXACT IEEE division and floor()
# is engine-portable — the whole estimate is integer arithmetic plus a
# fixed sequence of exact double ops, bit-identical across engines.
# ---------------------------------------------------------------------------


def hist_bins(
    df: DataFrame,
    value_col: str = "value",
    group_cols: tuple[str, ...] = (),
    bin_width: float = 4.0,
    nbins: int = 256,
) -> DataFrame:
    """(group_cols..., bin, cnt): the histogram sketch. Values below 0
    clamp into bin 0, values >= bin_width*nbins into the top bin (range
    misconfiguration degrades accuracy, never correctness)."""
    b = (
        F.least(
            F.greatest(F.floor(F.col(value_col) / F.lit(bin_width)), F.lit(0)),
            F.lit(nbins - 1),
        )
        .cast("int")
        .alias("bin")
    )
    return (
        df.select(*group_cols, b)
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def hist_quantiles(
    bins: DataFrame,
    qs: dict[str, float],
    group_cols: tuple[str, ...] = (),
    bin_width: float = 4.0,
) -> DataFrame:
    """Interpolated quantile estimates from a histogram sketch:
    (group_cols..., q_label, est). For each q, find the first bin whose
    cumulative count reaches q*n (unique: cum >= target AND
    cum - cnt < target) and interpolate linearly inside it:
    est = bin*w + w*(target - cum_before)/cnt. The bins frame is
    <= nbins rows per group, so the windows are over tiny partitions.

    q = 0.0 is clamped to an infinitesimal positive rank so it resolves
    to the first non-empty bin (the minimum estimate) instead of
    silently returning no row — the raw predicate cum - cnt < q*n is
    unsatisfiable at target 0. The epsilon is 1e-9 rows, which vanishes
    under the 4-decimal rounding for every q in (0, 1]."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("bin")
    wn = Window.partitionBy(*group_cols)
    c = bins.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(wn)
    )
    qcol = F.explode(
        F.array(
            *[
                F.struct(F.lit(label).alias("q_label"), F.lit(q).alias("q"))
                for label, q in qs.items()
            ]
        )
    ).alias("qq")
    x = c.select("*", qcol).select("*", "qq.q_label", "qq.q").drop("qq")
    target = F.greatest(F.col("q") * F.col("n"), F.lit(1e-9))
    hit = x.filter(
        (F.col("cum") >= target) & ((F.col("cum") - F.col("cnt")) < target)
    )
    est = (
        F.col("bin").cast("double") * F.lit(bin_width)
        + F.lit(bin_width)
        * (target - (F.col("cum") - F.col("cnt")))
        / F.col("cnt")
    )
    return hit.select(
        *group_cols, "q_label", F.round(est, 4).alias("est")
    )
