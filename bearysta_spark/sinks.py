"""Output sinks (SURVEY §2.1 K1-K4, §2.9 F1-F2).

Sinks act on *aggregated* recipe output — by construction a small frame
(one row per dims combination), so presentation renders driver-side on
the collected result; the heavy lifting already happened distributed.
The CSV sink also supports a distributed write for big outputs.
"""

from __future__ import annotations

import base64
import io
import math
import sys

from pyspark.sql import DataFrame


def to_csv(df: DataFrame, path: str | None = None, float_format: str = "%.3f") -> str | None:
    """K1: CSV sink; path None/'-' → return/print string (reference
    float_format '%.3f', aggregate.py:1022-1028). Use
    df.write.csv(path) directly for at-scale outputs instead."""
    pdf = df.toPandas()
    if path is None or path == "-":
        out = pdf.to_csv(None, float_format=float_format, index=False)
        return out
    pdf.to_csv(path, float_format=float_format, index=False)
    return None


def to_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Distributed columnar sink — the at-scale output path (the
    reference only had driver-side CSV/Excel). Partition columns become
    directory partitions that downstream recipe scans prune."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def to_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink — same distributed layout semantics as to_parquet for
    Hive-era lake interop; partition columns prune downstream scans."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def to_jsonl(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """JSON-lines sink — the interchange format most training-data
    pipelines consume; distributed write, optional directory partitions
    and codec (e.g. 'gzip', 'zstd'). Round-trips through
    engine/sources.scan_json."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> DataFrame:
    """Training-corpus writer: directory-partitioned, shard-size-bounded,
    optionally clustered, with a read-back manifest.

    - `partition_by`: hive-style directory partitions (the axis
      downstream scans prune on — source, language, date).
    - `cluster_by`: sortWithinPartitions on these columns before the
      write, so each file covers a narrow key range — parquet min/max
      stats then let engines skip whole files on point/range predicates
      (poor-man's Z-order; one extra local sort, no shuffle).
    - `max_records_per_file`: bounds shard size so a 100 TB write
      produces uniformly-sized files instead of one giant file per
      task (Spark splits task output at the bound; readers and
      shufflers get even units of work).

    Returns a manifest DataFrame (file, n_rows) aggregated from the
    written dataset via input_file_name() — computed distributed, one
    row per shard, the integrity record a training run stores next to
    the data.
    """
    w = df
    if cluster_by:
        # sort by (partition cols, cluster cols): the dynamic-partition
        # writer requires task rows ordered by partition columns and
        # inserts its own (unstable) sort if they aren't — which would
        # destroy the cluster order. Pre-satisfying the requirement
        # keeps one local sort total and the cluster order intact.
        w = w.sortWithinPartitions(*(partition_by or []), *cluster_by)
    writer = w.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.format(fmt).save(path)

    from pyspark.sql import functions as F

    spark = df.sparkSession
    back = spark.read.format(fmt).load(path)
    return (
        back.select(F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(F.count("*").cast("long").alias("n_rows"))
        .orderBy("file")
    )


def _fmt_number(x, number_format, max_val=None):
    """F1: number formatting — str → str.format template; int →
    precision digits minus order of magnitude (aggregate.py:929-961)."""
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return ""
    if number_format is None:
        return str(x)
    if isinstance(number_format, str):
        return number_format.format(x)
    ref = max_val if max_val is not None else x
    if isinstance(x, (int, float)):
        # aggregate.py:935-940 get_precision: decimals =
        # max(precision - int(log10(num)), 0); log(0) overflows int()
        # there and yields 0 decimals
        if not ref:
            return f"{x:.0f}"
        try:
            mag = int(math.log10(abs(ref)))
        except (ValueError, OverflowError):
            mag = 0
        decimals = max(number_format - mag, 0)
        return f"{x:.{decimals}f}"
    return str(x)


def pivot_string(
    pivot_df: DataFrame,
    number_format=None,
    number_format_max_only: bool = False,
    title: str = "",
) -> str:
    """K2: pretty-printed pivot table text."""
    pdf = pivot_df.toPandas()
    num_cols = pdf.select_dtypes("number").columns
    max_val = None
    if number_format_max_only and len(num_cols):
        max_val = pdf[num_cols].max().max()
    disp = pdf.copy()
    for c in num_cols:
        disp[c] = pdf[c].map(lambda v: _fmt_number(v, number_format, max_val))
    buf = io.StringIO()
    if title:
        buf.write(title + "\n")
    buf.write(disp.to_string(index=False))
    buf.write("\n")
    return buf.getvalue()


def color_bins(values, boundaries, colors):
    """F2: conditional color binning — bucket each value by sorted
    boundaries into colors; null → white (reference format_column,
    aggregate.py:732-747)."""
    if len(boundaries) != len(colors) - 1:
        raise ValueError("Number of boundaries must be one less than number of colors!")
    bounds = sorted(boundaries)
    out = []
    for v in values:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            out.append("#ffffff")
            continue
        i = sum(v > b for b in bounds)
        out.append(colors[i])
    return out


def to_html(
    tables: list[tuple[tuple, DataFrame]],
    path: str | None = None,
    title: str = "bearysta_spark report",
    indicator: list[dict] | None = None,
    plot: bool = False,
) -> str:
    """K3: HTML report — one <h3> + table per variant combination,
    optional base64-embedded bar chart per table (matplotlib gated
    behind import-try; reference aggregate.py:749-789)."""
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{title}</title>",
        "<style>table{border-collapse:collapse}td,th{border:1px solid #999;"
        "padding:4px 8px;text-align:right}th{background:#eee}</style>",
        "</head><body>",
        f"<h1>{title}</h1>",
    ]
    for variant, df in tables:
        pdf = df.toPandas()
        if variant:
            parts.append("<hr><h3>%s</h3>" % ", ".join(str(v) for v in variant))
        styled = pdf.style if indicator else None
        if styled is not None:
            for spec in indicator:
                col = spec.get("column")
                if col in pdf.columns:
                    cols = color_bins(pdf[col], spec["ranges"], spec["colors"])
                    styled = styled.apply(
                        lambda s, colors=cols: [f"background-color: {c}" for c in colors],
                        subset=[col],
                    )
            parts.append(styled.to_html())
        else:
            parts.append(pdf.to_html(index=False))
        if plot:
            img = _plot_base64(pdf)
            if img:
                parts.append(f"<img src='data:image/png;base64,{img}'/>")
    parts.append("</body></html>")
    html = "".join(parts)
    if path:
        with open(path, "w") as f:
            f.write(html)
    return html


def to_excel(
    tables: list[tuple[tuple, DataFrame]],
    path: str,
    data_df: DataFrame | None = None,
    raw_df: DataFrame | None = None,
    variant_cols: list[str] | None = None,
    indicator: list[dict] | None = None,
) -> None:
    """K4: Excel sink (pandas engine), reference workbook shape
    (aggregate.py:792-833): sheet `summary` holds, per variant
    combination, a one-row variant header followed by the pivot table
    (indicator color bins applied as cell fills); sheet `data` holds the
    aggregated frame (always); sheet `raw` holds the normalized
    pre-aggregation frame when provided. Gated on openpyxl (the COM
    variant K5 is Windows-only and intentionally unported)."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "Excel sink requires openpyxl; use to_csv/to_html instead"
        ) from e
    import pandas as pd

    with pd.ExcelWriter(path, engine="openpyxl") as xl:
        row = 0
        for variant, df in tables:
            if variant and variant_cols:
                head = pd.DataFrame(dict(zip(variant_cols, variant)), index=[0])
                head.to_excel(xl, sheet_name="summary", startrow=row, index=False)
                row += len(head) + 2
            pdf = df.toPandas()
            out = pdf
            if indicator:
                styled = pdf.style
                for spec in indicator:
                    col = spec.get("column")
                    if col in pdf.columns:
                        cols = color_bins(pdf[col], spec["ranges"], spec["colors"])
                        styled = styled.apply(
                            lambda s, colors=cols: [
                                f"background-color: {c}" for c in colors
                            ],
                            subset=[col],
                        )
                out = styled
            out.to_excel(xl, sheet_name="summary", startrow=row, index=False)
            row += len(pdf) + 4
        if data_df is not None:
            data_df.toPandas().to_excel(xl, sheet_name="data", index=False)
        if raw_df is not None:
            raw_df.toPandas().to_excel(xl, sheet_name="raw", index=False)


def _plot_base64(pdf) -> str | None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    num = pdf.select_dtypes("number")
    if num.empty:
        return None
    fig, ax = plt.subplots(figsize=(8, 3))
    num.plot.bar(ax=ax)
    buf = io.BytesIO()
    fig.savefig(buf, format="png", bbox_inches="tight")
    import matplotlib.pyplot as plt  # noqa: F811

    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode()
