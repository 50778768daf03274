"""Recipe scan sources (SURVEY §2.1 S1-S11).

Spark-first shape of the reference's per-file reader (aggregate.py:134-314):

1. Glob expansion happens on the driver (S1) — file *lists* are metadata,
   not data; at 100 TB the list comes from the object-store listing the
   same way.
2. The line-level regex preprocessor (S3) is inherently sequential per
   file (`append` folds a line into the previous line, chains allowed),
   so it runs as an Arrow-batched mapInPandas over (one file per row)
   whole-file texts: parallel across files, sequential within a file —
   exactly the reference's semantics, scaled out. Runner logs are
   many-small-files, so per-file parallelism is the right axis; a
   single multi-GB log would need a record-boundary splitter instead
   (documented limitation).
3. CSV parsing of surviving lines is distributed (`from_csv` per line
   group), with header sniffing per file (S4: injected header used only
   when the file's first line differs from it).
4. Lineage columns Path/File/Directory (S6) and `.meta` sidecar
   constants (S7) are attached per file; sidecars are driver-loaded
   (tiny YAML) and broadcast-joined on Path.
5. SQLite (S8) reads driver-side via the stdlib sqlite3 module — a
   sqlite file is single-machine by construction; at scale this input
   becomes JDBC/parquet.
"""

from __future__ import annotations

import glob as globmod
import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bearysta_spark.engine.recipe import Recipe, RecipeError


def expand_globs(patterns: list[str]) -> list[str]:
    # absolute paths: the glob resolves against the python process cwd,
    # but a relative path handed to spark.read resolves against the
    # JVM's cwd — not necessarily the same directory
    files: list[str] = []
    for p in patterns:
        files += sorted(os.path.abspath(f) for f in globmod.glob(p))
    return files


def _line_filter_fn(filters: dict[str, str | None]):
    """Per-file sequential line filter reproducing aggregate.py:195-243:
    patterns tried in order per line; null repl keeps the line, 'drop'
    drops it, 'append' glues it onto the previous line and keeps
    scanning the remaining patterns against the combined line; a line
    matched by nothing is dropped; blank lines implicitly dropped."""
    compiled = [(re.compile(k), v) for k, v in filters.items()]
    compiled.append((re.compile(r"^[\s]*$"), "drop"))

    def filter_lines(text: str) -> list[str]:
        out: list[str] = []
        prev_line = ""
        for line in text.splitlines():
            drop_line = True
            for reg, rep in compiled:
                if reg.search(line):
                    drop_line = False
                    if rep:
                        if rep == "drop":
                            drop_line = True
                            break
                        if rep == "append":
                            drop_line = True
                            line = prev_line.rstrip() + " " + line.lstrip()
                        else:
                            line = reg.sub(rep, line)
                            drop_line = False
            if not drop_line:
                out.append(line)
            prev_line = line
        return out

    return filter_lines


def filtered_lines_df(
    spark: SparkSession, files: list[str], filters: dict[str, str | None] | None
) -> DataFrame:
    """DataFrame of (path, line_no, line) after the line filter.

    Reads whole files (spark.read.text wholetext) so the sequential
    `append` semantics hold; the filter runs in executors via
    mapInPandas (Arrow batches of files)."""
    text = (
        spark.read.text(files, wholetext=True)
        .withColumn("path", F.input_file_name())
        .select("path", "value")
    )
    fn = _line_filter_fn(filters or {})

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, value in zip(pdf["path"], pdf["value"]):
                for i, line in enumerate(fn(value) if filters else value.splitlines()):
                    rows.append((path, i, line))
            yield pd.DataFrame(rows, columns=["path", "line_no", "line"])

    return text.mapInPandas(proc, schema="path string, line_no long, line string")


def _norm_path(p: str) -> str:
    # input_file_name returns file:/// URIs
    return re.sub(r"^file:/*", "/", p)


def scan_csv(
    spark: SparkSession,
    files: list[str],
    csv_header: str | None = None,
    line_filter: dict[str, str | None] | None = None,
) -> DataFrame:
    """Distributed CSV scan with line preprocessing, header sniff,
    lineage columns and sidecar metadata. All columns load as strings;
    numeric promotion is the engine's inference pass (P2)."""
    lines = filtered_lines_df(spark, files, line_filter)
    if line_filter:
        lines = lines.cache()

    # header decision per file: first surviving line
    firsts = {
        _norm_path(r["path"]): r["line"]
        for r in lines.filter(F.col("line_no") == 0).collect()
    }

    def header_of(first_line: str | None) -> tuple[list[str], bool]:
        """→ (column names, file_has_header_row)"""
        if first_line is None:
            return [], False
        if csv_header is not None:
            injected = [c.strip() for c in csv_header.split(",")]
            has = first_line.rstrip("\n").replace(" ", "") == csv_header.replace(" ", "")
            return (injected, has)
        return [c.strip() for c in first_line.split(",")], True

    # group files by their effective column list
    groups: dict[tuple, dict] = {}
    for path in files:
        cols, has_hdr = header_of(firsts.get(os.path.abspath(path), firsts.get(path)))
        if not cols:
            continue  # empty / fully-filtered file (S5) — tolerated with no rows
        key = tuple(cols)
        g = groups.setdefault(key, {"has_header": {}, "paths": []})
        g["paths"].append(path)
        g["has_header"][path] = has_hdr

    parsed: list[DataFrame] = []
    for cols, g in groups.items():
        schema = ", ".join(f"`{c}` string" for c in cols)
        sub = lines.filter(
            F.regexp_replace("path", "^file:/*", "/").isin(
                [os.path.abspath(p) for p in g["paths"]]
            )
        )
        hdr_paths = [os.path.abspath(p) for p, h in g["has_header"].items() if h]
        if hdr_paths:
            sub = sub.filter(
                ~(
                    (F.col("line_no") == 0)
                    & F.regexp_replace("path", "^file:/*", "/").isin(hdr_paths)
                )
            )
        df = sub.select(
            F.regexp_replace("path", "^file:/*", "/").alias("Path"),
            F.from_csv(
                "line", schema, {"ignoreLeadingWhiteSpace": "true", "mode": "PERMISSIVE"}
            ).alias("r"),
        ).select("Path", "r.*")
        parsed.append(df)

    if not parsed:
        return spark.createDataFrame([], schema="Path string")

    out = parsed[0]
    for df in parsed[1:]:
        out = out.unionByName(df, allowMissingColumns=True)

    out = out.withColumn("File", F.element_at(F.split("Path", "/"), -1)).withColumn(
        "Directory",
        F.when(
            F.length(F.expr("substring(Path, 1, length(Path) - length(File) - 1)")) > 0,
            F.expr("substring(Path, 1, length(Path) - length(File) - 1)"),
        ).otherwise("."),
    )
    return attach_sidecar_meta(spark, out, files)


def attach_sidecar_meta(
    spark: SparkSession, df: DataFrame, files: list[str]
) -> DataFrame:
    """S7: per-file `.meta` YAML sidecars become constant columns via a
    broadcast join on Path (reference assigns them per file,
    aggregate.py:263-270)."""
    import yaml as _yaml

    metas: dict[str, dict] = {}
    keys: list[str] = []
    for f in files:
        mf = f + ".meta"
        if os.path.isfile(mf):
            try:
                with open(mf) as fd:
                    m = _yaml.safe_load(fd) or {}
            except Exception:
                continue
            metas[os.path.abspath(f)] = m
            for k in m:
                if k not in keys:
                    keys.append(k)
    if not metas:
        return df
    rows = [
        tuple([p] + [None if k not in m else str(m[k]) for k in keys])
        for p, m in metas.items()
    ]
    meta_df = spark.createDataFrame(rows, schema=["Path"] + keys)
    # reference `df.assign(**meta)` OVERWRITES same-named data columns —
    # drop the data-side column so the sidecar value wins
    overlap = [k for k in keys if k in df.columns]
    return df.drop(*overlap).join(F.broadcast(meta_df), "Path", "left")


def scan_sqlite(spark: SparkSession, files: list[str], table: str | None) -> DataFrame:
    """S8: sqlite scan. Driver-side read (a .db file is single-machine
    data by construction; cite aggregate.py:295-314), then parallelize."""
    if not table:
        raise RecipeError("input.table-name required for sql format")
    # recipe YAML is data, not code: never interpolate an arbitrary
    # string into SQL (the reference shares this flaw; harden here)
    if not re.fullmatch(r"[A-Za-z0-9_]+", table):
        raise RecipeError(f"invalid sqlite table name {table!r}")
    import sqlite3

    frames = []
    for fn in files:
        db = sqlite3.connect(fn)
        try:
            pdf = pd.read_sql_query(f"SELECT * FROM {table}", db)  # noqa: S608
        finally:
            db.close()
        pdf["Path"] = fn
        pdf["File"] = os.path.basename(fn)
        pdf["Directory"] = os.path.dirname(fn) or "."
        frames.append(pdf)
    out = pd.concat(frames, ignore_index=True)
    return spark.createDataFrame(out)


def _with_lineage(df: DataFrame) -> DataFrame:
    """Attach Path/File/Directory (S6) from the `_metadata.file_path`
    hidden column. CRITICAL scale detail: `input_file_name()` is
    non-deterministic, and Catalyst refuses to push predicates past a
    Project containing a non-deterministic expression — lineage via
    input_file_name silently disabled filter pushdown for every
    downstream recipe filter. `_metadata` is a real scan attribute
    (deterministic), so PushedFilters still reach the file source
    (asserted in tests/test_plans.py)."""
    return (
        df.withColumn(
            "Path", F.regexp_replace(F.col("_metadata.file_path"), "^file:/*", "/")
        )
        .withColumn("File", F.element_at(F.split("Path", "/"), -1))
        .withColumn(
            "Directory",
            F.expr("substring(Path, 1, length(Path) - length(File) - 1)"),
        )
    )


def scan_parquet(spark: SparkSession, files: list[str]) -> DataFrame:
    """Engine extension: parquet input for recipes (the 100 TB path —
    columnar scan with pushdown; lineage via _metadata.file_path)."""
    return _with_lineage(spark.read.parquet(*files))


def scan_orc(spark: SparkSession, files: list[str]) -> DataFrame:
    """Engine extension: ORC input — the other columnar format with
    native JVM readers (predicate pushdown + column pruning like
    parquet; common in Hive-era lakes). Same lineage columns."""
    return _with_lineage(spark.read.orc(*files))


def scan_json(spark: SparkSession, files: list[str]) -> DataFrame:
    """Engine extension: JSON-lines input (runner logs increasingly land
    as JSONL; schema inferred on first read — supply parquet for the
    100 TB path where inference cost matters)."""
    return _with_lineage(spark.read.json(files))


def scan(spark: SparkSession, recipe: Recipe, inputs: list[str] | None = None) -> DataFrame | None:
    """S1/S2: resolve recipe input globs (or CLI overrides) and read.
    Returns None when the recipe has no path input (children-only)."""
    patterns = inputs if inputs is not None else recipe.input_paths
    if not patterns:
        return None
    files = expand_globs(patterns)
    if not files:
        raise RecipeError(f"No matching files found for {patterns}")
    fmt = recipe.input_format
    if fmt == "csv":
        return scan_csv(spark, files, recipe.csv_header, recipe.line_filter)
    if fmt == "sql":
        return scan_sqlite(spark, files, recipe.table_name)
    if fmt == "parquet":
        return scan_parquet(spark, files)
    if fmt == "json":
        return scan_json(spark, files)
    if fmt == "orc":
        return scan_orc(spark, files)
    raise RecipeError(f"Unsupported input format {fmt!r}")
