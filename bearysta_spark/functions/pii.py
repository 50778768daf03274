"""PII detection and redaction for training-data scrubbing.

Regex-based detectors for the classic identifier classes (email, IPv4,
phone, SSN, credit-card-shaped digit runs) as pure JVM expressions —
`regexp_count` / `regexp_replace` run inside whole-stage codegen, so a
scrub pass is a single scan with zero Python in the row path and no
shuffle at all (detection and redaction are both row-local).

Patterns are written in the Java-regex subset that also parses under
RE2 (no backrefs, no lookbehind), so the same literals can back a DuckDB
oracle when the corpus actually contains PII. The bundled synthetic
corpus contains none (lowercase word salad — verified in tests), so the
end-to-end behavior is locked by fixture tests in
tests/test_text_functions.py instead of a driver query whose every count
would be zero.

At 100 TB this is the cheapest pass in the pipeline: per-row regexes over
bytes already in memory, typically fused by Catalyst into the same stage
as quality filtering. Order redaction BEFORE tokenization/shingling so
downstream dedup keys never carry raw identifiers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Detection patterns. Deliberately high-recall / moderate-precision — a
# scrub pass prefers false positives (redact too much) over leaks. Keys
# are stable API: pii_counts emits one column per key.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — permissive local part, 2+ letter TLD
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # dotted quad; word-bounded so version strings like 1.2.3.4.5 still
    # match conservatively on their first 4 octets
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    # international-ish phone: optional +CC, separators, 8-15 digits
    "phone": r"\+?\d[\d\s().-]{6,13}\d",
    # US SSN shape
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # 13-16 digit runs with optional space/dash grouping (card-shaped)
    "credit_card": r"\b\d(?:[ -]?\d){12,15}\b",
}

# Redaction order matters: longer/more-specific shapes first so e.g. an
# SSN inside a longer digit run is consumed by the digit-run pattern
# rather than leaving fragments behind.
_REDACT_ORDER = ("email", "ipv4", "ssn", "credit_card", "phone")


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_count(text: str | Column, kind: str) -> Column:
    """Number of matches of one PII class in `text` (JVM regexp_count)."""
    return F.regexp_count(_col(text), F.lit(PII_PATTERNS[kind]))


def pii_counts(text: str | Column) -> list[Column]:
    """One `<kind>_n` count column per PII class, plus a `pii_total`."""
    cols = [pii_count(text, k).alias(f"{k}_n") for k in PII_PATTERNS]
    total = None
    for k in PII_PATTERNS:
        c = pii_count(text, k)
        total = c if total is None else total + c
    cols.append(total.alias("pii_total"))
    return cols


def redact_pii(
    text: str | Column,
    replacement: str = "[PII]",
    kinds: tuple[str, ...] = _REDACT_ORDER,
) -> Column:
    """Replace every PII match with `replacement` — a chained
    regexp_replace, one fused projection, no intermediate
    materialization. Idempotent for any replacement token that none of
    the patterns match (the default's brackets/letters can't)."""
    out = _col(text)
    for k in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[k], replacement)
    return out


def pii_stats(
    df: DataFrame, text_col: str = "text", group_cols: tuple[str, ...] = ("source",)
) -> DataFrame:
    """Per-group scrub report: doc counts, docs containing any PII, and
    per-class match totals. Single scan + one small aggregate."""
    per = df.select(
        *group_cols,
        *pii_counts(text_col),
    )
    aggs = [
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("pii_total") > 0).cast("int")).cast("long").alias("n_docs_with_pii"),
    ]
    aggs += [
        F.sum(f"{k}_n").cast("long").alias(f"{k}_total") for k in PII_PATTERNS
    ]
    return per.groupBy(*group_cols).agg(*aggs)
