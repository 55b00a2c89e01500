"""URL and domain curation: extraction, domain statistics, blocklist
gating — the C4-style provenance filters of a pretraining pipeline.

All JVM-side regexp (codegen'd; runs over every document).  As with
``pii``, patterns are restricted to syntax with identical semantics in
Java regex (Spark) and RE2 (DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Group 1 captures the host; path is optional.
URL_PATTERN = r"https?://([A-Za-z0-9.-]+)(/[^\s]*)?"


def extracted_domains(text: Column) -> Column:
    """array<string> of every URL's host, in order of appearance."""
    return F.regexp_extract_all(text, F.lit(URL_PATTERN), 1)


def domain_histogram(
    df: DataFrame,
    text_col: str,
    blocklist: list[str] | None = None,
) -> DataFrame:
    """Corpus-level domain statistics: one row per distinct domain with
    its URL count and blocklist membership — the artifact a curation
    run reviews before choosing domain filters.

    Extraction is in-row; the only shuffle is the map-side-combinable
    count on the (small) domain key.
    """
    blocked = (
        F.col("domain").isin(*blocklist) if blocklist else F.lit(False)
    )
    return (
        df.select(F.explode(extracted_domains(F.col(text_col))).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .select("domain", "n_urls", blocked.alias("blocked"))
    )


def filter_blocked_domains(
    df: DataFrame, text_col: str, blocklist: list[str]
) -> DataFrame:
    """Documents containing NO URL from a blocklisted domain (the
    applied gate).  One in-row expression — ``exists`` over the
    extracted hosts — no join against the blocklist needed while it
    fits in plan literals (thousands of entries); beyond that, switch
    to a broadcast anti-join on the exploded domain."""
    has_blocked = F.exists(
        extracted_domains(F.col(text_col)),
        lambda d: d.isin(*blocklist),
    )
    return df.filter(~has_blocked)
