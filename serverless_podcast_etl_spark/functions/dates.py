"""Date/time scalar functions (SURVEY.md §2.8 F4-F6).

The reference parses RFC-2822 pubDates permissively (None on failure,
src/lambda_2.py:108-114) and derives a time dimension (date, year,
English month name, month number, day — src/lambda_2.py:93-106,
194-200).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RFC2822_FORMAT = "dd MMM yyyy HH:mm:ss Z"


def parse_rfc2822(col: Column) -> Column:
    """Parse 'Mon, 15 May 2023 10:30:00 +0000' → timestamp; null on
    failure (the reference's permissive behavior, src/lambda_2.py:112-114).

    Spark ≥3 refuses day-of-week fields in parse patterns, so the
    optional 'EEE, ' prefix is stripped first; ``try_to_timestamp``
    keeps parsing JVM-side and never throws.
    """
    stripped = F.regexp_replace(col, r"^[A-Za-z]{3},\s*", "")
    return F.try_to_timestamp(stripped, F.lit(RFC2822_FORMAT))


def time_dimension(df: DataFrame, date_col: str) -> DataFrame:
    """Distinct time-dimension rows derived from a date/timestamp column.

    Matches the warehouse DDL (src/lambda_2.py:24-32): date PK, year,
    full English month name, month_number, day.  ``date_format('MMMM')``
    replaces the reference's 14-line month-name dict
    (src/lambda_2.py:93-106).
    """
    d = F.to_date(F.col(date_col))
    return (
        df.select(
            d.alias("date"),
            F.year(d).alias("year"),
            F.date_format(d, "MMMM").alias("month"),
            F.month(d).alias("month_number"),
            F.dayofmonth(d).alias("day"),
        )
        .filter(F.col("date").isNotNull())
        .distinct()
    )
