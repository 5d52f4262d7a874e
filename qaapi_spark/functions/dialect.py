"""Snowflake-dialect scalar layer (reference SURVEY.md §2.8, F1-F12).

Each wrapper maps one scalar construct the reference SQL uses onto the
equivalent built-in Catalyst expression — everything stays JVM-side in
whole-stage codegen; no Python UDFs anywhere in this module.

Reference sites (4ndertron/QAAPI, read-only snapshot):
  - F2  DATEADD(ms, <epoch_ms>, '1970-01-01')      Update...sql:42,68,109,195-196
  - F3  CONVERT_TIMEZONE('UTC','America/Denver')   Update...sql:41,67,108,195
  - F5  REGEXP_SUBSTR(s, '\\d+$')                  Update...sql:103
  - F6  REGEXP_SUBSTR(s, '\\d+')                   Update...sql:152,197-198
  - F7  REGEXP_SUBSTR(s, '\\d+', 1, n)             Update...sql:187-189
  - F9  IFF(cond, a, b)                            Update...sql:106,202
  - F10 NVL(a, b)                                  Update...sql:195,197
  - F11 '||' string concatenation (URL build)      Update...sql:43-44,69-70
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms_to_ts(col: Column | str) -> Column:
    """F2: epoch milliseconds -> timestamp (UTC instant)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c.cast("long"))


def ts_to_epoch_ms(col: Column | str) -> Column:
    """Inverse of F2, used to round-trip in oracle checks."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c)


def convert_tz(col: Column | str, tz: str = "America/Denver") -> Column:
    """F3: CONVERT_TIMEZONE('UTC', tz, ts) — UTC instant to wall time in tz.

    The reference deliberately ignores the API's own timezone fields
    (comments at Update...sql:107,193-194); we preserve that by always
    treating the stored instant as UTC.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.from_utc_timestamp(c, tz)


def regexp_substr(col: Column | str, pattern: str) -> Column:
    """F5/F6: REGEXP_SUBSTR — first match of pattern, NULL if none.

    Snowflake returns NULL for no-match; Spark's regexp_extract returns
    '' — normalize with nullif.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.regexp_extract(c, f"({pattern})", 1), F.lit(""))


def regexp_substr_occ(col: Column | str, pattern: str, occurrence: int) -> Column:
    """F7: REGEXP_SUBSTR(s, pat, 1, n) — n-th occurrence (1-based)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.regexp_extract_all(c, F.lit(f"({pattern})"), F.lit(1))
    # element_at is 1-based and yields NULL when the index is out of range
    # only with try_element_at; guard with size check for strictness.
    return F.when(F.size(arr) >= occurrence, F.element_at(arr, occurrence))


def iff(cond: Column, a: Column, b: Column) -> Column:
    """F9: IFF(cond, a, b)."""
    return F.when(cond, a).otherwise(b)


def nvl(a: Column, b: Column) -> Column:
    """F10: NVL(a, b)."""
    return F.coalesce(a, b)


def url_concat(*parts: Column | str) -> Column:
    """F11/P2: '||' URL templating with implicit number->string casts."""
    cols = [
        F.lit(p) if isinstance(p, str) else p.cast("string") for p in parts
    ]
    return F.concat(*cols)
