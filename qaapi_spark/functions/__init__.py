from qaapi_spark.functions.dialect import (
    convert_tz,
    epoch_ms_to_ts,
    iff,
    nvl,
    regexp_substr,
    regexp_substr_occ,
    ts_to_epoch_ms,
    url_concat,
)

__all__ = [
    "convert_tz",
    "epoch_ms_to_ts",
    "iff",
    "nvl",
    "regexp_substr",
    "regexp_substr_occ",
    "ts_to_epoch_ms",
    "url_concat",
]
