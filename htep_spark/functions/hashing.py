"""Cross-engine 60-bit md5 prefix hash — THE shared deterministic hash.

Spark has xxhash64 but DuckDB cannot reproduce it; both engines agree on
md5, and the first 15 hex digits (60 bits) fit a signed BIGINT exactly:

- Spark:  ``conv(substring(md5(x), 1, 15), 16, 10)`` cast to long
- DuckDB: ``CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)``

Single source for every oracle-paired operator that needs a shared hash
(MinHash shingles, beam candidate confidences, stratified sampling).
Production-only paths may still use xxhash64 behind a ``base_hash``
flag (see ``operators/dedup.py``) with a pytest identity bridge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["md5_prefix60_spark", "md5_prefix60_sql"]


def md5_prefix60_spark(col) -> Column:
    """60-bit unsigned value of the md5 prefix as a BIGINT column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_prefix60_sql(expr: str) -> str:
    """The DuckDB expression computing the identical 60-bit value."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"
