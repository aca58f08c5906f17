"""Bit-exactness-critical cross-engine building blocks.

Every operator whose DuckDB oracle replays Spark arithmetic digit for
digit leans on two constructions:

* exact double literals — ``repr(float)`` round-trips and CAST is
  correctly rounded, so the same SQL text yields the same double BITS
  in Spark and DuckDB;
* md5-prefix integer hashes — Spark decodes the first N hex digits of
  ``md5(key)`` with ``conv``; DuckDB has no ``conv``, so the oracle
  side decodes the same digits positionally. Both sides MUST come from
  the one pair of builders here: a formatting or offset fix applied to
  a private copy silently breaks parity in every other operator.

Used by classifier (literal-weight scoring / training replay),
similarity (centroid folds, k-means init), sketches (KMV 60-bit
hash), and the sampling queries (md5_32 buckets).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def dlit(x: float) -> str:
    """Exact double literal: same bits as ``F.lit(float(x))`` in any
    engine with correctly-rounded decimal->binary CAST."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def spark_md5_int(col: Column, n_digits: int) -> Column:
    """First ``n_digits`` hex chars of ``md5(CAST(col AS STRING))`` as
    a non-negative long (``n_digits`` <= 15 keeps it in 60 bits)."""
    if not 1 <= n_digits <= 15:
        raise ValueError("n_digits must be in [1, 15] to fit a long")
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, n_digits), 16, 10
    ).cast("long")


def duck_md5_int_sql(col_sql: str, n_digits: int) -> str:
    """DuckDB replay of :func:`spark_md5_int` (no ``conv`` there):
    positional hex-digit decode of the same md5 prefix."""
    if not 1 <= n_digits <= 15:
        raise ValueError("n_digits must be in [1, 15] to fit a long")
    terms = [
        f"(strpos('{_HEX}', substr(md5(CAST({col_sql} AS VARCHAR)), "
        f"{i + 1}, 1)) - 1) * {16 ** (n_digits - 1 - i)}"
        for i in range(n_digits)
    ]
    return "(" + " + ".join(terms) + ")"
