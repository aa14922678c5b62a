"""Canonical event-timestamp handling.

The fixture ``events.ts`` is parquet ``TIMESTAMP(NANOS, not-adjusted)`` —
a type Spark has no native precision for, and whose arrival type depends
on the Spark build and session configuration:

- Spark builds with native NANOS support read it as ``TIMESTAMP_NTZ``
  truncated to microseconds (observed on 4.1.2, regardless of
  ``spark.sql.legacy.parquet.nanosAsLong``).
- Builds where ``nanosAsLong`` is honored read it as epoch-**nanos**
  ``LONG``.
- A user-supplied explicit ``LongType`` schema yields epoch-**micros**
  ``LONG`` on native-NANOS builds (the reader converts to micros first,
  then reinterprets) but epoch-nanos on ``nanosAsLong`` builds.

Correctness must not depend on which of these the caller's session
produces, so every events read funnels through :func:`normalize_ts`,
which canonicalizes to a session-zone ``TIMESTAMP`` at microsecond
precision — identical values on every path, and identical to DuckDB's
ns→datetime truncation (the oracle side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

#: |epoch| at/above this is nanoseconds, below is microseconds: 1e17 µs is
#: year 5138, 1e17 ns is 1973-03 — unambiguous for any plausible event time.
_NANOS_CUTOVER = 100_000_000_000_000_000


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Canonicalize an event-time column to microsecond ``TIMESTAMP``.

    Handles every arrival type documented in the module docstring; a
    no-op when the column is already a zoned timestamp. Pure Column
    expressions — stays inside whole-stage codegen."""
    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        c = F.col(col)
        # truncate-toward-minus-infinity nanos→micros, matching DuckDB
        micros = F.when(F.abs(c) >= F.lit(_NANOS_CUTOVER),
                        F.floor(c / 1000).cast("long")).otherwise(c)
        return df.withColumn(col, F.timestamp_micros(micros))
    if isinstance(dt, TimestampNTZType):
        # NTZ wall-clock reinterpreted in the session zone (the read paths
        # pin spark.sql.session.timeZone=UTC via ensure_runtime_confs, so
        # this matches the oracle's UTC arithmetic)
        return df.withColumn(col, F.col(col).cast(TimestampType()))
    return df
