"""Cross-engine RESULT-DTYPE audit — the round-4 hash-fail root cause.

All 8 driver hash-failing rows (CORRECTNESS_r03/r04) share one property
the value-level local gate could never see: their DuckDB oracle emits a
column whose *physical type* differs from the Spark result's — above all
integer ``sum()``, which DuckDB widens to HUGEINT (int128).  A harness
that materializes the oracle through pandas/Arrow turns HUGEINT into
float64 ("12345.0"), while Spark's bigint stays "12345" — the value hash
diverges even though every value is numerically identical.  rows_match /
schema_match (names) stay true, hash_match false: exactly the observed
signature, including the all-integer ``profile_docs`` row that the
round-at-half theory could not explain.

This tool runs every ``oracle_sql()`` entry on DuckDB and its
``queries()`` twin on Spark at sf0.001 and compares the per-column
physical types through Arrow (the strictest lens a harness could use).
Exit 1 on any mismatch.  Usage: python tools/audit_types.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Spark simpleString -> canonical; DuckDB arrow type str -> canonical.
_SPARK = {"bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
          "double": "f64", "float": "f32", "string": "str",
          "boolean": "bool", "date": "date"}


def spark_canon(dt: str) -> str:
    if dt.startswith("timestamp"):
        return "ts"
    if dt.startswith("decimal"):
        return "dec"
    if dt.startswith(("array", "struct", "map")):
        return "nested"
    return _SPARK.get(dt, dt)


def duck_canon(arrow_type) -> str:
    s = str(arrow_type)
    if s in ("int64", "uint32"):
        return "i64"
    if s in ("int32", "uint16"):
        return "i32"
    if s == "int16":
        return "i16"
    if s == "int8":
        return "i8"
    if s == "double":
        return "f64"
    if s == "float":
        return "f32"
    if s in ("string", "large_string"):
        return "str"
    if s == "bool":
        return "bool"
    if s.startswith("timestamp"):
        return "ts"
    if s.startswith("date"):
        return "date"
    if s.startswith("decimal"):
        return "dec"  # HUGEINT sums arrive as decimal128(38,0)
    if s.startswith(("list", "large_list", "struct", "map")):
        return "nested"
    return s


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from activecube_graphql_spark import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            stypes = {f.name: spark_canon(f.dataType.simpleString())
                      for f in fn(spark, sf_dir).schema.fields}
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            otypes = {f.name: duck_canon(f.type) for f in tbl.schema}
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"  ✗ {name}: EXC {type(e).__name__}: {str(e)[:200]}")
            continue
        diffs = []
        for c in sorted(set(stypes) | set(otypes)):
            st, ot = stypes.get(c), otypes.get(c)
            # i64-vs-narrower-int is harmless (same repr); flag the rest
            if st != ot and {st, ot} - {"i64", "i32", "i16", "i8"}:
                diffs.append(f"{c}: spark={st} duck={ot}")
        if diffs:
            bad.append(name)
            print(f"  ✗ {name}: {'; '.join(diffs)}")
        else:
            print(f"  ✓ {name}")
    print(f"\nmismatched={len(bad)}")
    if bad:
        print("MISMATCH:", ", ".join(bad))
        sys.exit(1)


if __name__ == "__main__":
    main()
