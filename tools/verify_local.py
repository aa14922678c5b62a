"""Local stand-in for the driver's correctness gate: runs every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over
the same parquet, compares row count, column names, and an
order-insensitive multiset of canonicalized row values.

Usage: python tools/verify_local.py [sf_dir] [name ...]

Pass ``--vanilla`` (first flag) to build a bare ``SparkSession`` with none
of the engine's session confs, mimicking the driver's oracle harness —
regression guard for the round-1 nanosAsLong portability bug (every query
must be self-sufficient on an externally-built session).
"""

from __future__ import annotations

import datetime
import math
import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonicalize a value the way any sane hasher would see it."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # bit-exact: repr() of the double, no tolerance — the driver's
        # value hash is bit-exact, and round(v, 9) here is how 8 ULP-red
        # rows shipped in r3 (VERDICT r4 item 3). Local red ⇔ driver red.
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return canon(v.item())
    return repr(v)


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    argv = list(sys.argv[1:])
    vanilla = "--vanilla" in argv
    if vanilla:
        argv.remove("--vanilla")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod

    if vanilla:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[8]")
                 .config("spark.ui.enabled", "false").getOrCreate())
    else:
        from activecube_graphql_spark import get_spark
        spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed, passed, skipped = [], [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            if name not in oracles:
                skipped.append(name)
                print(f"  ~ {name}: rows-only ({len(srows)} rows)")
                continue
            otbl = con.execute(oracles[name]).fetch_arrow_table()
            ocols = otbl.schema.names
            orows = [tuple(r.values()) for r in otbl.to_pylist()]
            problems = []
            # physical-type parity: DuckDB widens integer SUM to HUGEINT
            # (decimal128 through Arrow, float64 through pandas) — a hash
            # harness sees "123.0" vs Spark's "123". This is the r03/r04
            # 8-row hash-fail class; catch it locally (audit_types.py has
            # the full canonicalization, this is the inline subset).
            from audit_types import duck_canon, spark_canon
            stypes = {f.name: spark_canon(f.dataType.simpleString())
                      for f in sdf.schema.fields}
            otypes = {f.name: duck_canon(f.type) for f in otbl.schema}
            for c in sorted(set(stypes) & set(otypes)):
                st, ot = stypes[c], otypes[c]
                if st != ot and {st, ot} - {"i64", "i32", "i16", "i8"}:
                    problems.append(f"dtype {c}: spark={st} duck={ot}")
            if sorted(scols) != sorted(ocols):
                problems.append(f"columns {sorted(scols)} != {sorted(ocols)}")
            elif len(srows) != len(orows):
                problems.append(f"rowcount {len(srows)} != {len(orows)}")
            else:
                sm = rows_multiset(scols, [[r[c] for c in scols] for r in srows])
                om = rows_multiset(ocols, orows)
                if sm != om:
                    diff_s = list((sm - om).items())[:3]
                    diff_o = list((om - sm).items())[:3]
                    problems.append(f"values spark-only={diff_s} oracle-only={diff_o}")
            if problems:
                failed.append(name)
                print(f"  ✗ {name}: {problems[0][:500]}")
            else:
                passed.append(name)
                print(f"  ✓ {name} ({len(srows)} rows)")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"  ✗ {name}: EXC {type(e).__name__}: {str(e)[:300]}")
    print(f"\npassed={len(passed)} failed={len(failed)} rows_only={len(skipped)}")
    if failed:
        print("FAILED:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
