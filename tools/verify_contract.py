"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the given sf, compare row count + column names + order-insensitive
values. Usage: python tools/verify_contract.py [sf_dir] [query ...]"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from html_parser_spark.plans.pipeline import configure

    spark = configure(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'{sf_dir}/{t}.parquet'")
        except Exception:
            pass

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = sorted(tuple(norm(r[c]) for c in cols)
                           for r in sdf.collect())
        except Exception as ex:
            print(f"FAIL {name}: spark error {ex!r:.300}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, no oracle) "
                  f"[{time.monotonic() - t0:.1f}s]")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = sorted(d[0] for d in ores.description)
            raw = ores.fetchall()
            names = [d[0] for d in ores.description]
            idx = [names.index(c) for c in ocols]
            orows = sorted(tuple(norm(r[i]) for i in idx) for r in raw)
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {ex!r:.300}")
            failures += 1
            continue
        status = []
        if cols != ocols:
            status.append(f"cols {cols} != {ocols}")
        if len(srows) != len(orows):
            status.append(f"rows {len(srows)} != {len(orows)}")
        if not status and srows != orows:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            status.append(f"values differ, e.g. {diff}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}"[:2000])
            failures += 1
        else:
            print(f"PASS {name} ({len(srows)} rows) "
                  f"[{time.monotonic() - t0:.1f}s]")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
