"""Dev helper: run one (or more) registered queries against the DuckDB
oracle at a given sf_dir, mirroring tests/test_oracle_parity.py.

Usage: python scripts_dev/check_query.py <query> [<query>...] [--sf DIR]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args

    from grebi_spark.session import get_spark

    spark = get_spark(app_name="check_query", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name in names:
        t0 = time.time()
        sdf = queries[name](spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        t1 = time.time()
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        t2 = time.time()
        ok_cols = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        ok_vals = _canon(srows, scols) == _canon(orows, ocols)
        status = "PASS" if (ok_cols and ok_rows and ok_vals) else "FAIL"
        print(
            f"{status} {name}: spark {len(srows)} rows {t1-t0:.1f}s | "
            f"duck {len(orows)} rows {t2-t1:.1f}s | cols={ok_cols} vals={ok_vals}"
        )
        if status == "FAIL":
            failed.append(name)
            if not ok_cols:
                print("  spark cols:", sorted(scols))
                print("  duck  cols:", sorted(ocols))
            sc = _canon(srows, scols)
            oc = _canon(orows, ocols)
            only_s = [r for r in sc if r not in oc][:5]
            only_o = [r for r in oc if r not in sc][:5]
            print("  only-spark:", only_s)
            print("  only-duck :", only_o)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
