"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at a given sf dir and its
``oracle_sql()`` twin on DuckDB over the same parquet files, then
compares row count, sorted column names, and order-insensitive values
(floats to 1e-9 relative). Reports per-query PASS/FAIL.

Usage:  python tools/verify_local.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def compare(name, sdf, con, sql, out):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.sql(sql)
    dcols = res.columns
    drows = res.fetchall()
    ok = True
    msgs = []
    if len(srows) != len(drows):
        ok = False
        msgs.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
    sc, sr = norm_rows(scols, srows)
    dc, dr = norm_rows(dcols, drows)
    if sc != dc:
        ok = False
        msgs.append(f"schema spark={sc} duckdb={dc}")
    elif sr != dr:
        ok = False
        diff = [
            (a, b) for a, b in zip(sr, dr) if a != b
        ][:3]
        extra_s = [r for r in sr if r not in set(dr)][:3]
        extra_d = [r for r in dr if r not in set(sr)][:3]
        msgs.append(f"values differ; first zips={diff} only_spark={extra_s} only_duck={extra_d}")
    out.append((name, ok, msgs))
    return ok


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from gaming_ai_analytics_spark.session import get_spark

    spark = get_spark("verify_local")
    con = duck_connect(sf_dir)
    qs = e.queries()
    oracles = e.oracle_sql()

    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                compare(name, sdf, con, oracles[name], results)
            else:
                nrows = sdf.count()
                results.append((name, True, [f"rows-only check: {nrows} rows"]))
        except Exception as ex:  # noqa: BLE001
            results.append((name, False, [f"EXCEPTION {type(ex).__name__}: {ex}"]))
        dt = time.time() - t0
        st = "PASS" if results[-1][1] else "FAIL"
        print(f"[{st}] {name} ({dt:.1f}s) {'; '.join(results[-1][2])}", flush=True)

    nfail = sum(1 for _, ok, _ in results if not ok)
    print(f"\n{len(results) - nfail}/{len(results)} queries pass")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
