"""Local twin of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from lamapi_spark.queries import TABLES, oracle_sql, queries
from lamapi_spark.session import get_spark


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.10g}"
    except Exception:
        pass
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # 150+ queries share ONE local-mode JVM: bound the listener/UI state
    # (an appStatus-thread OOM once killed the context mid-sweep) and
    # clear per-query cache/checkpoint residue below.
    spark = get_spark(master="local[8]", shuffle_partitions=8, extra_conf={
        "spark.driver.memory": os.environ.get("CONTRACT_DRIVER_MEM", "12g"),
        "spark.ui.enabled": "false",
        "spark.sql.ui.retainedExecutions": "5",
        "spark.ui.retainedJobs": "50",
        "spark.ui.retainedStages": "50",
    })
    # ONE DuckDB connection per ORACLE (built lazily below): after an
    # out-of-memory failure a shared connection can stay wedged (its
    # allocator keeps the reservation), cascading bogus OOMs over every
    # later oracle — observed in the round-5 sf0.1 sweep. A fresh
    # connection per query costs ~10 view DDLs, nothing at this scale.
    def fresh_con():
        c = duckdb.connect()
        # bound the spill: a CTE-inlining blowup (re-executed heavy
        # subtrees, see the rag_mmr_rerank fix) must ERROR, not fill the
        # disk — and spill outside the repo, not cwd-relative .tmp
        c.execute("SET temp_directory='/tmp/ddb_contract_spill'")
        c.execute("SET max_temp_directory_size='24GB'")
        for t in TABLES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    qs, oracles = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:2000]}")
            continue
        finally:
            # drop this query's cached frames and let the ContextCleaner
            # reclaim localCheckpoint RDD blocks (their Python refs die
            # with this iteration) — residue across 150+ queries is what
            # eventually OOMs the shared JVM
            spark.catalog.clearCache()
            import gc
            gc.collect()
        if name not in oracles:
            print(f"ok?  {name}: rows={len(s_rows)} (no oracle — rows-only check)")
            continue
        try:
            con = fresh_con()
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
            con.close()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:2000]}")
            try:
                con.close()
            except Exception:
                pass
            continue
        if sorted(s_cols) != sorted(d_cols):
            failures.append((name, f"SCHEMA: spark={s_cols} duck={d_cols}"))
            print(f"FAIL {name}: schema mismatch spark={s_cols} duck={d_cols}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append((name, f"COUNT: spark={len(s_rows)} duck={len(d_rows)}"))
            print(f"FAIL {name}: count spark={len(s_rows)} duck={len(d_rows)}")
            continue
        a, b = norm_rows(s_cols, s_rows), norm_rows(d_cols, d_rows)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"VALUES: first diffs {diff}"))
            print(f"FAIL {name}: value mismatch, e.g. {diff}")
            continue
        print(f"PASS {name}: rows={len(s_rows)}")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nALL PASS")


if __name__ == "__main__":
    main()
