"""Self-check of the driver contract: runs every queries() entry on
Spark and its oracle_sql() on DuckDB at a given sf dir, compares
row count + schema-insensitive sorted-column value hash (mirror of the
driver's CORRECTNESS check). Usage:

    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from raptor_rag_spark.session import get_spark  # noqa: E402
from raptor_rag_spark.sources.tables import TABLES  # noqa: E402


def value_hash(pdf) -> str:
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)

    def norm(v):
        if v is None or v != v:
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        if isinstance(v, bool):
            return str(v)
        return str(v)

    rows = sorted(
        "|".join(norm(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("contract-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, {t_spark:.1f}s)")
            if len(sdf) == 0 and name != "noop":
                print(f"      WARNING: zero rows from {name}")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        ok_rows = len(sdf) == len(ddf)
        h_s, h_d = value_hash(sdf), value_hash(ddf)
        ok_hash = h_s == h_d
        status = "OK   " if (ok_rows and ok_hash) else "FAIL "
        print(
            f"{status} {name}: spark={len(sdf)} duck={len(ddf)} "
            f"hash {'==' if ok_hash else h_s + ' != ' + h_d} ({t_spark:.1f}s)"
        )
        if not (ok_rows and ok_hash):
            failures.append(name)
            scols = sorted(sdf.columns)
            dcols = sorted(ddf.columns)
            if scols != dcols:
                print(f"      columns differ: {scols} vs {dcols}")
    print("\n" + ("ALL OK" if not failures else f"FAILURES: {failures}"))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
