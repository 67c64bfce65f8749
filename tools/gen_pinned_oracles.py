"""Generate pinned golden VALUES oracles for the contract queries whose
kernels are not SQL-expressible (stateful chunking, hash-embedder
retrieval, deterministic-fake multimodal decode, engine-specific HLL).

The engine side of each query is fully deterministic (seeded projection
+ hash embedder + pinned tie-breaks), so its output at a given sf dir
is a constant — this tool runs each query ONCE per sf dir and writes
the rows to raptor_rag_spark/plans/pinned_oracles.json; oracle_sql_map
then emits them as a CAST'ed VALUES table guarded by the sf's document
count, giving the driver a full hash compare instead of the weaker
rows-only check.

Regenerate ONLY on an intentional semantic change (or if the driver's
testdata is regenerated):

    python tools/gen_pinned_oracles.py [sf_dir ...]

Defaults to sf0.001, sf0.01 and sf0.1. Determinism is sanity-checked by
running every query twice and asserting identical rows.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raptor_rag_spark.session import get_spark  # noqa: E402

PINNED_QUERIES = [
    "chunks",
    "cell_summary",
    "traversal_retrieval",
    "collapsed_retrieval",
    "ann_index_search",
    "multimodal_features",
    "approx_distinct",
    "knn_quantized",
]
# queries whose output does not depend on the sf dir at all
SF_INDEPENDENT = {"multimodal_features"}

OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "raptor_rag_spark",
    "plans",
    "pinned_oracles.json",
)


def _rows(df) -> list[list]:
    rows = [list(r) for r in df.collect()]
    rows.sort(key=lambda r: tuple((v is None, str(v)) for v in r))
    return rows


def main() -> int:
    from raptor_rag_spark.plans.driver_queries import QUERIES

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("gen-pinned-oracles")
    pinned: dict = {}
    for name in PINNED_QUERIES:
        fn = QUERIES[name]
        entry: dict = {"columns": None, "branches": [], "sf_independent": name in SF_INDEPENDENT}
        dirs = sf_dirs[:1] if name in SF_INDEPENDENT else sf_dirs
        for sf_dir in dirs:
            # guard on the events row count: documents has 500 rows at
            # BOTH sf0.001 and sf0.01, events is unique per sf
            n_events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
            df = fn(spark, sf_dir)
            entry["columns"] = [[f.name, f.dataType.simpleString()] for f in df.schema.fields]
            rows = _rows(df)
            again = _rows(fn(spark, sf_dir))
            if rows != again:
                raise SystemExit(f"{name} @ {sf_dir}: NON-DETERMINISTIC — cannot pin")
            entry["branches"].append({"n_events": n_events, "rows": rows})
            print(f"{name} @ {sf_dir}: {len(rows)} rows pinned (deterministic twice)")
        pinned[name] = entry
    with open(OUT_PATH, "w") as fh:
        json.dump(pinned, fh, separators=(",", ":"))
    print(f"wrote {OUT_PATH} ({os.path.getsize(OUT_PATH)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
