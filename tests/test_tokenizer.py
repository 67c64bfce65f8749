"""Token counts must agree byte-for-byte across Python re, Spark (Java
regex) and DuckDB (RE2) — this is what lets n_tokens participate in
the DuckDB-oracle correctness gate."""

import duckdb
import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.tokenizer import (
    duckdb_token_count_expr,
    spark_token_count,
    token_count,
)

SAMPLES = [
    "",
    "hello world",
    "Hello, world! How's it going?",
    "Türkçe çok güzel; öyle değil mi?",
    "tabs\tand\nnewlines\r\nand  double  spaces",
    "numbers 123 and under_scores plus-dashes",
    "emoji 🙂 and symbols @#$%^&*()",
    "trailing space ",
    " . , ; : !",
]


def test_python_counts_sane():
    assert token_count("hello world") == 2
    assert token_count("Hello, world!") == 4
    assert token_count("") == 0


@pytest.mark.spark
def test_spark_matches_python(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], ["i", "t"])
    rows = df.select("i", spark_token_count("t").alias("n")).collect()
    for r in rows:
        assert r["n"] == token_count(SAMPLES[r["i"]]), SAMPLES[r["i"]]


def test_duckdb_matches_python():
    con = duckdb.connect()
    for s in SAMPLES:
        n = con.execute(
            f"select {duckdb_token_count_expr('?::VARCHAR')}", [s]
        ).fetchone()[0]
        assert n == token_count(s), repr(s)
