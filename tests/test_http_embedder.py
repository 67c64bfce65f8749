"""Mock-HTTP embedder integration: the production seam S5 driven end
to end against an in-process HTTP server implementing the reference's
batch contract — endpoint/payload shape (EmbeddingModels.py:119-138),
optimal-batch chunking at 32 / max 64 (server.py:61-62, 285-299),
server-side query:/passage: prefixing (server.py:304-309), input
validation (server.py:452-467), and transient-failure retry
(EmbeddingModels.py:94)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.operators.embed import (
    embed_texts,
    hash_embed_batch,
    http_embed_fn,
)

DIM = 32
MAX_BATCH = 64


class _MockVllm(BaseHTTPRequestHandler):
    """Reference-contract embedding service over the deterministic
    hash embedder: validates like server.py:452-467, prefixes like
    server.py:304-309, answers {"data": [{"embedding": ...}]} like the
    batch endpoint EmbeddingModels.py:125-131."""

    state = {"batches": [], "fail_next": 0}

    def do_POST(self):  # noqa: N802
        n = int(self.headers.get("Content-Length", 0))
        texts = json.loads(self.rfile.read(n))
        if _MockVllm.state["fail_next"] > 0:
            _MockVllm.state["fail_next"] -= 1
            self._reply(500, b"transient backend error")
            return
        if not isinstance(texts, list) or not texts or len(texts) > MAX_BATCH:
            self._reply(422, b"batch must be a non-empty list of <= 64 texts")
            return
        for i, t in enumerate(texts):
            if not isinstance(t, str) or not t.strip():
                self._reply(422, f"input item {i} empty".encode())
                return
            if len(t) > 10000:
                self._reply(422, f"input item {i} too long".encode())
                return
        _MockVllm.state["batches"].append(len(texts))
        prefixed = [
            t if t.startswith(("query:", "passage:")) else f"query: {t}"
            for t in texts
        ]
        mat = hash_embed_batch(pd.Series(prefixed), dim=DIM)
        body = json.dumps(
            {"data": [{"embedding": row.tolist()} for row in mat]}
        ).encode()
        self._reply(200, body, ctype="application/json")

    def _reply(self, code: int, body: bytes, ctype: str = "text/plain"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture()
def mock_service():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _MockVllm)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    _MockVllm.state["batches"] = []
    _MockVllm.state["fail_next"] = 0
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    thread.join(timeout=5)


def test_http_embedder_full_slice_with_chunking_and_prefixing(
    spark, mock_service
):
    """70 texts (3 already passage:-prefixed) through
    embed_texts(embed_fn=http) in one partition: results must equal the
    local hash embedder applied to the SERVER-prefixed texts, and the
    service must have received them as optimal-batch chunks 32/32/6."""
    rows = [
        (
            i,
            f"passage: pinned text {i} alpha"
            if i % 23 == 0
            else f"some web page body {i} beta gamma",
        )
        for i in range(70)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    fn = http_embed_fn(mock_service, dim=DIM)
    got = {
        r["doc_id"]: np.asarray(r["embedding"], dtype=np.float32)
        for r in embed_texts(df, dim=DIM, embed_fn=fn).collect()
    }
    prefixed = pd.Series(
        [
            t if t.startswith(("query:", "passage:")) else f"query: {t}"
            for _, t in rows
        ]
    )
    want = hash_embed_batch(prefixed, dim=DIM)
    assert len(got) == 70
    for (i, _), w in zip(rows, want):
        assert np.array_equal(got[i], w), f"doc {i} mismatch"
    # client-side chunking at the server's optimal batch size
    assert _MockVllm.state["batches"] == [32, 32, 6]


def test_http_embedder_retries_transient_5xx(spark, mock_service):
    """The reference client retries transient failures (tenacity,
    3 attempts): 2 planted 500s then success must come back clean."""
    _MockVllm.state["fail_next"] = 2
    df = spark.createDataFrame(
        [(i, f"retry doc {i}") for i in range(5)], "doc_id long, text string"
    ).repartition(1)
    fn = http_embed_fn(mock_service, dim=DIM, max_retries=3)
    out = embed_texts(df, dim=DIM, embed_fn=fn).collect()
    assert len(out) == 5
    assert _MockVllm.state["fail_next"] == 0
    assert _MockVllm.state["batches"] == [5]  # one successful batch


def test_http_embedder_validation_rejection_fails_loudly(spark, mock_service):
    """A 422 validation rejection (empty text, server.py:461-462) must
    fail the job immediately — no retry loop, no garbage vectors."""
    df = spark.createDataFrame(
        [(0, "fine"), (1, "   ")], "doc_id long, text string"
    ).repartition(1)
    fn = http_embed_fn(mock_service, dim=DIM)
    with pytest.raises(Exception, match="embedding service rejected"):
        embed_texts(df, dim=DIM, embed_fn=fn).collect()
    # the rejected request was not retried (no extra POSTs recorded)
    assert _MockVllm.state["batches"] == []


def test_http_embedder_exhausted_retries_fail_loudly(spark, mock_service):
    """More consecutive 500s than the retry budget: the task must fail
    with the attempts count, not hang or emit zeros."""
    _MockVllm.state["fail_next"] = 99
    df = spark.createDataFrame([(0, "doomed")], "doc_id long, text string")
    fn = http_embed_fn(mock_service, dim=DIM, max_retries=2)
    with pytest.raises(Exception, match="failed after 2 attempts"):
        embed_texts(df, dim=DIM, embed_fn=fn).collect()


def test_http_embedder_empty_batch_is_total(mock_service):
    """An empty pandas batch (legal for a scalar-iterator UDF) must
    return a (0, dim) matrix, not trip the shape check on np's
    1-D empty array."""
    fn = http_embed_fn(mock_service, dim=DIM)
    out = fn(pd.Series([], dtype=object))
    assert out.shape == (0, DIM)
    assert out.dtype == np.float32
    # and no HTTP request was made for zero rows
    assert _MockVllm.state["batches"] == []


def test_http_embedder_rejects_zero_retries():
    """range(0) would skip the request and report a fake shape error
    that misdirects debugging at the service — config error instead."""
    with pytest.raises(ValueError, match="max_retries"):
        http_embed_fn("http://localhost:1", dim=DIM, max_retries=0)
