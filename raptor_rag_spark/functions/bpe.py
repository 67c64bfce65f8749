"""From-scratch byte-pair-encoding tokenizer (tiktoken-compatible).

The reference counts tokens with ``tiktoken.get_encoding("cl100k_base")``
(/root/reference/raptor/utils.py:43,62). The tiktoken *package* is
absent from this environment, so the engine ships its own BPE
implementation of the same published algorithm: all that is needed for
exact reference token-count parity is the public ``cl100k_base.tiktoken``
vocabulary *data file* (base64-encoded token bytes + rank per line —
the format tiktoken itself downloads). Point
:meth:`BPETokenizer.from_tiktoken_file` at it and pass the tokenizer
through the existing seams (``chunk_documents(tokenizer_factory=...)``,
``token_count``-style UDFs via :func:`make_bpe_token_count_udf`).

Everything here derives from public knowledge only:

- the BPE merge algorithm (merge the lowest-rank adjacent pair until
  no mergeable pair remains) is the published procedure from Sennrich
  et al. 2016 and tiktoken's own educational reference implementation;
- ``CL100K_SPLIT_PATTERN`` is the published cl100k_base pre-tokenizer
  regex from tiktoken's public source (tiktoken_ext/openai_public.py,
  MIT); it needs ``\\p{L}``/``\\p{N}`` classes, hence the third-party
  ``regex`` module (import-gated with a clear error);
- the ``.tiktoken`` file format (``<base64 token bytes> <rank>`` per
  line) is the public format of the published vocabulary files.

This module is engine-only surface (pytest evidence, no DuckDB-oracle
contract entry): BPE counts are not expressible in ANSI SQL, and the
50-entry driver contract stays untouched per COVERAGE.md's cap plan.
The engine DEFAULT tokenizer remains the 3-engine regex tokenizer in
``raptor_rag_spark.tokenizer`` — BPE is the production-parity plug-in.
"""

from __future__ import annotations

import base64
from collections.abc import Iterator
from functools import lru_cache

import pandas as pd

# Published cl100k_base pre-tokenizer pattern (tiktoken public source).
# Pieces: contractions; optional non-letter prefix + letter run; digit
# runs capped at 3 (why "12345" is 2 tokens); punctuation runs with an
# optional leading space and trailing newlines; whitespace handling that
# leaves the last space attached to the following word piece.
CL100K_SPLIT_PATTERN = (
    r"""'(?i:s|t|re|ve|m|ll|d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}"""
    r"""| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""
)


def _require_regex():
    try:
        import regex
    except ImportError as exc:  # pragma: no cover - present in this image
        raise ImportError(
            "the BPE pre-tokenizer needs the 'regex' module for \\p{L}/\\p{N} "
            "classes (Python re lacks them); pip install regex"
        ) from exc
    return regex


def load_tiktoken_bpe(path: str) -> dict[bytes, int]:
    """Parse a ``.tiktoken`` vocabulary file: one ``<base64> <rank>``
    pair per line (the public format of cl100k_base.tiktoken)."""
    ranks: dict[bytes, int] = {}
    with open(path, "rb") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            tok_b64, rank = line.split()
            ranks[base64.b64decode(tok_b64)] = int(rank)
    return ranks


def byte_pair_merge(piece: bytes, ranks: dict[bytes, int]) -> list[bytes]:
    """The BPE merge loop: start from single bytes and repeatedly merge
    the adjacent pair with the LOWEST rank (leftmost occurrence first
    when the same pair appears at several positions — identical-rank
    entries can only be the same byte pair, ranks are unique) until no
    adjacent pair is in the vocabulary.

    Pieces at or under the 64-byte cutover below take the naive
    quadratic scan (lowest constant; the typical word/punctuation
    piece is far smaller still, < 16 bytes). Large pieces — the
    cl100k pre-tokenizer caps only digit runs at 3; letter runs
    (``\\p{L}+``), punctuation runs and whitespace runs are UNBOUNDED,
    and real crawl text carries 100 KB+ unbroken runs (base64 blobs,
    minified JS, '!!!…' spam) — switch to a heap + linked-list merge,
    O(n log n), so one pathological row can't wedge an executor task
    for hours."""
    if len(piece) <= 64:
        parts = [piece[i : i + 1] for i in range(len(piece))]
        while len(parts) > 1:
            best_rank: int | None = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = ranks.get(parts[i] + parts[i + 1])
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
        return parts
    return _byte_pair_merge_heap(piece, ranks)


def _byte_pair_merge_heap(piece: bytes, ranks: dict[bytes, int]) -> list[bytes]:
    """Heap-based merge, identical output to the naive scan.

    Doubly-linked list over the parts (indexed by each part's start
    offset — a merge keeps the LEFT part's offset, so offsets stay
    monotone along the list and ``(rank, left_offset)`` heap order IS
    lowest-rank-then-leftmost). Stale heap entries are skipped via
    per-part version stamps: an entry records the versions of both
    parts at push time and is valid only if both still match."""
    import heapq

    n = len(piece)
    parts = [piece[i : i + 1] for i in range(n)]
    nxt = list(range(1, n)) + [-1]
    prv = [-1] + list(range(n - 1))
    alive = [True] * n
    ver = [0] * n

    heap: list[tuple[int, int, int, int]] = []
    for i in range(n - 1):
        r = ranks.get(piece[i : i + 2])
        if r is not None:
            heap.append((r, i, 0, 0))
    heapq.heapify(heap)

    while heap:
        r, i, vi, vj = heapq.heappop(heap)
        j = nxt[i]
        if j == -1 or not alive[i] or not alive[j] or ver[i] != vi or ver[j] != vj:
            continue  # stale: one side already merged away or changed
        parts[i] = parts[i] + parts[j]
        ver[i] += 1
        alive[j] = False
        nxt[i] = nxt[j]
        if nxt[j] != -1:
            prv[nxt[j]] = i
        p, k = prv[i], nxt[i]
        if p != -1:
            rp = ranks.get(parts[p] + parts[i])
            if rp is not None:
                heapq.heappush(heap, (rp, p, ver[p], ver[i]))
        if k != -1:
            rk = ranks.get(parts[i] + parts[k])
            if rk is not None:
                heapq.heappush(heap, (rk, i, ver[i], ver[k]))

    out = []
    i = 0
    while i != -1:
        out.append(parts[i])
        i = nxt[i]
    return out


class BPETokenizer:
    """tiktoken-compatible encoder over a rank table.

    Matches the surface the reference consumes — ``len(encode(text))``
    (utils.py:43,62 only ever takes the length; special-token encoding
    is never exercised there, so ordinary-text encoding is the whole
    contract). ``encode`` returns token ids (ints)."""

    def __init__(self, ranks: dict[bytes, int], pattern: str = CL100K_SPLIT_PATTERN):
        if not ranks:
            raise ValueError("empty BPE rank table")
        self.ranks = ranks
        self._re = _require_regex().compile(pattern)

    @classmethod
    def from_tiktoken_file(cls, path: str, pattern: str = CL100K_SPLIT_PATTERN) -> "BPETokenizer":
        return cls(load_tiktoken_bpe(path), pattern)

    def encode(self, text: str) -> list[int]:
        ranks = self.ranks
        out: list[int] = []
        for piece_s in self._re.findall(text):
            piece = piece_s.encode("utf-8")
            rank = ranks.get(piece)
            if rank is not None:  # whole piece is a vocabulary token
                out.append(rank)
                continue
            for part in byte_pair_merge(piece, ranks):
                try:
                    out.append(ranks[part])
                except KeyError:
                    raise ValueError(
                        f"BPE part {part!r} not in vocabulary — the rank "
                        "table must contain every single byte (cl100k does)"
                    ) from None
        return out

    def decode_bytes(self, token_ids: list[int]) -> bytes:
        """Inverse of encode (roundtrip invariant used by tests)."""
        if not hasattr(self, "_by_rank"):
            self._by_rank = {r: b for b, r in self.ranks.items()}
        return b"".join(self._by_rank[t] for t in token_ids)


@lru_cache(maxsize=4)
def _cached_tokenizer(path: str) -> BPETokenizer:
    """One rank-table load per executor PYTHON WORKER process (the
    lru_cache lives in the worker's module state). On a real cluster,
    ship the vocab file with ``spark-submit --files cl100k_base.tiktoken``
    so ``path`` resolves on every executor; in local mode any local path
    works."""
    return BPETokenizer.from_tiktoken_file(path)


def bpe_tokenizer_factory(path: str):
    """``tokenizer_factory`` for :func:`operators.chunk.chunk_documents`:
    per-worker cached BPE tokenizer, e.g.
    ``chunk_documents(docs, tokenizer_factory=bpe_tokenizer_factory(p))``
    reproduces the reference's exact cl100k chunk boundaries once the
    public vocab file is present."""
    return lambda: _cached_tokenizer(path)


def make_bpe_token_count_udf(path: str):
    """Arrow-batched pandas UDF ``text -> int`` counting BPE tokens with
    the vocabulary at ``path``. The slow path is unavoidable here — BPE
    is inherently procedural — but it stays vectorized per Arrow batch
    and loads the rank table once per worker."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def bpe_count(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        enc = _cached_tokenizer(path).encode  # once per worker stream
        for texts in batches:
            yield pd.Series(
                [0 if t is None else len(enc(t)) for t in texts],
                index=texts.index,
                dtype="int32",
            )

    return bpe_count
