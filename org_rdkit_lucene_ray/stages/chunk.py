"""RAG-style document chunking — split each document's token stream into
fixed-size overlapping windows (the retrieval-corpus preparation step that
fronts embedding + chunk-level indexing pipelines; LangChain/LlamaIndex call
it a token splitter, Lucene-era systems did the same for passage retrieval).

Scale shape: ONE stateless ``map_batches`` pass — tokenize, then a fully
vectorized repeat/arange explosion into chunk rows. Zero shuffles, zero
driver materialization; a doc's chunks are derived entirely from its own
row, so the operator is partitioning-invariant by construction.

Chunk rule (integer arithmetic, bit-comparable against the SQL oracle):
for a doc with ``n`` tokens (docs with 0 tokens emit no chunks),

    n_chunks = 1                       if n <= window
             = (n - window + stride - 1) // stride + 1   otherwise
    chunk i  = tokens[i*stride : min(i*stride + window, n)]

so consecutive chunks overlap by ``window - stride`` tokens and the last
chunk is never empty (its start is always < n).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from org_rdkit_lucene_ray.config import AnalyzerConfig
from org_rdkit_lucene_ray.functions.analyze import REGISTRY, tokenize_column


def chunk_batch(t: pa.Table, *, window: int, stride: int,
                text_column: str = "text", id_column: str = "doc_id",
                cfg: AnalyzerConfig | None = None,
                emit_text: bool = False) -> pa.Table:
    """Explode one Arrow batch of documents into chunk rows.

    Output: (doc_id, chunk_id, n_tokens, first_token, last_token
    [, chunk_text]) — first/last token pin the slice boundaries for the
    oracle; ``emit_text`` additionally joins the chunk's tokens (the
    payload an embedding stage would consume).
    """
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    cfg = cfg or REGISTRY["standard"]
    toks = tokenize_column(t[text_column], cfg)
    flat = toks.values
    doc_off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = doc_off[1:] - doc_off[:-1]
    ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.int64)

    nz = lens > 0
    n = lens[nz]
    n_chunks = np.where(n <= window, 1, (n - window + stride - 1) // stride + 1)
    total = int(n_chunks.sum())
    if total == 0:
        cols = {
            "doc_id": pa.array([], pa.int64()),
            "chunk_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "first_token": pa.array([], pa.string()),
            "last_token": pa.array([], pa.string()),
        }
        if emit_text:
            cols["chunk_text"] = pa.array([], pa.string())
        return pa.table(cols)

    # vectorized explode: row j belongs to nonzero-doc d(j) with local
    # chunk_id = j - first_row_of(d)
    first_row = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    d = np.repeat(np.arange(n.size), n_chunks)
    chunk_id = np.arange(total) - first_row[d]
    starts = chunk_id * stride
    ends = np.minimum(starts + window, n[d])
    base = doc_off[:-1][nz][d]
    first_tok = flat.take(pa.array(base + starts))
    last_tok = flat.take(pa.array(base + ends - 1))
    cols = {
        "doc_id": pa.array(ids[nz][d]),
        "chunk_id": pa.array(chunk_id),
        "n_tokens": pa.array(ends - starts),
        "first_token": first_tok,
        "last_token": last_tok,
    }
    if emit_text:
        # per-chunk token join: chunk windows OVERLAP, so a plain ListArray
        # view over the flat buffer is impossible (offsets must be
        # monotone) — gather each chunk's token indices with one vectorized
        # index explosion instead, then join per chunk
        import pyarrow.compute as pc

        span = ends - starts
        row_of = np.repeat(np.arange(total), span)
        pos_in_row = np.arange(span.sum()) - np.repeat(
            np.concatenate([[0], np.cumsum(span)[:-1]]), span)
        gather = (base + starts)[row_of] + pos_in_row
        chunk_vals = flat.take(pa.array(gather))
        offs = np.concatenate([[0], np.cumsum(span)])
        la = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), chunk_vals)
        cols["chunk_text"] = pc.binary_join(la, " ")
    return pa.table(cols)


def chunk_documents(ds: rd.Dataset, *, window: int = 32, stride: int = 24,
                    text_column: str = "text", id_column: str = "doc_id",
                    analyzer: str = "standard",
                    emit_text: bool = False) -> rd.Dataset:
    """Dataset-level chunker: one ``map_batches`` pass (see module doc)."""
    cfg = REGISTRY[analyzer]
    return ds.map_batches(
        lambda t: chunk_batch(t, window=window, stride=stride,
                              text_column=text_column, id_column=id_column,
                              cfg=cfg, emit_text=emit_text),
        batch_format="pyarrow")
