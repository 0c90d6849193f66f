"""Posting-list codec: delta + varint doc ids, varint tfs/dls, block-max.

This is the explicit rebuild of the black box the reference delegates to
Lucene (segment postings format; ``IndexWriter`` via default config,
``DefaultIndexWriterConfigFactory.java:61-65`` — SURVEY §1.1(3)).

Layout of one encoded posting-list chunk (all numpy-vectorized):
    varint(delta(doc_ids)) || varint(tfs) || varint(dls)
with the three section byte-lengths stored alongside. Doc ids MUST be
strictly increasing (Lucene keeps docID-sorted postings and all collectors
exploit it — ``SubstructureScoreDocCollector.java:62-94``; delta-encoding and
WAND both require it).

Block-max metadata (Lucene BMW analog): per block of ``block_size`` postings,
``(first_doc, last_doc, max_tfn)`` where ``max_tfn`` is the exact maximum of
the BM25 term-frequency component  tf / (tf + k1*(1 - b + b*dl/avgdl))
over the block, rounded UP to float32 so the bound stays admissible.
The block upper bound at query time is  idf * (k1+1) * max_tfn  — exact given
idf is constant per term, and independent of df at encode time (so encoding
needs only the global avgdl, not the global df table).
"""

from __future__ import annotations

import numpy as np

from org_rdkit_lucene_ray.config import BM25Params

_MAX_VARINT_BYTES = 10  # enough for uint64


# ------------------------------------------------------------------- varints
def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized, no Python loop over values)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value: ceil(bits/7), min 1
    bits = np.zeros(v.shape, dtype=np.int64)
    nz = v > 0
    # bit_length via log2 is unsafe for large ints; use frexp on float is
    # lossy >2^53. Compute by shifting in 7-bit steps instead.
    lengths = np.ones(v.shape, dtype=np.int64)
    shifted = v >> np.uint64(7)
    while shifted.any():
        grow = shifted > 0
        lengths[grow] += 1
        shifted = shifted >> np.uint64(7)
    del bits, nz
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    total = int(offsets[-1])
    out = np.zeros(total, dtype=np.uint8)
    # fill byte position k of every value with length > k
    remaining = v.copy()
    alive = np.arange(v.size)
    k = 0
    while alive.size:
        pos = offsets[alive] + k
        byte = (remaining[alive] & np.uint64(0x7F)).astype(np.uint8)
        more = (k + 1) < lengths[alive]
        out[pos] = byte | (more.astype(np.uint8) << 7)
        remaining[alive] = remaining[alive] >> np.uint64(7)
        alive = alive[more]
        k += 1
    return out.tobytes()


def varint_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte stream into a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    term_mask = (b & 0x80) == 0            # terminator bytes
    ends = np.flatnonzero(term_mask)       # inclusive end index of each value
    starts = np.concatenate([[0], ends[:-1] + 1])
    lengths = ends - starts + 1
    n = ends.size
    values = np.zeros(n, dtype=np.uint64)
    maxlen = int(lengths.max())
    for k in range(maxlen):
        sel = lengths > k
        idx = starts[sel] + k
        values[sel] |= (b[idx] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    if count is not None and n != count:
        raise ValueError(f"varint stream held {n} values, expected {count}")
    return values


# --------------------------------------------------------------- posting list
def tf_norm(tf: np.ndarray, dl: np.ndarray, avgdl: float, bm25: BM25Params) -> np.ndarray:
    """BM25 term-frequency component in float64: tf/(tf + k1*(1-b+b*dl/avgdl))."""
    tf = tf.astype(np.float64)
    K = bm25.k1 * (1.0 - bm25.b + bm25.b * dl.astype(np.float64) / float(avgdl))
    return tf / (tf + K)


def encode_posting_list(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    bm25: BM25Params,
    block_size: int,
) -> dict:
    """Encode one docID-sorted posting-list chunk.

    Returns a dict with the binary payload + block-max arrays + section sizes,
    ready to become one row of the segment table (state/segment.py).
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    if n == 0:
        raise ValueError("empty posting list")
    if n > 1 and not (np.diff(doc_ids) > 0).all():
        raise ValueError("doc_ids must be strictly increasing")
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = np.uint64(doc_ids[0])
    if n > 1:
        deltas[1:] = np.diff(doc_ids).astype(np.uint64)
    doc_bytes = varint_encode(deltas)
    tf_bytes = varint_encode(tfs.astype(np.uint64))
    dl_bytes = varint_encode(dls.astype(np.uint64))

    # block-max metadata
    nblocks = (n + block_size - 1) // block_size
    tfn = tf_norm(np.asarray(tfs), np.asarray(dls), avgdl, bm25)
    first_doc = doc_ids[::block_size].copy()
    last_doc = doc_ids[np.minimum(np.arange(1, nblocks + 1) * block_size, n) - 1]
    max_tfn = np.zeros(nblocks, dtype=np.float32)
    for i in range(nblocks):  # nblocks is small (n/128); cheap
        m = tfn[i * block_size:(i + 1) * block_size].max()
        # round UP to float32 to keep the bound admissible
        f32 = np.float32(m)
        if float(f32) < m:
            f32 = np.nextafter(f32, np.float32(np.inf))
        max_tfn[i] = f32
    return {
        "df_chunk": n,
        "doc_bytes": doc_bytes,
        "tf_bytes": tf_bytes,
        "dl_bytes": dl_bytes,
        "bm_first_doc": first_doc,
        "bm_last_doc": last_doc,
        "bm_max_tfn": max_tfn,
    }


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """LEB128 byte length per value (vectorized; shared with varint_encode)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    lengths = np.ones(v.shape, dtype=np.int64)
    shifted = v >> np.uint64(7)
    while shifted.any():
        grow = shifted > 0
        lengths[grow] += 1
        shifted = shifted >> np.uint64(7)
    return lengths


def encode_posting_block(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    term_starts: np.ndarray,
    avgdl: float,
    bm25: BM25Params,
    block_size: int,
) -> dict:
    """Encode MANY terms' posting lists in one vectorized pass.

    ``term_starts`` are the start offsets of each term's run inside the
    (term, doc_id)-sorted arrays. Produces byte-identical output to calling
    :func:`encode_posting_list` per term (delta reset at every term start;
    per-term varint streams are slices of one whole-array encoding, and
    LEB128 is self-contained per value), ~10x less per-call overhead.

    Returns dict of per-term lists/arrays aligned with ``term_starts``:
    ``df_chunk, doc_bytes, tf_bytes, dl_bytes`` plus flattened block-max
    arrays with ``block_offsets`` (for ListArray construction).
    """
    n = doc_ids.size
    m = term_starts.size
    bounds = np.concatenate([term_starts, [n]])
    counts = np.diff(bounds)
    if (counts <= 0).any():
        raise ValueError("empty term run")
    # deltas with reset at term starts
    deltas = np.empty(n, dtype=np.uint64)
    deltas[1:] = np.diff(doc_ids).astype(np.uint64)
    deltas[term_starts] = doc_ids[term_starts].astype(np.uint64)
    within = np.ones(n, dtype=bool)
    within[term_starts] = False
    if n > 1 and not (np.diff(doc_ids)[within[1:]] > 0).all():
        raise ValueError("doc_ids must be strictly increasing within a term")

    def _stream(vals: np.ndarray) -> tuple[bytes, np.ndarray]:
        buf = varint_encode(vals)
        lens = varint_lengths(vals)
        cum = np.concatenate([[0], np.cumsum(lens)])
        return buf, cum[bounds]          # byte offset at each term boundary

    doc_buf, doc_off = _stream(deltas)
    tf_buf, tf_off = _stream(tfs.astype(np.uint64))
    dl_buf, dl_off = _stream(dls.astype(np.uint64))

    # ---- block-max, all terms at once
    nblocks = (counts + block_size - 1) // block_size
    block_offsets = np.concatenate([[0], np.cumsum(nblocks)])
    total_blocks = int(block_offsets[-1])
    # start index of every block: term_start + j*block_size
    reps = np.repeat(term_starts, nblocks)
    intra = (np.arange(total_blocks) - np.repeat(block_offsets[:-1], nblocks))
    block_starts = reps + intra * block_size
    block_ends = np.minimum(block_starts + block_size, np.repeat(bounds[1:], nblocks))
    tfn = tf_norm(np.asarray(tfs), np.asarray(dls), avgdl, bm25)
    maxes = np.maximum.reduceat(tfn, block_starts)
    f32 = maxes.astype(np.float32)
    under = f32.astype(np.float64) < maxes
    if under.any():
        f32[under] = np.nextafter(f32[under], np.float32(np.inf))
    return {
        "df_chunk": counts.astype(np.int32),
        "doc_buf": doc_buf, "doc_off": doc_off,
        "tf_buf": tf_buf, "tf_off": tf_off,
        "dl_buf": dl_buf, "dl_off": dl_off,
        "bm_first_doc": doc_ids[block_starts],
        "bm_last_doc": doc_ids[block_ends - 1],
        "bm_max_tfn": f32,
        "block_offsets": block_offsets,
    }


def decode_posting_list(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_posting_list` -> (doc_ids, tfs, dls)."""
    n = int(row["df_chunk"])
    deltas = varint_decode(row["doc_bytes"], n)
    doc_ids = np.cumsum(deltas.astype(np.int64))
    tfs = varint_decode(row["tf_bytes"], n).astype(np.int32)
    dls = varint_decode(row["dl_bytes"], n).astype(np.int32)
    return doc_ids, tfs, dls


# ------------------------------------------------------------------ positions
def encode_position_streams(positions: np.ndarray,
                            posting_starts: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode MANY postings' token-position lists in one vectorized pass.

    ``positions`` is the concatenation of every posting's ascending token
    positions; ``posting_starts`` marks each posting's first value. Each
    posting's run is delta-encoded with a reset at its start and LEB128 is
    self-contained per value, so any posting's stream is a byte slice of
    the whole encoding — the same slicing property the doc/tf/dl streams
    rely on (:func:`encode_posting_block`).

    Returns ``(buf, offsets)`` with ``offsets[i]:offsets[i+1]`` delimiting
    posting *i*'s bytes (len = n_postings + 1).
    """
    n = positions.size
    m = posting_starts.size
    if n == 0:
        return b"", np.zeros(m + 1, dtype=np.int64)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[1:] = np.diff(positions).astype(np.uint64)
    deltas[posting_starts] = positions[posting_starts].astype(np.uint64)
    within = np.ones(n, dtype=bool)
    within[posting_starts] = False
    if n > 1 and not (np.diff(positions)[within[1:]] > 0).all():
        raise ValueError("positions must be strictly increasing within a posting")
    buf = varint_encode(deltas)
    lens = varint_lengths(deltas)
    cum = np.concatenate([[0], np.cumsum(lens)])
    bounds = np.concatenate([posting_starts, [n]])
    return buf, cum[bounds]


def decode_position_streams(buf: bytes | np.ndarray,
                            counts: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_position_streams` over a CONCATENATED byte
    stream: ``counts[i]`` values belong to posting *i* (= its tf). Returns
    the flat ascending-position array; posting *i*'s slice is
    ``[cumsum(counts)[i-1], cumsum(counts)[i])``. One :func:`varint_decode`
    call + one segmented cumsum — no per-posting Python loop."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    deltas = varint_decode(buf, total)
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    G = np.cumsum(deltas.astype(np.int64))
    bounds = np.cumsum(counts)
    run_base = np.concatenate([[0], G[bounds[:-1] - 1]]) if counts.size > 1 \
        else np.zeros(1, np.int64)
    # empty postings can't occur (tf >= 1), so bounds[:-1]-1 is always valid
    return G - np.repeat(run_base, counts)
