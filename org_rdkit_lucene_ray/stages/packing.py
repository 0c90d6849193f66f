"""Training-sequence packing offsets — the GPT-style data-prep step that
concatenates the tokenized corpus (in doc-id order) into fixed-length
training sequences, docs crossing sequence boundaries (Brown et al. 2020
§2.1 pack-and-split; T5's "pack" preprocessing).

The primitive underneath is a DISTRIBUTED ORDERED PREFIX SUM over per-doc
token counts — computed in two scale-shaped passes, never a global sort:

1. per-batch ``map_batches`` emits (doc_id, n_tokens) plus a dense range
   key ``doc_id // range_size``;
2. per-range token totals ride ONE tiny ``groupby(range)`` aggregate; the
   exclusive cumsum over the (few thousand at any corpus size, if
   ``range_size`` scales) range totals happens driver-side on a
   range-cardinality array;
3. a second ``map_batches`` re-derives each doc's global start offset
   row-locally: range base + intra-range exclusive cumsum (each range's
   docs are contiguous ids, so a batch can be completed with a pruned
   re-read — here ranges align with batches via the same deterministic
   reader order, and the fold is a per-group numpy cumsum inside
   ``groupby(range).map_groups``).

Everything is int64 arithmetic — bit-comparable against a SQL window-sum
oracle. Docs with zero tokens occupy no span and are dropped (they don't
advance the offset), mirroring the tokenizer's contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from org_rdkit_lucene_ray.functions.analyze import REGISTRY, tokenize_column


def packing_offsets(docs: rd.Dataset, *, seq_len: int = 512,
                    range_size: int = 4096, text_col: str = "text",
                    id_col: str = "doc_id",
                    analyzer: str = "standard") -> rd.Dataset:
    """-> (doc_id, n_tokens, start_token, seq_first, seq_last) per doc
    with >= 1 token, where ``start_token`` is the doc's offset in the
    packed token stream (doc-id order) and ``seq_first``/``seq_last`` the
    fixed-length training sequences it lands in."""
    cfg = REGISTRY[analyzer]
    rs = int(range_size)

    def counts_of(t: pa.Table) -> pa.Table:
        toks = tokenize_column(t[text_col].combine_chunks(), cfg)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "rng": pa.array(ids // rs, pa.int64()),
        })

    counts = docs.map_batches(counts_of, batch_format="pyarrow") \
        .materialize()   # two consumers below; avoid re-tokenizing

    # pass 1: per-range totals (tiny — range cardinality rows), exclusive
    # cumsum over them driver-side, broadcast
    totals = {r["rng"]: r["sum(n)"]
              for r in counts.groupby("rng").sum("n").take_all()}
    out_schema = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                            ("start_token", pa.int64()),
                            ("seq_first", pa.int64()),
                            ("seq_last", pa.int64())])
    if not totals or all(v == 0 for v in totals.values()):
        # nothing tokenized: short-circuit (Ray's sort-shuffle would emit
        # schemaless empty blocks and warn). NOTE Ray drops the schema of
        # ANY 0-row Dataset, so callers of an empty result see 0 rows but
        # no columns — the count contract, not the schema, is guaranteed.
        return rd.from_arrow(out_schema.empty_table())
    rngs = np.array(sorted(totals), np.int64)
    sums = np.array([totals[r] for r in rngs], np.int64)
    bases = np.concatenate([[0], np.cumsum(sums)[:-1]])
    base_ref = ray.put((rngs, bases))
    L = int(seq_len)

    # pass 2: intra-range exclusive cumsum (each group sorted by doc_id)
    def fold(g: pa.Table) -> pa.Table:
        rngs_b, bases_b = ray.get(base_ref)
        ids = g["doc_id"].to_numpy()
        n = g["n"].to_numpy()
        order = np.argsort(ids)
        ids, n = ids[order], n[order]
        base = int(bases_b[np.searchsorted(rngs_b, int(g["rng"][0].as_py()))])
        start = base + np.concatenate([[0], np.cumsum(n)[:-1]])
        keep = n > 0
        ids, n, start = ids[keep], n[keep], start[keep]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "start_token": pa.array(start, pa.int64()),
            "seq_first": pa.array(start // L, pa.int64()),
            "seq_last": pa.array((start + n - 1) // L, pa.int64()),
        })

    return counts.groupby("rng").map_groups(fold, batch_format="pyarrow")
