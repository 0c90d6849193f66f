"""Distributed k-means clustering over an embedding column (list<float>).

The training-data use case (SemDeDup / corpus bucketing / curriculum
sharding) needs cluster assignments over 10^9+ embedding rows. Lloyd's
algorithm maps onto Ray Data with ZERO shuffles: each iteration is one
``map_batches`` pass emitting per-cluster partial sums (count, sum-vector,
inertia — a few KB per block), folded on the driver, then the new centroid
matrix is re-broadcast via ``ray.put``. The per-iteration exchange volume is
O(k * dim * num_blocks) integers regardless of corpus size.

Determinism contract (what makes the DuckDB gate possible): embeddings are
quantized once with ``floor(x * 1024)`` — exact in IEEE arithmetic because
1024 is a power of two, so numpy-float64 and DuckDB agree bit-for-bit — and
every quantity that crosses an exchange (counts, sum-vectors, inertia,
centroids) is an int64. Integer addition is associative/commutative, so the
result is identical under ANY partitioning, batch order, or combine-tree
shape; the centroid update is integer floor division. Ties in the argmin go
to the lowest cluster id (numpy ``argmin`` first-match == SQL
``ORDER BY dist, cluster``).

Reference analog: the IVF coarse quantizer (`stages/ann.py:IVFIndex.train`)
runs Lloyd's on a driver-side SAMPLE; this module is the full-data
distributed variant a 100 TB curation pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

# power-of-two scale => x * QUANT is exact in float arithmetic and
# floor() matches DuckDB's CAST(floor(e*1024) AS BIGINT) bit-for-bit
QUANT = 1024


def quantized_matrix(batch: pa.Table, emb_col: str = "embedding") -> np.ndarray:
    """list<float> column -> (n, d) int64 matrix via exact floor(x*1024)."""
    arr = batch[emb_col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    q = np.floor(flat * QUANT).astype(np.int64)
    return q.reshape(len(arr), -1)


def _assign(Q: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Exact-integer nearest-centroid assignment, ties -> lowest cluster.

    argmin over ||q - c||^2 == argmin over (|c|^2 - 2 q.c): the |q|^2 term
    is constant per row, and every operand is int64, so there is no float
    summation-order wobble anywhere."""
    cn = np.einsum("kd,kd->k", C, C)            # |c|^2, int64
    S = cn[None, :] - 2 * (Q @ C.T)             # (n, k) int64
    return np.argmin(S, axis=1)


def _assign_partials(batch: pa.Table, *, cent_ref, id_col: str,
                     emb_col: str) -> pa.Table:
    """Map task: one batch -> <=k partial rows
    (cluster, n, sum_id, inertia, sum_vec list<int64>).

    The centroid matrix is ``ray.put`` once per iteration and resolved
    through the per-worker-process broadcast cache (the lm.py pattern) —
    never re-shipped per batch, and no per-iteration actor-pool startup
    (a fresh pool cost ~0.7-1.3 s per Lloyd's pass on this host)."""
    from org_rdkit_lucene_ray.stages.dedup import _bcast

    C = cent_ref if isinstance(cent_ref, np.ndarray) else _bcast(cent_ref)
    k, d = C.shape
    Q = quantized_matrix(batch, emb_col)
    ids = batch[id_col].to_numpy().astype(np.int64)
    a = _assign(Q, C)
    n = np.bincount(a, minlength=k).astype(np.int64)
    sum_id = np.zeros(k, np.int64)
    np.add.at(sum_id, a, ids)
    sum_vec = np.zeros((k, d), np.int64)
    np.add.at(sum_vec, a, Q)
    # exact int64 per-row distances for the inertia partial
    diff = Q - C[a]
    dist = np.einsum("nd,nd->n", diff, diff)
    inertia = np.zeros(k, np.int64)
    np.add.at(inertia, a, dist)
    live = np.flatnonzero(n)
    return pa.table({
        "cluster": pa.array(live.astype(np.int64), pa.int64()),
        "n": pa.array(n[live], pa.int64()),
        "sum_id": pa.array(sum_id[live], pa.int64()),
        "inertia": pa.array(inertia[live], pa.int64()),
        "sum_vec": pa.array(list(sum_vec[live]), pa.list_(pa.int64())),
    })


def _fold_partials(rows: pa.Table, k: int, d: int):
    """Driver fold of the tiny (<= k * num_blocks rows) partial table.

    Python-int accumulation for inertia (an int64 per-partial is exact, but
    the GLOBAL inertia of a 10^12-row corpus can pass 2^63)."""
    cl = rows["cluster"].to_numpy()
    n = np.zeros(k, np.int64)
    np.add.at(n, cl, rows["n"].to_numpy())
    sum_id = np.zeros(k, np.int64)
    np.add.at(sum_id, cl, rows["sum_id"].to_numpy())
    sv = rows["sum_vec"].combine_chunks()
    if isinstance(sv, pa.ChunkedArray):
        sv = sv.combine_chunks()
    flat = sv.values.to_numpy(zero_copy_only=False).reshape(len(sv), d)
    sum_vec = np.zeros((k, d), np.int64)
    np.add.at(sum_vec, cl, flat.astype(np.int64))
    inertia = sum(int(v) for v in rows["inertia"].to_pylist())
    return n, sum_id, sum_vec, inertia


_PARTIAL_SCHEMA = pa.schema([
    ("cluster", pa.int64()), ("n", pa.int64()), ("sum_id", pa.int64()),
    ("inertia", pa.int64()), ("sum_vec", pa.list_(pa.int64())),
])


def _run_pass(ds: rd.Dataset, centroids: np.ndarray, *, id_col: str,
              emb_col: str, concurrency: int | None):
    k, d = centroids.shape
    ref = ray.put(np.ascontiguousarray(centroids, dtype=np.int64))
    out = ds.map_batches(
        _assign_partials, fn_kwargs=dict(
            cent_ref=ref, id_col=id_col, emb_col=emb_col),
        batch_format="pyarrow",
        concurrency=concurrency,   # None = plain task pool (no pool startup)
    )
    tabs = [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    rows = pa.concat_tables(tabs) if tabs else _PARTIAL_SCHEMA.empty_table()
    return _fold_partials(rows, k, d)


def init_centroids(ds: rd.Dataset, k: int, *, id_col: str = "vec_id",
                   emb_col: str = "embedding") -> np.ndarray:
    """Deterministic init: the quantized vectors of the k smallest ids
    (partial per-block min-k, tiny driver merge — no sort shuffle)."""
    def block_min_k(t: pa.Table) -> pa.Table:
        t = t.select([id_col, emb_col])
        idx = pc.select_k_unstable(t, k=min(k, t.num_rows),
                                   sort_keys=[(id_col, "ascending")])
        return t.take(idx)

    rows = pa.concat_tables(
        [pa.table(b) for b in ds.map_batches(block_min_k,
                                             batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")])
    order = pc.sort_indices(rows, sort_keys=[(id_col, "ascending")])[:k]
    return quantized_matrix(rows.take(order), emb_col)


def kmeans_fit(ds: rd.Dataset, k: int = 8, iters: int = 8, *,
               id_col: str = "vec_id", emb_col: str = "embedding",
               concurrency: int | None = None) -> dict:
    """Full-data distributed Lloyd's. Returns
    ``{"centroids": (k,d) int64, "inertia": [int per pass],
    "profile": {"n", "sum_id"}}`` — profile arrays come from the LAST
    assignment pass (i.e. under the pre-update centroids); use
    :func:`kmeans_assign_profile` against ``centroids`` for the final
    assignment.

    The input is materialized ONCE (pruned to two columns) so the per-
    iteration pass re-reads object-store blocks, not parquet; at 100 TB the
    quantized column would be persisted instead (same dataflow)."""
    ds = ds.materialize()
    C = init_centroids(ds, k, id_col=id_col, emb_col=emb_col)
    inertia_log: list[int] = []
    n = sum_id = None
    for _ in range(iters):
        n, sum_id, sum_vec, inertia = _run_pass(
            ds, C, id_col=id_col, emb_col=emb_col, concurrency=concurrency)
        inertia_log.append(inertia)
        live = n > 0
        # empty clusters keep their previous centroid; update is exact
        # integer floor division (deterministic, no float mean)
        C = C.copy()
        C[live] = sum_vec[live] // n[live, None]
    return {"centroids": C, "inertia": inertia_log,
            "profile": {"n": n, "sum_id": sum_id}}


def kmeans_assign_column(ds: rd.Dataset, centroids: np.ndarray, *,
                         emb_col: str = "embedding",
                         out_col: str = "cluster",
                         concurrency: int | None = None) -> rd.Dataset:
    """Append each row's nearest-centroid id as an int64 column — the
    export step of curriculum/SemDeDup sharding (write the result with
    ``partition_cols=[out_col]``). Same broadcast + exact-integer argmin
    as the fit passes, so assignments are bit-identical to
    :func:`kmeans_assign_profile` under any partitioning."""
    ref = ray.put(np.ascontiguousarray(centroids, dtype=np.int64))

    def tag(batch: pa.Table) -> pa.Table:
        from org_rdkit_lucene_ray.stages.dedup import _bcast

        a = _assign(quantized_matrix(batch, emb_col), _bcast(ref))
        return batch.append_column(
            out_col, pa.array(a.astype(np.int64), pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow",
                          concurrency=concurrency)


def kmeans_assign_profile(ds: rd.Dataset, centroids: np.ndarray, *,
                          id_col: str = "vec_id",
                          emb_col: str = "embedding",
                          concurrency: int | None = None) -> pa.Table:
    """Single assignment step vs FIXED centroids -> per-cluster
    (cluster, n, sum_vec_id) table. All-integer, so SQL-oracle-able
    (the ``kmeans_assign`` gate)."""
    k, _ = centroids.shape
    n, sum_id, _, _ = _run_pass(ds, centroids, id_col=id_col,
                                emb_col=emb_col, concurrency=concurrency)
    live = np.flatnonzero(n)
    return pa.table({
        "cluster": pa.array(live.astype(np.int64), pa.int64()),
        "n": pa.array(n[live], pa.int64()),
        "sum_vec_id": pa.array(sum_id[live], pa.int64()),
    })
