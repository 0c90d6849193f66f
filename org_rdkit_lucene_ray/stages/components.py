"""Distributed connected components over a near-duplicate pair table.

The missing last step of every near-dedup pipeline (minhash / simhash /
embedding pairs -> keep/drop decisions): group the pair graph into
components and elect the min-id member of each component as its survivor.
The reference resolves duplicates pairwise at write time (last-write-wins
upsert, ``ChemicalIndex.java`` addMolecule path); a corpus-scale near-dup
pass needs the transitive closure instead.

Algorithm: alternating **large-star / small-star** (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce and
Beyond", SoCC 2014): provably converges to a forest of depth-1 stars
rooted at each component's minimum node id in O(log^2 n) rounds (2-3
rounds in practice for the clique/star graphs LSH emits).

Ray-Data shape (100 TB): each half-round is ONE hash-bucket exchange —
edges are bucketed by ``hash(key_node) % P`` and every bucket is processed
as a whole partition with numpy (lexsort + reduceat), NOT one group per
node: per-group Python overhead is the classic CC-on-MapReduce trap. The
edge set shrinks monotonically toward n-1 star edges, so later rounds ride
on much less data than round 1. Convergence is detected by an
order-independent 64-bit checksum + count of the canonical (big, small)
edge set — two cheap streaming passes over the materialized round output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

_C1 = np.uint64(0x9E3779B97F4A7C15)   # golden-ratio / Murmur-style mixers
_C2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _edge_schema() -> pa.Schema:
    return pa.schema([("u", pa.int64()), ("v", pa.int64())])


def _empty_edges() -> pa.Table:
    return _edge_schema().empty_table()


def _bucket_of(x: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic int64 hash-bucket (multiply-shift; ids may be dense,
    so a bare ``% P`` would correlate buckets with LSH clusters)."""
    with np.errstate(over="ignore"):
        h = (x.astype(np.int64, copy=False) ^ (x >> 7)) * np.int64(-7046029254386353131)
    return (h & np.int64(0x7FFFFFFF)) % np.int64(n_buckets)


def _dedup_sorted_rows(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Row-dedup of (u, v) already lexsorted by (u, v)."""
    if u.size == 0:
        return u, v
    keep = np.concatenate([[True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])])
    return u[keep], v[keep]


def _group_layout(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(group start offsets, per-row group index) for a sorted key array."""
    new = np.concatenate([[True], u[1:] != u[:-1]])
    starts = np.flatnonzero(new)
    gidx = np.cumsum(new) - 1
    return starts, gidx


def _large_star_part(g: pa.Table) -> pa.Table:
    """Large-star over one hash bucket of directed edges (u, v): for every
    node u in the bucket, connect each strictly-larger neighbor to
    ``m = min(N(u) ∪ {u})``. Vectorized over the whole partition."""
    u = g["u"].to_numpy(zero_copy_only=False)
    v = g["v"].to_numpy(zero_copy_only=False)
    if u.size == 0:
        return _empty_edges()
    order = np.lexsort((v, u))
    u, v = _dedup_sorted_rows(u[order], v[order])
    starts, gidx = _group_layout(u)
    m = np.minimum(v[starts], u[starts])   # v asc within group -> v[starts]=min
    mask = v > u
    return pa.table({"u": v[mask], "v": m[gidx[mask]]})


def _small_star_part(g: pa.Table) -> pa.Table:
    """Small-star over one hash bucket of (big, small)-oriented edges:
    for every node u, connect u and all its smaller neighbors to
    ``m = min(N(u))``."""
    u = g["u"].to_numpy(zero_copy_only=False)
    v = g["v"].to_numpy(zero_copy_only=False)
    if u.size == 0:
        return _empty_edges()
    order = np.lexsort((v, u))
    u, v = _dedup_sorted_rows(u[order], v[order])
    starts, gidx = _group_layout(u)
    m = v[starts]                          # all neighbors < u, v asc
    mg = m[gidx]
    mask = v != mg                         # smaller neighbors, minus m itself
    return pa.table({
        "u": np.concatenate([v[mask], u[starts]]),
        "v": np.concatenate([mg[mask], m]),
    })


def _bidir_bucketed(t: pa.Table, *, n_buckets: int) -> pa.Table:
    """Emit both directions of each edge, bucketed by the group key u."""
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    keep = u != v
    u, v = u[keep], v[keep]
    uu = np.concatenate([u, v])
    vv = np.concatenate([v, u])
    return pa.table({"u": uu, "v": vv, "bucket": _bucket_of(uu, n_buckets)})


def _orient_bucketed(t: pa.Table, *, n_buckets: int) -> pa.Table:
    """Orient each edge (max, min), bucketed by the max node."""
    a = t["u"].to_numpy(zero_copy_only=False)
    b = t["v"].to_numpy(zero_copy_only=False)
    keep = a != b
    a, b = a[keep], b[keep]
    big = np.maximum(a, b)
    small = np.minimum(a, b)
    return pa.table({"u": big, "v": small, "bucket": _bucket_of(big, n_buckets)})


def _checksum_batch(t: pa.Table) -> pa.Table:
    u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    h = (np.ascontiguousarray(u).view(np.uint64) * _C1) \
        ^ (np.ascontiguousarray(v).view(np.uint64) * _C2)
    s = int(h.sum(dtype=np.uint64))
    return pa.table({"chk": pa.array([s % (1 << 63)], pa.int64()),
                     "n": pa.array([len(u)], pa.int64())})


def _edge_signature(edges: rd.Dataset) -> tuple[int, int]:
    """(count, order-independent checksum) of an edge Dataset — tiny
    per-batch partials collected on the driver (one row per block)."""
    rows = edges.map_batches(_checksum_batch, batch_format="pyarrow").take_all()
    chk = 0
    n = 0
    for r in rows:
        chk = (chk + int(r["chk"])) % (1 << 63)
        n += int(r["n"])
    return n, chk


def connected_components(
    pairs: rd.Dataset | pa.Table,
    *,
    id_a: str = "a",
    id_b: str = "b",
    n_buckets: int = 16,
    max_rounds: int = 50,
) -> rd.Dataset:
    """Component labels for every node of an undirected pair graph.

    Returns a Dataset with columns ``doc_id`` (int64) and ``component_id``
    (int64, the minimum doc_id of the node's component). Docs absent from
    ``pairs`` (singletons) are the caller's to union in — they are their
    own component by definition, and the pair table never saw them.

    Survivor selection for dedup is then ``keep = doc_id == component_id``
    — the same min-id-wins rule the per-bucket SimHash star compression
    and exact dedup already use.

    Raises RuntimeError if the edge set has not reached its star-forest
    fixpoint after ``max_rounds`` alternations (log^2 n bound; 50 covers
    any realistic graph — hitting it means the input is pathological).
    """
    if isinstance(pairs, pa.Table):
        pairs = rd.from_arrow(pairs)
    edges = pairs.map_batches(
        lambda t: pa.table({
            "u": pa.array(t[id_a].to_numpy(zero_copy_only=False), pa.int64()),
            "v": pa.array(t[id_b].to_numpy(zero_copy_only=False), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    prev: tuple[int, int] | None = None
    for _ in range(max_rounds):
        ls = (
            edges.map_batches(_bidir_bucketed, batch_format="pyarrow",
                              fn_kwargs=dict(n_buckets=n_buckets))
            .groupby("bucket")
            .map_groups(_large_star_part, batch_format="pyarrow")
        )
        ss = (
            ls.map_batches(_orient_bucketed, batch_format="pyarrow",
                           fn_kwargs=dict(n_buckets=n_buckets))
            .groupby("bucket")
            .map_groups(_small_star_part, batch_format="pyarrow")
        )
        # materialize: the round output is consumed twice (signature +
        # next round / final labels) and the iteration needs a barrier.
        edges = ss.materialize()
        sig = _edge_signature(edges)
        if sig == prev or sig[0] == 0:
            break
        prev = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"(edge signature still changing: {prev} -> {sig}); the pair "
            "graph is pathological — check for self-loops fed in a loop or "
            "raise max_rounds")

    # Fixpoint edges are (child, root) stars; roots appear only on the v
    # side. Labels = child rows + one (root, root) row per distinct root
    # (distinct via a groupby over root rows only — component-count-sized).
    children = edges.map_batches(
        lambda t: pa.table({"doc_id": t["u"], "component_id": t["v"]}),
        batch_format="pyarrow",
    )
    roots = (
        edges.groupby("v").count()
        .map_batches(
            lambda t: pa.table({"doc_id": t["v"], "component_id": t["v"]}),
            batch_format="pyarrow",
        )
    )
    return children.union(roots)


def near_dedup(
    docs: rd.Dataset,
    *,
    pairs: pa.Table | rd.Dataset | None = None,
    method: str = "minhash",
    id_col: str = "doc_id",
    text_col: str = "text",
    **pair_kwargs,
) -> rd.Dataset:
    """End-to-end near-dedup: pair generation -> connected components ->
    keep each component's min-id member plus every unpaired doc.

    ``method`` picks the pair generator (``"minhash"`` | ``"simhash"``,
    both in :mod:`stages.dedup`; extra kwargs pass through), or supply a
    precomputed ``pairs`` table (columns ``a``, ``b``) to skip generation.

    Scale shape: the only driver-side materialization is the DROP-ID
    vector (8 B per duplicate doc — bounded by the duplicate count, not
    the corpus; the same operating regime as the minhash candidate list).
    It is ``ray.put`` once and each filter batch does a vectorized
    ``searchsorted`` membership test — the corpus itself streams through
    one ``map_batches`` with its storage partitioning intact (no shuffle,
    so the output stays resumable per input fragment). For corpora whose
    duplicate fraction makes even the id vector unwieldy, generate pairs
    per partition and run this per key-range instead.
    """
    import ray

    from org_rdkit_lucene_ray.stages.dedup import _bcast

    if pairs is None:
        if method == "minhash":
            from org_rdkit_lucene_ray.stages.dedup import minhash_dup_pairs

            pairs = minhash_dup_pairs(docs, id_col=id_col,
                                      text_col=text_col, **pair_kwargs)
        elif method == "simhash":
            from org_rdkit_lucene_ray.stages.dedup import simhash_dup_pairs

            pairs = simhash_dup_pairs(docs, id_col=id_col,
                                      text_col=text_col, **pair_kwargs)
        else:
            raise ValueError(f"unknown near_dedup method {method!r} "
                             "(expected 'minhash' or 'simhash')")
    labels = connected_components(pairs)

    def losers(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        c = t["component_id"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(d[d != c], pa.int64())})

    rows = labels.map_batches(losers, batch_format="pyarrow").take_all()
    drops = np.sort(np.asarray([r["doc_id"] for r in rows], dtype=np.int64))
    ref = ray.put(drops)

    def keep_batch(t: pa.Table) -> pa.Table:
        d = _bcast(ref)
        if d.size == 0:
            return t
        ids = t[id_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(d, ids)
        hit = (idx < d.size) & (d[np.minimum(idx, d.size - 1)] == ids)
        if not hit.any():
            return t
        return t.filter(pa.array(~hit))

    return docs.map_batches(keep_batch, batch_format="pyarrow")
