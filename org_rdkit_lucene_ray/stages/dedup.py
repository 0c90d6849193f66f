"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference's only dedup is exact upsert-by-PK (J6,
``ChemicalIndex.java:801``) — handled in the build pipeline. These stages add
the near-dup family a 100 TB training-data pipeline needs (task brief):

- exact content dedup: md5(text) -> hash-partitioned groupby -> keep min id
- MinHash + LSH: shingle -> minhash signature -> band buckets -> groupby ->
  candidate pairs -> exact-Jaccard verify
- SimHash: 64-bit weighted sign hash + 16-bit band buckets (Hamming<=3 safe)
- n-gram Jaccard: exact all-pairs similarity on a bounded slice (the oracle
  for the approximate methods)

Algorithms follow the public literature: MinHash resemblance sketches
(Broder, SEQUENCES 1997), LSH banding (Indyk & Motwani, STOC 1998 /
Leskovec-Rajaraman-Ullman ch.3), SimHash (Charikar, STOC 2002; Manku et
al., WWW 2007 for the Hamming-band trick).

Scale notes are inline: signatures/bands flow through ``groupby`` shuffles;
only verified-candidate handling assumes "near-dup pairs << corpus", the
standard LSH operating regime. Candidate counts are logged, never silently
capped. SimHash hot buckets (statistically homogeneous corpora concentrate
simhashes) are handled losslessly — identical-hash clusters compress to
star pairs, oversized distinct buckets refine by pigeonhole sub-banding —
and a per-bucket candidate ceiling turns the truly degenerate case (the
answer itself is quadratic) into an explicit, actionable error instead of
an object-store blowup.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from org_rdkit_lucene_ray.functions.analyze import REGISTRY, tokenize_column

logger = logging.getLogger(__name__)

_MERSENNE = (1 << 61) - 1


def auto_concurrency(cap: int = 8) -> int:
    """Actor-pool size leaving headroom for up/downstream stages: an actor
    pool sized to the WHOLE cluster starves the shuffle tasks behind it
    (observed deadlock on a 4-CPU local cluster with concurrency=4)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(1, min(cap, cpus - 2))


# --------------------------------------------------------------- exact dedup
def exact_dedup_groups(docs: rd.Dataset, *, text_col: str = "text",
                       id_col: str = "doc_id") -> rd.Dataset:
    """Exact content dedup -> one row per distinct content:
    ``(doc_id = min id of the group, n_copies)``.

    Shape: map_batches(md5 fingerprint — the content hash shuffles, never
    the full text; per-batch partial (fp, min-id, count) combine first) ->
    bucket fold: the exchange sorts on 64 int hash buckets, the real
    min/count merge is an Arrow hash-aggregate inside ``map_groups`` —
    never a global sort over the corpus-sized digest domain. Shuffle
    payload stays ~50 B/row regardless of document size."""

    def fingerprint_partial(t: pa.Table) -> pa.Table:
        from org_rdkit_lucene_ray.util import md5_hex_column

        fp = pa.table({"fp": md5_hex_column(t[text_col], null_value=""),
                       id_col: pc.cast(t[id_col], pa.int64())})
        g = fp.group_by("fp").aggregate([(id_col, "min"), ("fp", "count")])
        return pa.table({"fp": g["fp"],
                         "keep_id": g[f"{id_col}_min"],
                         "n": pc.cast(g["fp_count"], pa.int64())})

    from org_rdkit_lucene_ray.util import append_bucket_column

    def merge(g: pa.Table) -> pa.Table:
        gg = g.group_by("fp").aggregate([("keep_id", "min"), ("n", "sum")])
        return pa.table({
            id_col: pc.cast(gg["keep_id_min"], pa.int64()),
            "n_copies": pc.cast(gg["n_sum"], pa.int64()),
        })

    return (docs.map_batches(fingerprint_partial, batch_format="pyarrow")
                .map_batches(lambda t: append_bucket_column(t, "fp"),
                             batch_format="pyarrow")
                .groupby("_bkt")
                .map_groups(merge, batch_format="pyarrow"))


def _fnv1a_tokens(tokens: list[str]) -> np.ndarray:
    out = np.empty(len(tokens), dtype=np.uint64)
    B = np.uint64(1099511628211)
    with np.errstate(over="ignore"):     # FNV wraps mod 2^64 by design
        for i, tok in enumerate(tokens):
            h = np.uint64(14695981039346656037)
            for byte in tok.encode("utf-8"):
                h = (h ^ np.uint64(byte)) * B
            out[i] = h
    return out


def _shingle_hashes(tokens: list[str], shingle: int) -> np.ndarray:
    """Distinct hashed word-``shingle``-grams of one doc (uint64)."""
    if not tokens:
        return np.zeros(0, dtype=np.uint64)
    th = _fnv1a_tokens(tokens)
    if len(th) < shingle:
        grams = th.reshape(1, -1)
    else:
        grams = np.lib.stride_tricks.sliding_window_view(th, min(shingle, len(th)))
    B = np.uint64(1099511628211)
    acc = np.full(grams.shape[0], 14695981039346656037, dtype=np.uint64)
    for k in range(grams.shape[1]):
        acc = (acc * B) ^ grams[:, k]
    return np.unique(acc)


def _batch_shingles(toks: pa.ListArray, shingle: int) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch distinct shingle hashes -> (parents, hashes), both sorted
    by (parent, hash). Value-identical to calling :func:`_shingle_hashes`
    per doc (unit-tested), but fully vectorized: ONE FNV pass over the flat
    token column, one k-loop over gram positions per length class, one
    lexsort for the per-doc distinct — no per-document Python."""
    from org_rdkit_lucene_ray.pipelines.build import stable_term_hash

    flat = pc.list_flatten(toks)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    # hash the token DICTIONARY (vocab-sized), scatter through the indices
    # — same FNV-1a values as _fnv1a_tokens, ~vocab/occurrences less work
    enc = pc.dictionary_encode(flat)
    th = stable_term_hash(enc.dictionary)[
        enc.indices.to_numpy(zero_copy_only=False)]
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    B = np.uint64(1099511628211)
    OFF = np.uint64(14695981039346656037)
    parts_p, parts_h = [], []
    with np.errstate(over="ignore"):
        # docs with >= `shingle` tokens: every in-doc gram start position
        long_docs = np.flatnonzero(counts >= shingle)
        if long_docs.size:
            n_grams = counts[long_docs] - shingle + 1
            gram_doc = np.repeat(long_docs, n_grams)
            bounds = np.concatenate([[0], np.cumsum(n_grams)])
            intra = np.arange(bounds[-1]) - np.repeat(bounds[:-1], n_grams)
            gpos = starts[gram_doc] + intra
            acc = np.full(gpos.size, OFF, dtype=np.uint64)
            for k in range(shingle):
                acc = (acc * B) ^ th[gpos + k]
            parts_p.append(gram_doc)
            parts_h.append(acc)
        # shorter docs: ONE gram over the whole doc, per length class
        for L in range(1, shingle):
            sel = np.flatnonzero(counts == L)
            if not sel.size:
                continue
            acc = np.full(sel.size, OFF, dtype=np.uint64)
            for k in range(L):
                acc = (acc * B) ^ th[starts[sel] + k]
            parts_p.append(sel)
            parts_h.append(acc)
    if not parts_p:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    parents = np.concatenate(parts_p)
    hashes = np.concatenate(parts_h)
    order = np.lexsort((hashes, parents))
    parents, hashes = parents[order], hashes[order]
    keep = np.concatenate([[True], (parents[1:] != parents[:-1])
                           | (hashes[1:] != hashes[:-1])])
    return parents[keep], hashes[keep]


class MinHashStage:
    """Actor stage: docs batch -> LSH band rows (doc_id, band, band_hash).

    Permutation parameters are generated ONCE per actor in ``__init__``
    (seeded -> identical across actors/runs). Signature minima are computed
    with sorted-parent ``np.minimum.reduceat`` — vectorized across the whole
    batch, no per-shingle Python."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle: int = 3,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 13):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle = shingle
        self.text_col = text_col
        self.id_col = id_col
        self.cfg = REGISTRY["standard"]

    def signatures(self, texts: pa.Array) -> np.ndarray:
        """-> (n_docs, num_perm) uint64 signature matrix. Shingling is the
        whole-batch vectorized :func:`_batch_shingles`; minima via
        sorted-parent ``np.minimum.reduceat`` — no per-doc Python."""
        toks = tokenize_column(texts, self.cfg)
        n = len(toks)
        parents, flat = _batch_shingles(toks, self.shingle)
        sig = np.full((n, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        if not parents.size:
            return sig
        starts = np.flatnonzero(np.concatenate([[True], parents[1:] != parents[:-1]]))
        present = parents[starts]
        x = (flat % np.uint64(_MERSENNE)).astype(np.uint64)
        for p in range(self.num_perm):
            hp = (self.a[p] * x + self.b[p]) % np.uint64(_MERSENNE)
            sig[present, p] = np.minimum.reduceat(hp, starts)
        return sig

    def band_rows(self, ids: np.ndarray, sig: np.ndarray) -> pa.Table:
        n = sig.shape[0]
        r = self.rows_per_band
        B = np.uint64(1099511628211)
        band_ids, band_hashes, doc_ids = [], [], []
        for band in range(self.bands):
            chunk = sig[:, band * r:(band + 1) * r]
            acc = np.full(n, 14695981039346656037, dtype=np.uint64)
            for k in range(r):
                acc = (acc * B) ^ chunk[:, k]
            band_ids.append(np.full(n, band, dtype=np.int32))
            band_hashes.append(acc.astype(np.int64))
            doc_ids.append(ids)
        return pa.table({
            "band": pa.array(np.concatenate(band_ids), pa.int32()),
            "band_hash": pa.array(np.concatenate(band_hashes), pa.int64()),
            "doc_id": pa.array(np.concatenate(doc_ids), pa.int64()),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        sig = self.signatures(batch[self.text_col].combine_chunks())
        # docs with NO shingles (empty / non-tokenizable text) keep the all-max
        # sentinel signature; emitting band rows for them would bucket every
        # such doc together and "verify" at Jaccard 1.0 (empty∩empty). Skip.
        nonempty = ~(sig == np.iinfo(np.uint64).max).all(axis=1)
        return self.band_rows(ids[nonempty], sig[nonempty])


# task-fn wrappers with a per-worker-process stage cache: the sketch
# stages' state (seeded permutation params) is light, so Ray's warm worker
# processes beat a dedicated actor pool (~1-2s pool startup per run on
# this sandbox; the heavyweight-analyzer case can still use the classes
# directly as map_batches actor stages)
_STAGE_CACHE: dict[tuple, object] = {}


def _minhash_task(t: pa.Table, *, params: dict) -> pa.Table:
    key = ("minhash",) + tuple(sorted(params.items()))
    st = _STAGE_CACHE.get(key)
    if st is None:
        st = _STAGE_CACHE[key] = MinHashStage(**params)
    return st(t)


def _simhash_task(t: pa.Table, *, text_col: str) -> pa.Table:
    key = ("simhash", text_col)
    st = _STAGE_CACHE.get(key)
    if st is None:
        st = _STAGE_CACHE[key] = SimHashStage(text_col=text_col)
    return st(t)


_MAX_LSH_BUCKET = 20_000


def _pairs_of_group(group: pa.Table) -> pa.Table:
    ids = np.unique(group["doc_id"].to_numpy())
    if ids.size < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    if ids.size > _MAX_LSH_BUCKET:
        # a MinHash band bucket this large means huge identical-signature
        # clusters (mass exact/near-exact duplication): the candidate set
        # is quadratic by construction. Fail loudly with guidance rather
        # than silently flooding the object store.
        raise ValueError(
            f"LSH band bucket holds {ids.size:,} docs "
            f"(> {_MAX_LSH_BUCKET:,}): the corpus carries mass-duplicated "
            "content — run exact dedup first (exact_dedup_groups), then "
            "near-dup detection on the distinct survivors.")
    ii, jj = np.triu_indices(ids.size, k=1)
    return pa.table({"a": pa.array(ids[ii]), "b": pa.array(ids[jj])})


def _pairs_of_bucket_groups(g: pa.Table) -> pa.Table:
    """Multi-bucket variant of :func:`_pairs_of_group`: one 64-way hash
    bucket group holds MANY (band, band_hash) LSH buckets — segment by
    the composite key after one lexsort, emit each segment's triu pairs.
    Same per-bucket candidate ceiling, same output schema."""
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    if g.num_rows == 0:
        return empty
    band = g["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    bh = g["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((doc, bh, band))
    band, bh, doc = band[order], bh[order], doc[order]
    seg = np.concatenate(
        [[True], (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])])
    bounds = np.concatenate([np.flatnonzero(seg), [doc.size]])
    outs_a, outs_b = [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        ids = np.unique(doc[s:e])          # doc-sorted slice: cheap unique
        if ids.size < 2:
            continue
        if ids.size > _MAX_LSH_BUCKET:
            raise ValueError(
                f"LSH band bucket holds {ids.size:,} docs "
                f"(> {_MAX_LSH_BUCKET:,}): the corpus carries "
                "mass-duplicated content — run exact dedup first "
                "(exact_dedup_groups), then near-dup detection on the "
                "distinct survivors.")
        ii, jj = np.triu_indices(ids.size, k=1)
        outs_a.append(ids[ii])
        outs_b.append(ids[jj])
    if not outs_a:
        return empty
    return pa.table({"a": pa.array(np.concatenate(outs_a)),
                     "b": pa.array(np.concatenate(outs_b))})


def exact_jaccard(tokens_a: list[str], tokens_b: list[str], shingle: int = 3) -> float:
    sa = set(_shingle_hashes(tokens_a, shingle).tolist())
    sb = set(_shingle_hashes(tokens_b, shingle).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# per-worker-process cache of fetched broadcast objects (task-fn analog of
# fetching in an actor's __init__ — same object is never deserialized twice
# by one worker process)
_BCAST_CACHE: dict[str, object] = {}


def _bcast(ref):
    import ray

    key = ref.hex()
    obj = _BCAST_CACHE.get(key)
    if obj is None:
        if len(_BCAST_CACHE) >= 8:     # bound worker-process memory
            _BCAST_CACHE.clear()
        obj = _BCAST_CACHE[key] = ray.get(ref)
    return obj


def _distinct_pairs(pairs_ds: rd.Dataset) -> rd.Dataset:
    """Dedupe candidate pairs across bands: per-batch distinct combine,
    then a 64-int bucket exchange with the real (a, b) aggregation as an
    Arrow hash-aggregate inside map_groups — the shuffle moves ~24 B per
    per-batch-distinct pair, never document content, and never sorts the
    pair domain. MATERIALIZED: the result is the (small) candidate set,
    consumed twice (id collection + verify); without this the whole LSH
    chain would re-execute per consumer."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["a", "b"]).aggregate([("a", "count")])
        return pa.table({"a": g["a"], "b": g["b"],
                         "n": pc.cast(g["a_count"], pa.int64())})

    def with_bucket(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            bkt = ((a * np.uint64(0x9E3779B97F4A7C15) ^ b)
                   % np.uint64(64)).astype(np.int64)
        return t.append_column("_bkt", pa.array(bkt, pa.int64()))

    def merge(g: pa.Table) -> pa.Table:
        gg = g.drop_columns(["_bkt"]).group_by(["a", "b"]).aggregate(
            [("n", "sum")])
        return pa.table({"a": gg["a"], "b": gg["b"],
                         "n_bands": pc.cast(gg["n_sum"], pa.int64())})

    return (pairs_ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(with_bucket, batch_format="pyarrow")
            .groupby("_bkt")
            .map_groups(merge, batch_format="pyarrow")
            .materialize())


def _candidate_ids(pairs_ds: rd.Dataset) -> list[int]:
    """Distinct doc ids appearing in any candidate pair. The driver holds
    ONLY this int64 id list (the broadcast-small-side key set), bounded by
    2x the candidate count — the standard LSH operating regime
    (pairs << corpus). Document payloads never ride the driver."""
    def ids_of(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([t["a"].combine_chunks().cast(pa.int64()),
                                 t["b"].combine_chunks().cast(pa.int64())])
        return pa.table({"doc_id": pc.unique(both)})

    rows = pairs_ds.map_batches(ids_of, batch_format="pyarrow").take_all()
    return np.unique(np.asarray([r["doc_id"] for r in rows],
                                dtype=np.int64)).tolist()


def _pair_jaccard(sa: np.ndarray | None, sb: np.ndarray | None) -> float:
    """Exact Jaccard of two sorted-unique uint64 shingle sets; the single
    source of truth for BOTH verify paths. Missing set -> 0.0; both present
    but empty -> 1.0 (empty == empty)."""
    if sa is None or sb is None:
        return 0.0
    if sa.size == 0 and sb.size == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / (sa.size + sb.size - inter)


_ATTACH_SCHEMA = pa.schema([
    ("key", pa.int64()), ("other", pa.int64()), ("sh", pa.large_binary()),
])
_VERIFIED_SCHEMA = pa.schema([
    ("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64()),
])


def _verify_pairs_distributed(sh_ds: rd.Dataset, pairs_ds: rd.Dataset,
                              threshold: float) -> list[dict]:
    """Hash-partitioned shingle-set join + verify — NO driver LUT.

    The broadcast verify path materializes every candidate doc's shingle
    set on the driver; at web scale a boilerplate-heavy corpus can make
    that millions of docs x ~150 hashes (VERDICT r2 #2). Here the shingle
    payloads only ever move through two ``groupby(doc_id)`` exchanges:

    1. union(shingle rows keyed by doc, pair requests keyed by ``a``)
       -> groupby(key) -> attach ``sh_a`` to each request (a "join" by
       co-grouping — no experimental join operator, no aggregator actors);
    2. union(shingle rows, stage-1 rows keyed by ``b``) -> groupby(key)
       -> the group's own shingle row IS ``sh_b``: compute the exact
       Jaccard right there and emit only the verified ``(a, b, jaccard)``.

    Row kinds share one schema (``key:int64, other:int64, sh:binary``);
    a SHINGLE row is identified by ``other IS NULL`` (its ``sh`` may be an
    EMPTY blob but is never null), a request row by ``other`` set. The
    driver holds only the final verified pairs.

    Both exchanges ride the 64-int bucket sort (hash-partition by doc
    key; whole keys land in one bucket group) and each bucket group
    folds ALL its resident keys in one vectorized segmentation pass —
    the doc-id domain never reaches a Ray sort."""
    def reqs_a(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t["a"], pa.int64()),
            "other": pc.cast(t["b"], pa.int64()),
            "sh": pa.nulls(t.num_rows, pa.large_binary()),
        }, schema=_ATTACH_SCHEMA)

    def _segment(g: pa.Table):
        """-> (keys, is_sh, order, seg_id_sorted, sh_row_of_seg) over the
        bucket group; sh_row is -1 for keys with no shingle row."""
        keys = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_sh = pc.is_null(g["other"]).to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys_s = keys[order]
        seg_start = np.concatenate([[True], keys_s[1:] != keys_s[:-1]])
        seg_id = np.cumsum(seg_start) - 1
        n_seg = int(seg_id[-1]) + 1 if seg_id.size else 0
        sh_row = np.full(n_seg, -1, np.int64)
        sh_pos = np.flatnonzero(is_sh[order])
        sh_row[seg_id[sh_pos]] = order[sh_pos]
        return is_sh, order, seg_id, sh_row

    def attach_a(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _ATTACH_SCHEMA.empty_table()
        is_sh, order, seg_id, sh_row = _segment(g)
        req_pos = np.flatnonzero(~is_sh[order])
        if req_pos.size == 0:
            return _ATTACH_SCHEMA.empty_table()
        req_orig = order[req_pos]
        src = sh_row[seg_id[req_pos]]
        sh_a = g["sh"].take(pa.array(np.where(src >= 0, src, 0),
                                     mask=src < 0))
        take = pa.array(req_orig)
        # re-key by b; carry a in `other`, its shingles in `sh`
        return pa.table({
            "key": g["other"].take(take),
            "other": g["key"].take(take),
            "sh": sh_a.cast(pa.large_binary()),
        }, schema=_ATTACH_SCHEMA)

    def finish_b(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _VERIFIED_SCHEMA.empty_table()
        is_sh, order, seg_id, sh_row = _segment(g)
        req_pos = np.flatnonzero(~is_sh[order])
        if req_pos.size == 0:
            return _VERIFIED_SCHEMA.empty_table()
        sh_list = g["sh"].to_pylist()        # blob gather once per group
        keys = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        other = pc.fill_null(g["other"], -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        src = sh_row[seg_id[req_pos]]
        req_orig = order[req_pos]
        a_ids, b_ids, jacs = [], [], []
        for i, s in zip(req_orig, src):
            blob_a = sh_list[int(i)]
            sa = np.frombuffer(blob_a, np.uint64) if blob_a is not None \
                else None
            blob_b = sh_list[int(s)] if s >= 0 else None
            sb = np.frombuffer(blob_b, np.uint64) if blob_b is not None \
                else None
            j = _pair_jaccard(sa, sb)
            if j >= threshold:
                a_ids.append(int(other[int(i)]))
                b_ids.append(int(keys[int(i)]))
                jacs.append(float(np.round(j, 6)))   # np.round: bit-parity
                # with the broadcast path (Python round can differ 1 ulp)
        return pa.table({
            "a": pa.array(a_ids, pa.int64()),
            "b": pa.array(b_ids, pa.int64()),
            "jaccard": pa.array(jacs, pa.float64()),
        }, schema=_VERIFIED_SCHEMA)

    from org_rdkit_lucene_ray.util import append_bucket_column

    def bucketed(ds: rd.Dataset, fold) -> rd.Dataset:
        return (ds.map_batches(lambda t: append_bucket_column(t, "key"),
                               batch_format="pyarrow")
                .groupby("_bkt")
                .map_groups(lambda g: fold(g.drop_columns(["_bkt"])),
                            batch_format="pyarrow"))

    stage1 = (
        bucketed(sh_ds.union(pairs_ds.map_batches(
            reqs_a, batch_format="pyarrow")), attach_a)
        # barrier: stage 1 and stage 2 reuse sh_ds; materializing the small
        # (pair-count-bounded) intermediate avoids re-executing the shingle
        # scan twice AND the two-actor-chain starvation trap (r2 memory)
        .materialize()
    )
    return (
        bucketed(sh_ds.union(stage1), finish_b)
        .take_all()
    )


def minhash_dup_pairs(
    docs: rd.Dataset,
    *,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | None = None,
    broadcast_candidate_limit: int = 65_536,
) -> pa.Table:
    """Full MinHash-LSH near-dup pipeline -> verified pairs
    ``(a, b, jaccard)`` with a < b, jaccard >= threshold.

    Shape (everything distributed; the driver only ever holds the candidate
    ID LIST and the final result):

    1. map_batches(signatures) -> groupby(band, band_hash) -> per-bucket
       candidate pairs -> groupby(a, b) distinct;
    2. shingle sets of JUST the candidate docs computed by a filtered
       map_batches over the corpus (binary blobs of sorted uint64 hashes);
    3. exact-Jaccard verify over the pairs Dataset. Up to
       ``broadcast_candidate_limit`` candidate docs the shingle table is
       ``ray.put``-broadcast (one object fetch per worker — the fast path
       for the normal LSH regime where pairs << corpus); past it the
       verify switches to :func:`_verify_pairs_distributed`, a
       hash-partitioned co-group join that never materializes shingles on
       the driver (the 100 TB boilerplate-heavy-corpus path). Both paths
       share :func:`_pair_jaccard` and are equality-tested.
    Candidate volume is logged (no silent caps)."""
    import ray

    band_ds = docs.map_batches(
        _minhash_task,
        fn_kwargs=dict(params=dict(num_perm=num_perm, bands=bands,
                                   shingle=shingle, text_col=text_col,
                                   id_col=id_col)),
        batch_format="pyarrow",
    )
    from org_rdkit_lucene_ray.util import append_bucket_column

    pairs_ds = _distinct_pairs(
        band_ds.map_batches(lambda t: append_bucket_column(t, "band_hash"),
                            batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(lambda g: _pairs_of_bucket_groups(
            g.drop_columns(["_bkt"])), batch_format="pyarrow"))
    need = _candidate_ids(pairs_ds)
    logger.info("minhash-lsh: %d candidate docs in distinct pairs", len(need))
    empty = _VERIFIED_SCHEMA.empty_table()
    if not need:
        return empty

    need_arr = pa.array(need, pa.int64())

    def shingles_of(t: pa.Table) -> pa.Table:
        """Candidate docs -> (key=doc_id, other=null, sh=blob of the SORTED
        distinct shingle hashes as raw little-endian uint64 bytes)."""
        from org_rdkit_lucene_ray.pipelines.build import _binary_from_offsets

        t = t.filter(pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=need_arr))
        toks = tokenize_column(t[text_col].combine_chunks(), REGISTRY["standard"])
        parents, hashes = _batch_shingles(toks, shingle)
        counts = np.zeros(t.num_rows, dtype=np.int64)
        if parents.size:
            u, c = np.unique(parents, return_counts=True)
            counts[u] = c
        byte_offs = np.concatenate([[0], np.cumsum(counts)]) * 8
        # hashes are sorted within each doc (lexsort in _batch_shingles)
        blobs = _binary_from_offsets(
            np.ascontiguousarray(hashes).tobytes(), byte_offs).cast(pa.large_binary())
        return pa.table({
            "key": pc.cast(t[id_col], pa.int64()),
            "other": pa.nulls(t.num_rows, pa.int64()),
            "sh": blobs,
        }, schema=_ATTACH_SCHEMA)

    sh_ds = docs.map_batches(shingles_of, batch_format="pyarrow")

    if len(need) > broadcast_candidate_limit:
        verified = _verify_pairs_distributed(sh_ds, pairs_ds, threshold)
    else:
        sh_rows = sh_ds.take_all()   # bounded by broadcast_candidate_limit
        sh_ref = ray.put({int(r["key"]): np.frombuffer(r["sh"], np.uint64)
                          for r in sh_rows})

        def verify_jaccard(t: pa.Table) -> pa.Table:
            # task fn (Ray's warm worker processes + _BCAST_CACHE), not an
            # actor pool: a second pool's startup dominated small-corpus runs
            lut = _bcast(sh_ref)
            a = t["a"].to_numpy()
            b = t["b"].to_numpy()
            jac = np.empty(a.size, dtype=np.float64)
            for i in range(a.size):          # per PAIR (not per doc): sorted
                jac[i] = _pair_jaccard(lut.get(int(a[i])),  # uint64 intersect,
                                       lut.get(int(b[i])))  # vectorized per pair
            keep = jac >= threshold
            return pa.table({
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "jaccard": pa.array(np.round(jac[keep], 6), pa.float64()),
            }, schema=_VERIFIED_SCHEMA)

        verified = pairs_ds.map_batches(
            verify_jaccard, batch_format="pyarrow").take_all()
    if not verified:
        return empty
    out = pa.Table.from_pylist(verified).select(["a", "b", "jaccard"])
    out = out.cast(_VERIFIED_SCHEMA)
    order = pc.sort_indices(out, sort_keys=[("a", "ascending"), ("b", "ascending")])
    return out.take(order)


# ------------------------------------------------------------------- simhash
class SimHashStage:
    """64-bit SimHash per doc (token-instance weighted), vectorized
    BATCH-WIDE: dictionary-hashed token FNVs -> unpackbits over the whole
    flat token column -> per-doc bit sums via ``np.add.reduceat`` over the
    (sorted) parent runs — no per-document Python. Appends
    ``simhash:int64``; values identical to the r1 per-doc path."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.cfg = REGISTRY["standard"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from org_rdkit_lucene_ray.pipelines.build import stable_term_hash

        toks = tokenize_column(batch[self.text_col].combine_chunks(), self.cfg)
        out = np.zeros(batch.num_rows, dtype=np.uint64)
        flat = pc.list_flatten(toks)
        if len(flat):
            # token hashes come from the DICTIONARY (the former per-token
            # Python FNV was the hot cost); the per-doc bit voting stays a
            # small-slice loop — a batch-wide unpackbits would materialize
            # a 64x int64 blow-up of the token stream (measured pathological)
            enc = pc.dictionary_encode(flat)
            h = stable_term_hash(enc.dictionary)[
                enc.indices.to_numpy(zero_copy_only=False)]
            counts = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False).astype(np.int64)
            bounds = np.concatenate([[0], np.cumsum(counts)])
            for i in np.flatnonzero(counts > 0):
                hd = h[bounds[i]:bounds[i + 1]]
                bits = np.unpackbits(hd.view(np.uint8).reshape(-1, 8),
                                     axis=1, bitorder="little")
                votes = bits.astype(np.int64).sum(axis=0) * 2 - hd.size
                word = np.packbits((votes > 0).astype(np.uint8),
                                   bitorder="little")
                out[i] = word.view(np.uint64)[0]
        return batch.append_column("simhash", pa.array(out.astype(np.int64), pa.int64()))


def _per_band_segments(g: pa.Table, fold, *,
                       hash_col: str = "band_hash") -> pa.Table:
    """Run a single-(band, hash)-bucket fold over every LSH bucket
    resident in one 64-way hash bucket group: sort once by the composite
    key, slice per segment, concat the folds' (schema-stable) outputs.
    Lets complex per-bucket folds (simhash star-compression, the
    embedding-LSH pair generator) ride the 64-int exchange unchanged."""
    if g.num_rows == 0:
        return fold(g)
    order = pc.sort_indices(g, sort_keys=[("band", "ascending"),
                                          (hash_col, "ascending")])
    g = g.take(order)
    band = g["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    bh = g[hash_col].to_numpy(zero_copy_only=False).astype(np.int64)
    seg = np.concatenate(
        [[True], (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])])
    bounds = np.concatenate([np.flatnonzero(seg), [g.num_rows]])
    outs = [fold(g.slice(int(s), int(e - s)))
            for s, e in zip(bounds[:-1], bounds[1:])]
    return pa.concat_tables(outs)


def _simhash_group_pairs(group: pa.Table, *, max_hamming: int,
                         refine_threshold: int = 2048) -> pa.Table:
    """Candidate pairs of one band bucket, HOT-BUCKET SAFE.

    Small buckets -> all pairs (the vanilla LSH path). Oversized buckets
    (topically-homogeneous corpora concentrate simhashes; measured: a
    single 16-bit band bucket holding 120k of 400k docs => 7e9 naive
    pairs) are handled in two steps that lose no dedup information:

    1. IDENTICAL simhashes collapse to hamming-0 equivalence classes,
       emitted as STAR pairs (min id x each member): O(n) pairs encode
       the same keep/drop decision as the O(n^2) clique (logged, per the
       no-silent-caps policy); one representative per class continues.
    2. Distinct values still oversized are refined RECURSIVELY by
       sub-banding the not-yet-keyed bits: a pair clean in this band has
       <= max_hamming diffs in the remaining bits, so splitting them into
       ``max_hamming + 1`` sub-bands pigeonholes one clean sub-band —
       refinement finds every qualifying representative pair; distinct
       values guarantee the recursion makes progress."""
    if group.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    ids = group["doc_id"].to_numpy()
    h = group["simhash"].to_numpy().astype(np.uint64)
    band = int(group["band"][0].as_py())
    # bits already consumed by the top-level band key
    used = frozenset(band * 16 + k for k in range(16))
    budget = _PairBudget(_MAX_BUCKET_PAIRS)
    return _refine_pairs(ids, h, used, max_hamming, refine_threshold,
                         budget=budget)


# Per-bucket candidate ceiling: if ONE band bucket legitimately produces
# more candidate pairs than this, the corpus is DEGENERATE at the chosen
# max_hamming (near-everything is mutually near — the true answer is
# quadratic, e.g. statistically homogeneous synthetic text); filling the
# object store with the quadratic answer helps nobody, so fail loudly
# with guidance instead (explicit error, not a silent cap).
_MAX_BUCKET_PAIRS = 20_000_000


class _PairBudget:
    """Net candidate-pair accounting for one band bucket.

    ``spend`` charges pairs when they are MATERIALIZED (leaf all-pairs /
    star pairs — that is what bounds task memory); ``refund`` returns the
    duplicates removed by each :func:`_dedupe_pairs` pass, so the net
    charge converges to the bucket's DISTINCT pair count. Without the
    refund, a pair clean in several of the ``max_hamming + 1`` pigeonhole
    sub-bands would be charged once per sub-band and the ceiling could
    fire ~(max_hamming+1)x early on corpora whose true distinct-pair count
    is well under it."""

    __slots__ = ("left",)

    def __init__(self, n: int):
        self.left = n

    def spend(self, n: int) -> None:
        self.left -= n
        if self.left < 0:
            raise ValueError(
                "simhash candidate pairs exceed the per-bucket ceiling "
                f"({_MAX_BUCKET_PAIRS:,}): at this max_hamming the corpus is "
                "dominated by mutually-near documents (the true pair set is "
                "quadratic). Run exact dedup first, lower max_hamming, or "
                "switch to a cluster-representative output.")

    def refund(self, n: int) -> None:
        self.left += n


_EMPTY_PAIRS = None


def _empty_pairs() -> pa.Table:
    return pa.table({"a": pa.array([], pa.int64()),
                     "b": pa.array([], pa.int64())})


def _dedupe_pairs(parts: list[pa.Table],
                  budget: "_PairBudget | None" = None) -> pa.Table:
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return _empty_pairs()
    out = pa.concat_tables(parts)
    a = out["a"].to_numpy()
    b = out["b"].to_numpy()
    o = np.lexsort((b, a))
    a, b = a[o], b[o]
    keep = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    n_out = int(keep.sum())
    if budget is not None:
        budget.refund(a.size - n_out)   # net charge = distinct pairs
    return pa.table({"a": pa.array(a[keep], pa.int64()),
                     "b": pa.array(b[keep], pa.int64())})


def _refine_pairs(ids: np.ndarray, h: np.ndarray, used_bits: frozenset,
                  max_hamming: int, refine_threshold: int,
                  budget: "_PairBudget | None" = None) -> pa.Table:
    ids = np.asarray(ids)
    order = np.argsort(ids)
    ids, h = ids[order], h[order]
    # dedupe doc ids (defensive; upstream emits one row per doc per band)
    keep = np.concatenate([[True], ids[1:] != ids[:-1]]) if ids.size else \
        np.zeros(0, bool)
    ids, h = ids[keep], h[keep]
    n = ids.size
    if n < 2:
        return _empty_pairs()
    if n <= refine_threshold:
        ii, jj = np.triu_indices(n, k=1)
        if budget is not None:
            budget.spend(ii.size)
        return pa.table({"a": pa.array(ids[ii], pa.int64()),
                         "b": pa.array(ids[jj], pa.int64())})
    # 1. collapse IDENTICAL hashes: hamming-0 clusters are equivalence
    #    classes -> star pairs (min id x members) + one representative each
    o = np.lexsort((ids, h))
    hs, is_ = h[o], ids[o]
    first = np.concatenate([[True], hs[1:] != hs[:-1]])
    cluster_of = np.cumsum(first) - 1
    rep_ids = is_[first]                    # min id per cluster (ids asc per h)
    parts = []
    multi = np.flatnonzero(np.bincount(cluster_of) > 1)
    if multi.size:
        mask = np.isin(cluster_of, multi) & ~first
        stars_a = rep_ids[cluster_of[mask]]
        stars_b = is_[mask]
        if budget is not None:
            budget.spend(stars_a.size)
        parts.append(pa.table({"a": pa.array(stars_a, pa.int64()),
                               "b": pa.array(stars_b, pa.int64())}))
        logger.info("simhash: %d identical-hash clusters (largest %d) -> star pairs",
                    multi.size, int(np.bincount(cluster_of).max()))
    rep_h = hs[first]
    m = rep_ids.size
    if m < 2:
        return _dedupe_pairs(parts, budget)
    if m <= refine_threshold:
        so = np.argsort(rep_ids)
        rid = rep_ids[so]
        ii, jj = np.triu_indices(m, k=1)
        if budget is not None:
            budget.spend(ii.size)
        parts.append(pa.table({"a": pa.array(rid[ii], pa.int64()),
                               "b": pa.array(rid[jj], pa.int64())}))
        return _dedupe_pairs(parts, budget)
    # 2. DISTINCT values still oversized: pigeonhole sub-banding over the
    #    not-yet-keyed bits (any clean pair has a clean sub-band).
    #    Distinct values guarantee progress: some sub-band splits them.
    free = [b for b in range(64) if b not in used_bits]
    if not free:                           # unreachable for distinct values
        so = np.argsort(rep_ids)
        rid = rep_ids[so]
        ii, jj = np.triu_indices(m, k=1)
        if budget is not None:
            budget.spend(ii.size)
        parts.append(pa.table({"a": pa.array(rid[ii], pa.int64()),
                               "b": pa.array(rid[jj], pa.int64())}))
        return _dedupe_pairs(parts, budget)
    n_sub = max_hamming + 1
    sub_size = (len(free) + n_sub - 1) // n_sub
    for s in range(n_sub):
        bits = free[s * sub_size:(s + 1) * sub_size]
        if not bits:
            continue
        key = np.zeros(m, dtype=np.uint64)
        for k, b in enumerate(bits):
            key |= ((rep_h >> np.uint64(b)) & np.uint64(1)) << np.uint64(k)
        ko = np.argsort(key, kind="stable")
        ks = key[ko]
        bstarts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
        bounds = np.concatenate([bstarts, [m]])
        for i in range(bstarts.size):
            sel = ko[bounds[i]:bounds[i + 1]]
            if sel.size < 2:
                continue
            parts.append(_refine_pairs(
                rep_ids[sel], rep_h[sel], used_bits | frozenset(bits),
                max_hamming, refine_threshold, budget=budget))
    return _dedupe_pairs(parts, budget)


def simhash_dup_pairs(docs: rd.Dataset, *, max_hamming: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      concurrency: int | None = None) -> pa.Table:
    """SimHash near-dup pairs: 4 x 16-bit band buckets (pigeonhole-complete
    for Hamming distance <= 3) -> groupby bucket -> hot-bucket-safe
    candidate pairs (:func:`_simhash_group_pairs`) -> verify Hamming.

    OUTPUT CONTRACT (hot buckets): on corpora where one band bucket exceeds
    the refine threshold, identical-simhash cliques are STAR-COMPRESSED —
    each hamming-0 equivalence class emits (min-id x member) pairs instead
    of its full O(n^2) clique, and only the class representative continues
    into sub-band refinement. The pair set is therefore equivalent to the
    exhaustive answer for connected-component keep/drop decisions (same
    components, same min-id survivors — the dedup use case), but NOT a
    verbatim pair list: a qualifying pair between a non-representative
    clique member and a doc outside its clique is represented transitively
    through the representative, and the exact pairs emitted can depend on
    how buckets split. Exact-pair consumers should run on corpora below
    the refine threshold (small buckets take the vanilla all-pairs path,
    which IS exhaustive) or use :func:`jaccard_pairs_exact`-style oracles.
    Truly degenerate buckets (distinct-pair count past a 20M ceiling,
    net-counted after dedup) raise with guidance instead of flooding the
    object store."""
    # materialized: (id, simhash) is 16 B/doc and is consumed twice (band
    # chain + candidate LUT); at cluster scale this would be written
    # hash-partitioned to Parquet instead — same two consumers
    sig = docs.map_batches(
        _simhash_task, fn_kwargs=dict(text_col=text_col),
        batch_format="pyarrow",
    ).select_columns([id_col, "simhash"]).materialize()

    def to_bands(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy().astype(np.uint64)
        ids = t[id_col].to_numpy()
        parts = []
        for band in range(4):
            key = ((h >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(pa.table({
                "band": pa.array(np.full(len(ids), band, dtype=np.int32)),
                "band_hash": pa.array(key),
                "doc_id": pa.array(ids, pa.int64()),
                "simhash": t["simhash"],
            }))
        return pa.concat_tables(parts)

    import functools

    import ray

    from org_rdkit_lucene_ray.util import append_bucket_column

    fold = functools.partial(_simhash_group_pairs, max_hamming=max_hamming)
    pairs_ds = _distinct_pairs(
        sig.map_batches(to_bands, batch_format="pyarrow")
        .map_batches(lambda t: append_bucket_column(t, "band_hash"),
                     batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(lambda g: _per_band_segments(
            g.drop_columns(["_bkt"]), fold), batch_format="pyarrow"))
    need = _candidate_ids(pairs_ds)
    logger.info("simhash: %d candidate docs in distinct pairs", len(need))
    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int32())})
    if not need:
        return empty
    # broadcast the (tiny: 16 B/candidate) id -> simhash LUT; verify the
    # Hamming distance INSIDE map_batches over the pairs Dataset (vectorized
    # popcount via uint8 bit_count), never on the driver
    need_arr = pa.array(need, pa.int64())
    lut_rows = sig.map_batches(
        lambda t: t.filter(pc.is_in(pc.cast(t[id_col], pa.int64()),
                                    value_set=need_arr)),
        batch_format="pyarrow",
    ).take_all()
    # stored simhash is the int64 VIEW of the uint64 hash; reinterpret the
    # bits (np.uint64(negative int) is deprecated and will raise on future
    # numpy)
    lut_hashes = np.array([r["simhash"] for r in lut_rows],
                          np.int64).view(np.uint64)
    lut_ref = ray.put({int(r[id_col]): h
                       for r, h in zip(lut_rows, lut_hashes)})

    def verify_hamming(t: pa.Table) -> pa.Table:
        lut = _bcast(lut_ref)
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        ha = np.array([lut[int(x)] for x in a], dtype=np.uint64)
        hb = np.array([lut[int(x)] for x in b], dtype=np.uint64)
        x = (ha ^ hb).view(np.uint8).reshape(-1, 8)
        dist = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int32)
        keep = dist <= max_hamming
        return pa.table({
            "a": pa.array(a[keep], pa.int64()),
            "b": pa.array(b[keep], pa.int64()),
            "hamming": pa.array(dist[keep], pa.int32()),
        })

    verified = pairs_ds.map_batches(
        verify_hamming, batch_format="pyarrow").take_all()
    if not verified:
        return empty
    out = pa.Table.from_pylist(verified).select(["a", "b", "hamming"])
    out = pa.table({"a": pc.cast(out["a"], pa.int64()),
                    "b": pc.cast(out["b"], pa.int64()),
                    "hamming": pc.cast(out["hamming"], pa.int32())})
    order = pc.sort_indices(out, sort_keys=[("a", "ascending"), ("b", "ascending")])
    return out.take(order)


# ------------------------------------------------------- exact jaccard oracle
def jaccard_pairs_exact(docs_tbl: pa.Table, *, threshold: float,
                        text_col: str = "text", id_col: str = "doc_id",
                        use_shingles: bool = False, shingle: int = 3) -> pa.Table:
    """Exact all-pairs Jaccard over a BOUNDED slice via a dense incidence
    matrix (vocab x docs boolean matmul — one numpy op, no pair loop).
    With ``use_shingles=False`` the sets are distinct tokens (the
    SQL-expressible variant the driver oracle checks)."""
    cfg = REGISTRY["standard"]
    toks = tokenize_column(docs_tbl[text_col].combine_chunks(), cfg).to_pylist()
    ids = docs_tbl[id_col].to_numpy()
    sets = [
        set(_shingle_hashes(d, shingle).tolist()) if use_shingles else set(d)
        for d in toks
    ]
    vocab = {v: i for i, v in enumerate(sorted(set().union(*sets)))} if sets else {}
    inc = np.zeros((len(sets), len(vocab)), dtype=np.float32)
    for i, s in enumerate(sets):
        for v in s:
            inc[i, vocab[v]] = 1.0
    inter = inc @ inc.T
    sizes = inc.sum(axis=1)
    union = sizes[:, None] + sizes[None, :] - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        jac = np.where(union > 0, inter / union, 1.0)
    ii, jj = np.triu_indices(len(sets), k=1)
    keep = jac[ii, jj] >= threshold
    order = np.lexsort((ids[jj][keep], ids[ii][keep]))
    return pa.table({
        "a": pa.array(ids[ii][keep][order], pa.int64()),
        "b": pa.array(ids[jj][keep][order], pa.int64()),
        "jaccard": pa.array(np.round(jac[ii, jj][keep][order].astype(np.float64), 6)),
    })


# ------------------------------------------------------- paragraph-level dedup
_PARA_IDX_BITS = 20       # packed = doc_id << 20 | idx  (<= 1M paras per doc)


def paragraph_dedup_stats(docs: rd.Dataset, *, text_col: str = "text",
                          id_col: str = "doc_id", sep: str = "\n") -> rd.Dataset:
    """CCNet-style paragraph-level exact dedup -> per-doc keep stats.

    The corpus-wide rule (Wenzek et al. 2020 §3.1): a paragraph occurrence
    survives iff it is the globally FIRST occurrence of its content, first
    = minimum (doc_id, idx). Output: ``(doc_id, n_paras, n_kept)`` — one row
    per doc with at least one non-empty paragraph; ``n_paras - n_kept`` is
    the doc's boilerplate mass, the quantity CCNet thresholds on.

    Scale shape: paragraphs are fingerprinted in ``map_batches`` and only
    ``(md5-as-2xint64, packed-position)`` rows (~28 B, all numeric) ever
    ride a shuffle — text never does. Both wide steps are 64-way
    hash-bucket ``groupby(bucket).map_groups`` exchanges whose bodies are
    one numpy lexsort + run-length reduce per bucket (a fingerprint lives
    in exactly one fp bucket, a doc in exactly one doc bucket) — NOT
    whole-key-sorted Ray aggregates, which measured 70 s apiece on an
    8M-paragraph corpus vs ~4 s for the bucket fold. The occurrence table
    is materialized because it has two consumers (winners + totals); at
    cluster scale it would be written hash-partitioned to Parquet once
    and read twice — same two consumers, same row size.

    Reference analog: the upsert anti-join's first-wins discipline (J6,
    ``ChemicalIndex.java:801``) applied at paragraph granularity.
    """
    shift = np.int64(1 << _PARA_IDX_BITS)
    mult = np.uint64(0x9E3779B97F4A7C15)
    bshift = np.uint64(64 - 6)          # 64 buckets per exchange

    def _doc_bucket(d: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            return ((d.view(np.uint64) * mult) >> bshift).astype(np.int32)

    def occurrences(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        paras = pc.split_pattern(t[text_col].combine_chunks(), sep)
        flat = pc.list_flatten(paras)
        parents = pc.list_parent_indices(paras).to_numpy(zero_copy_only=False)
        # paragraph index within the doc BEFORE dropping empties (a CCNet
        # occurrence position is its line number, not its dense rank)
        starts = np.concatenate([
            [0], np.cumsum(pc.list_value_length(paras).to_numpy(
                zero_copy_only=False).astype(np.int64))[:-1]])
        idx = np.arange(len(flat), dtype=np.int64) - starts[parents]
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, parents, idx = flat.filter(pa.array(keep)), parents[keep], idx[keep]
        if idx.size and int(idx.max()) >= (1 << _PARA_IDX_BITS):
            raise ValueError(
                f"doc exceeds {1 << _PARA_IDX_BITS:,} paragraphs; raise "
                "_PARA_IDX_BITS (packed-position layout)")
        from org_rdkit_lucene_ray.util import md5_digest64_column

        dd = md5_digest64_column(flat)
        return pa.table({
            "b": pa.array((dd[:, 0].view(np.uint64) >> bshift)
                          .astype(np.int32)),
            "d1": pa.array(dd[:, 0], pa.int64()),
            "d2": pa.array(dd[:, 1], pa.int64()),
            "packed": pa.array(ids[parents] * shift + idx, pa.int64()),
        })

    occ = docs.map_batches(occurrences, batch_format="pyarrow").materialize()

    def win_fold(g: pa.Table) -> pa.Table:
        """Min packed per fingerprint within one fp bucket, pre-reduced to
        per-doc kept counts (the downstream exchange never sees winners)."""
        d1 = g["d1"].to_numpy(zero_copy_only=False)
        d2 = g["d2"].to_numpy(zero_copy_only=False)
        packed = g["packed"].to_numpy(zero_copy_only=False)
        o = np.lexsort((packed, d2, d1))
        sd1, sd2, sp = d1[o], d2[o], packed[o]
        first = np.zeros(sd1.size, bool)
        if first.size:
            first[0] = True
            first[1:] = (sd1[1:] != sd1[:-1]) | (sd2[1:] != sd2[:-1])
        w = sp[first] >> _PARA_IDX_BITS
        uniq, cnt = np.unique(w, return_counts=True)
        return pa.table({id_col: pa.array(uniq, pa.int64()),
                         "k": pa.array(cnt.astype(np.int64)),
                         "b2": pa.array(_doc_bucket(uniq))})

    def kept_fold(g: pa.Table) -> pa.Table:
        """Sum per-fp-bucket kept counts into one row per doc."""
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        k = g["k"].to_numpy(zero_copy_only=False)
        o = np.argsort(ids, kind="stable")
        si, sk = ids[o], k[o]
        first = np.zeros(si.size, bool)
        if first.size:
            first[0] = True
            first[1:] = si[1:] != si[:-1]
        starts = np.flatnonzero(first)
        return pa.table({
            id_col: pa.array(si[starts], pa.int64()),
            "k": pa.array(np.add.reduceat(sk, starts)
                          if starts.size else np.zeros(0, np.int64)),
            "p": pa.array(np.zeros(starts.size, np.int64)),
            "b3": pa.array(_doc_bucket(si[starts])),
        })

    def total_rows(t: pa.Table) -> pa.Table:
        # each doc's paragraphs live in exactly ONE batch, so this is
        # already one complete row per doc — no exchange needed
        d = t["packed"].to_numpy(zero_copy_only=False).astype(np.int64) \
            >> _PARA_IDX_BITS
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table({id_col: pa.array(uniq, pa.int64()),
                         "k": pa.array(np.zeros(uniq.size, np.int64)),
                         "p": pa.array(cnt.astype(np.int64)),
                         "b3": pa.array(_doc_bucket(uniq))})

    kept = (occ.groupby("b").map_groups(win_fold, batch_format="pyarrow")
            .groupby("b2").map_groups(kept_fold, batch_format="pyarrow"))
    # kept + totals are both one-row-per-doc now: the closing exchange
    # rides ~2 rows/doc, not one row per (doc, fp-bucket) pair
    unioned = kept.union(occ.map_batches(total_rows, batch_format="pyarrow"))

    def final_fold(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        k = g["k"].to_numpy(zero_copy_only=False)
        p = g["p"].to_numpy(zero_copy_only=False)
        o = np.argsort(ids, kind="stable")
        si, sk, sp = ids[o], k[o], p[o]
        first = np.zeros(si.size, bool)
        if first.size:
            first[0] = True
            first[1:] = si[1:] != si[:-1]
        starts = np.flatnonzero(first)
        return pa.table({
            id_col: pa.array(si[starts], pa.int64()),
            "n_paras": pa.array(np.add.reduceat(sp, starts)
                                if starts.size else np.zeros(0, np.int64)),
            "n_kept": pa.array(np.add.reduceat(sk, starts)
                               if starts.size else np.zeros(0, np.int64)),
        })

    # output row order is unspecified (hash-bucket-major); consumers
    # needing doc order sort the (one-row-per-doc) result
    return unioned.groupby("b3").map_groups(final_fold,
                                            batch_format="pyarrow")


# -------------------------------------------------- duplicate-substring spans
def duplicate_span_stats(docs: rd.Dataset, *, k: int = 5,
                         text_col: str = "text", id_col: str = "doc_id",
                         n_buckets: int | None = None) -> rd.Dataset:
    """Duplicate-substring detection — the k-gram approximation of
    suffix-array substring dedup (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better"): a token position is *duplicated*
    when it is covered by a ``k``-token gram that occurs >= 2 times
    anywhere in the corpus. Output, per doc with at least one duplicated
    gram: ``(doc_id, n_tokens, dup_grams, covered_tokens)`` where
    ``covered_tokens`` is the union length of the duplicated [pos, pos+k)
    intervals — the mass Lee et al. cut out.

    Shape: two bucket-keyed exchanges with BOUNDED group counts (the
    ``groupby(bucket).map_groups`` bodies are fully vectorized — sort +
    run-length inside one bucket, never per-gram Python):

    1. gram occurrences -> ``groupby(gram-hash bucket)``: run-length mark
       grams with global count >= 2. Gram identity is a 128-bit NUMERIC
       key — two independent 64-bit polynomial folds over the per-token
       FNV hashes (the gram string is never built): expected collisions
       over G grams ~ G^2/2^129, i.e. astronomically unlikely to perturb a
       count (a corpus-wide string exchange measured 2.5x slower end to
       end for strictly bit-equal verdicts absent such a collision);
    2. duplicated occurrences -> ``groupby(doc-id bucket)``: per-doc
       fixed-length interval union via lexsort + clipped deltas.
    """
    from org_rdkit_lucene_ray.functions.analyze import _list_counts_offsets
    from org_rdkit_lucene_ray.pipelines.build import stable_term_hash
    from org_rdkit_lucene_ray.util import fold_buckets

    n_buckets = fold_buckets(n_buckets)
    cfg = REGISTRY["standard"]
    out_schema = pa.schema([(id_col, pa.int64()), ("n_tokens", pa.int64()),
                            ("dup_grams", pa.int64()),
                            ("covered_tokens", pa.int64())])
    B1 = np.uint64(1099511628211)
    B2 = np.uint64(0xC2B2AE3D27D4EB4F)

    def _mix64(h: np.ndarray) -> np.ndarray:
        """splitmix64 finalizer — the pointwise-independent second token
        hash feeding the second fold."""
        h = h.copy()
        with np.errstate(over="ignore"):
            h ^= h >> np.uint64(30)
            h *= np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(27)
            h *= np.uint64(0x94D049BB133111EB)
            h ^= h >> np.uint64(31)
        return h

    def occurrences(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = tokenize_column(t[text_col].combine_chunks(), cfg)
        flat = pc.list_flatten(toks)
        counts, starts = _list_counts_offsets(toks)
        n_grams = np.maximum(counts - k + 1, 0)
        total = int(n_grams.sum())
        if total == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "dl": pa.array([], pa.int64())})
        gram_doc = np.repeat(np.arange(len(counts)), n_grams)
        bounds = np.concatenate([[0], np.cumsum(n_grams)])
        pos = np.arange(total, dtype=np.int64) - np.repeat(bounds[:-1],
                                                           n_grams)
        gpos = starts[gram_doc] + pos
        enc = pc.dictionary_encode(flat)
        th = stable_term_hash(enc.dictionary)[
            enc.indices.to_numpy(zero_copy_only=False)]
        th2 = _mix64(th)
        h1 = np.full(total, B2, np.uint64)      # distinct nonzero seeds
        h2 = np.full(total, B1, np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                h1 = (h1 * B1) ^ th[gpos + j]
                h2 = (h2 * B2) ^ th2[gpos + j]
        return pa.table({
            "bucket": pa.array((h1 % np.uint64(n_buckets)).astype(np.int64)),
            "h1": pa.array(h1.view(np.int64), pa.int64()),
            "h2": pa.array(h2.view(np.int64), pa.int64()),
            id_col: pa.array(ids[gram_doc]),
            "pos": pa.array(pos),
            "dl": pa.array(counts[gram_doc].astype(np.int64)),
        })

    def mark_dups(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "dl": pa.array([], pa.int64()),
                             "b2": pa.array([], pa.int64())})
        h1 = g["h1"].to_numpy(zero_copy_only=False)
        h2 = g["h2"].to_numpy(zero_copy_only=False)
        o = np.lexsort((h2, h1))
        s1, s2 = h1[o], h2[o]
        same = np.zeros(s1.size, bool)
        if s1.size > 1:
            same[1:] = (s1[1:] == s1[:-1]) & (s2[1:] == s2[:-1])
        # run codes -> run sizes -> keep rows in runs of size >= 2
        codes = np.cumsum(~same) - 1
        sizes = np.bincount(codes)
        keep = np.zeros(s1.size, bool)
        keep[o] = sizes[codes] >= 2
        kept = g.filter(pa.array(keep))
        d = kept[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: kept[id_col],
            "pos": kept["pos"],
            "dl": kept["dl"],
            "b2": pa.array(d % n_buckets),
        })

    def cover(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        d = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        p = g["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = g["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((p, d))
        d, p, dl = d[o], p[o], dl[o]
        first = np.zeros(d.size, bool)
        first[0] = True
        first[1:] = d[1:] != d[:-1]
        contrib = np.full(d.size, k, np.int64)
        delta = np.empty(d.size, np.int64)
        delta[1:] = p[1:] - p[:-1]
        contrib[~first] = np.minimum(delta[~first], k)
        doc_code = np.cumsum(first) - 1
        covered = np.bincount(doc_code, weights=contrib).astype(np.int64)
        counts = np.bincount(doc_code).astype(np.int64)
        return pa.table({
            id_col: pa.array(d[first]),
            "n_tokens": pa.array(dl[first]),
            "dup_grams": pa.array(counts),
            "covered_tokens": pa.array(covered),
        })

    occ = docs.map_batches(occurrences, batch_format="pyarrow")
    dups = occ.groupby("bucket").map_groups(mark_dups, batch_format="pyarrow")
    return dups.groupby("b2").map_groups(cover, batch_format="pyarrow")
