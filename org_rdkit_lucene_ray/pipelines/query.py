"""BM25 top-k query pipeline: searcher actor pool + block-max WAND.

Reference analogs:
- ``IndexSearcher`` singleton (T3, ``ChemicalIndex.java:886-904``) ->
  :class:`Searcher` held inside a ``map_batches`` actor pool
  (:class:`SearcherStage`): segments are loaded ONCE per actor in
  ``__init__``, every batch of queries reuses them.
- bounded top-k PQ with "lower score loses; tie -> larger docID loses"
  (``SubstructureHitQueue.java:98-118``) -> the heap in :meth:`Searcher.topk`.
- ``TopScoreDocCollector`` (K2) -> exhaustive scorer; block-max WAND is the
  pruning variant the north star mandates; both produce IDENTICAL results
  (tested), and both are float-exact vs the oracle: per-doc contributions
  are added in ascending term order in float64 and rounded once to float32.
  Pruning designs follow the public literature: WAND (Broder et al., CIKM
  2003), Block-Max WAND (Ding & Suel, SIGIR 2011), MaxScore essential-list
  splitting (Turtle & Flood, IP&M 1995) — re-derived here in vectorized
  numpy form with an exactness guarantee the papers don't need.
- hit -> stored-field join (J7, ``getPrimaryKeysForSearchHits:739-767``) ->
  :meth:`Searcher.resolve_urls` — predicate-pushdown read of the forward
  index for just the top-k doc ids (a broadcast-small-side join).

Distribution model: one actor scores whole queries against all segment
chunks it holds (query-parallel). On a multi-node cluster the same classes
shard by segment: each actor loads a subset of segments, queries fan out,
and per-segment top-k heaps merge with the same (score desc, doc_id asc)
comparator via ``sort().limit(k)`` — doc-id ranges are disjoint per segment
so partial heaps concatenate safely (SURVEY K2). See ``topk_sharded``.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from org_rdkit_lucene_ray.config import AnalyzerConfig, BM25Params
from org_rdkit_lucene_ray.functions.analyze import analyze_text
from org_rdkit_lucene_ray.functions.codec import varint_decode
from org_rdkit_lucene_ray.state.segment import (
    check_format,
    check_query_compat,
    gen_dir,
    list_chunk_files,
    list_segment_ids,
    read_manifest,
)


class _TermCursor:
    """Decoded, concatenated posting list of one term + block-max metadata.

    Doc ids are globally ascending because segments are doc-id-range
    partitions visited in ascending segment order (SURVEY §2.9 ordering
    invariant).

    ``blk_maxw`` is the EXACT per-block maximum of the live float64 weight
    vector (computed at decode time in :meth:`Searcher._decode_term`), NOT
    the encode-time ``bm_max_tfn``. Encode-time bounds are relative to the
    encoding generation's avgdl; on a multi-generation index the query-time
    avgdl can exceed it, making stored bounds non-admissible (true weights
    above the bound => block-max pruning could drop genuine top-k hits).
    Live-derived bounds are exact for the current avgdl and tombstone set."""

    __slots__ = ("term", "docs", "tfs", "dls", "blk_first", "blk_last",
                 "blk_maxw", "idf", "mult", "pos", "weights", "max_ub", "_k1", "_b", "_avgdl")

    def __init__(self, term, docs, tfs, dls, blk_first, blk_last, blk_maxw,
                 idf, mult, bm25: BM25Params, avgdl: float, weights=None):
        self.term = term
        self.docs = docs
        self.tfs = tfs
        self.dls = dls
        self.blk_first = blk_first
        self.blk_last = blk_last
        self.blk_maxw = blk_maxw
        self.idf = idf
        self.mult = mult
        self.pos = 0
        self.weights = weights
        self._k1, self._b, self._avgdl = bm25.k1, bm25.b, avgdl
        # admissible per-term bound: exact max block weight x clause multiplier
        self.max_ub = mult * float(blk_maxw.max())

    # -- scoring -------------------------------------------------------------
    def weight_vector(self) -> np.ndarray:
        """Per-posting float64 BM25 weight — the SAME expression, op for op,
        as OracleIndex.score_all, vectorized."""
        if self.weights is None:
            k1, b = self._k1, self._b
            tf = self.tfs.astype(np.float64)
            K = k1 * ((1.0 - b) + (b * self.dls.astype(np.float64)) / self._avgdl)
            self.weights = self.idf * (tf * (k1 + 1.0)) / (tf + K)
        return self.weights

    def weight_at(self, pos: int) -> float:
        if self.weights is not None:
            # precomputed per-posting weight vector (any similarity) — the
            # scalar BM25 fallback below only serves cursors built without
            # one (tests constructing _TermCursor directly)
            return float(self.weights[pos])
        k1, b = self._k1, self._b
        tf = float(self.tfs[pos])
        K = k1 * ((1.0 - b) + (b * float(self.dls[pos])) / self._avgdl)
        return self.idf * (tf * (k1 + 1.0)) / (tf + K)

    # -- traversal -----------------------------------------------------------
    @property
    def exhausted(self) -> bool:
        return self.pos >= self.docs.size

    @property
    def doc(self) -> int:
        return int(self.docs[self.pos])

    def seek(self, target: int) -> None:
        """Gallop to the first doc >= target."""
        self.pos += int(np.searchsorted(self.docs[self.pos:], target, side="left"))

    def advance(self) -> None:
        self.pos += 1

    def block_ub(self, doc: int) -> float:
        """Upper bound of this clause's contribution at ``doc`` using the
        block-max metadata of the block containing ``doc``."""
        i = int(np.searchsorted(self.blk_last, doc, side="left"))
        if i >= self.blk_maxw.size:
            return 0.0
        return self.mult * float(self.blk_maxw[i])


def _fold_topk(parts_d: list, parts_w: list, k: int) -> list[tuple[int, float]]:
    """Shared clause-fold: concatenated per-clause (docs, float64 weights)
    -> per-doc sum in concat order (score_all's float-parity contract:
    stable sort by doc keeps clause order, reduceat sums left-to-right)
    -> float32 cast -> (score desc, doc asc) top-k. The ONE place the
    summation-order invariant lives for the boosted/synonym scorers."""
    if not parts_d or k <= 0:
        return []
    docs = np.concatenate(parts_d)
    ws = np.concatenate(parts_w)
    order = np.argsort(docs, kind="stable")
    docs_s, ws_s = docs[order], ws[order]
    starts = np.flatnonzero(
        np.concatenate([[True], docs_s[1:] != docs_s[:-1]]))
    sums = np.add.reduceat(ws_s, starts).astype(np.float32)
    docs_u = docs_s[starts]
    top = np.lexsort((docs_u, -sums.astype(np.float64)))[:k]
    return [(int(docs_u[i]), float(sums[i])) for i in top]


def _levenshtein_within(a: str, b: str, k: int) -> bool:
    """Wagner-Fischer DP with an early-exit row-minimum bound: True iff
    edit_distance(a, b) <= k. O(len(a) * len(b)) worst case but candidates
    are length-banded first, and rows abort once min > k."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if min(cur) > k:
            return False
        prev = cur
    return prev[lb] <= k


class _SortedTermIndex:
    """Zero-copy binary search over a term-SORTED Arrow string column.

    Replaces the r1 ``{term: row}`` Python dicts (built with ``to_pylist``
    per chunk): per-actor memory was ∝ vocabulary and startup was per-row
    Python. Here the dictionary IS the Arrow column — only the int32 offset
    view and a memoryview of the UTF-8 data buffer are kept; a lookup is
    ~log2(n) tiny byte-slice compares (chunk files are written term-sorted,
    ``build.py`` Phase B)."""

    __slots__ = ("offs", "data", "n")

    def __init__(self, terms: pa.Array):
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        self.n = len(terms)
        bufs = terms.buffers()
        self.offs = np.frombuffer(bufs[1], np.int32)[terms.offset: terms.offset + self.n + 1]
        self.data = memoryview(bufs[2])

    def find(self, term: str) -> int | None:
        q = term.encode("utf-8")
        lo, hi = 0, self.n
        offs, data = self.offs, self.data
        while lo < hi:
            mid = (lo + hi) >> 1
            v = bytes(data[offs[mid]:offs[mid + 1]])
            if v < q:
                lo = mid + 1
            elif v > q:
                hi = mid
            else:
                return mid
        return None


class Searcher:
    """Open one index generation and answer the reference's search surface.

    ``shard=(i, n)`` loads only segments with ``sid % n == i`` while keeping
    GLOBAL corpus statistics (n_docs/avgdl from the manifest; df from the
    index's df table), so per-shard scores equal the unsharded scores and
    per-shard top-k heaps merge exactly (any global top-k doc is in its
    shard's top-k) — the intra-query parallelism design SURVEY §4 calls for.
    """

    def __init__(self, index_dir: str, generation: str | None = None,
                 shard: tuple[int, int] | None = None,
                 warm_top_terms: int = 0, similarity: str = "bm25",
                 residency: str = "lazy"):
        if similarity not in ("bm25", "classic"):
            raise ValueError(f"unknown similarity {similarity!r} "
                             "(expected 'bm25' or 'classic')")
        # pluggable per-term weight formula (Lucene's Similarity seam:
        # BM25Similarity is the modern default, ClassicSimilarity the
        # TF-IDF VSM it replaced). Block-max bounds are derived from the
        # LIVE weight vector in _decode_term, so every pruning path stays
        # admissible for ANY positive weight formula — no per-similarity
        # pruning code.
        self.similarity = similarity
        self.manifest = read_manifest(index_dir, generation)
        check_format(self.manifest)   # refuse foreign bucket-hash formats
        self.gdir = gen_dir(index_dir, generation)
        stats = self.manifest["stats"]
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"])
        bm = self.manifest["config"]["bm25"]
        self.bm25 = BM25Params(k1=bm["k1"], b=bm["b"])
        self.block_size = int(self.manifest["config"]["block_size"])
        # positional sidecar flag (r4): chunk rows carry pos_bytes streams,
        # so phrase verify runs off the index, not the stored text
        self.store_positions = bool(
            self.manifest["config"].get("store_positions", False))
        qa = self.manifest["config"]["query_analyzer"]
        qa = {k: tuple(v) if isinstance(v, list) else v for k, v in qa.items()}
        self.query_cfg = AnalyzerConfig(**qa)
        check_query_compat(self.manifest, self.query_cfg.fingerprint())

        # segment dictionaries: term -> per-chunk row locator, grouped by
        # term bucket (a term lives in exactly ONE bucket across every
        # segment, so a lookup probes only its bucket's chunk tables).
        # Loaded once per actor (T3); columns stay zero-copy Arrow — the
        # term dictionary is a _SortedTermIndex over the term-sorted chunk
        # column, NOT a Python dict (web-scale vocabularies). A generation
        # may include parent generations (log-structured incremental adds,
        # pipelines/merge.py); segment ids are globally unique and
        # doc-range-ordered across included gens.
        self._index_dir = index_dir
        self._gdirs: list[str] = [
            os.path.join(index_dir, g)
            for g in self.manifest.get("includes", [self.manifest["generation"]])
        ]
        self._shard = shard
        self._term_buckets = int(self.manifest["config"]["term_buckets"])
        self._by_bucket: dict[int, list[tuple[int, pa.Table, _SortedTermIndex]]] = {}
        mine: set[int] | None = None
        if shard is not None:
            # CONTIGUOUS doc-range sharding (segment ids order doc ranges):
            # shard i takes the i-th of n nearly-equal contiguous sid runs,
            # so its doc span shrinks ~1/n. The r2 `sid % n` interleave left
            # every shard spanning the FULL doc range, which made each
            # sharded actor allocate a corpus-wide dense accumulator —
            # measured at soak scale: sharded p95 2.2x WORSE than a single
            # searcher from the concurrent span-wide memory traffic.
            # Contiguous ranges are also the multi-node layout (a shard =
            # a doc-range partition co-located with its segments).
            all_sids = sorted({s for gd in self._gdirs
                               for s in list_segment_ids(gd)})
            splits = np.array_split(np.asarray(all_sids, dtype=np.int64),
                                    shard[1])
            mine = set(int(s) for s in splits[shard[0]])
        # LAZY residency (r3 verdict #8 / north-star "mmap'd segment
        # shards"): __init__ only LISTS chunk files (no data read); a
        # bucket's chunk tables + term indexes load on the first probe of
        # that bucket and stay cached for the actor's lifetime. A searcher
        # serving a selective query mix touches only the buckets its terms
        # hash to, so actor RSS and init time scale with the WORKING SET,
        # not the shard — at web scale an actor over a 100 GB shard that
        # answers head-term queries resides a few hot buckets. Parquet
        # reads use memory_map=True so the OS page cache backs the raw
        # column bytes (zstd pages still decompress into heap; the decoded
        # posting arrays themselves live in the bounded _decode_cache).
        # ``residency="eager"`` preloads everything (old behavior) for
        # latency-critical serving where the first-probe cost must not
        # land on a query.
        self._bucket_files: dict[int, list[tuple[int, str]]] = {}
        n_chunks = 0
        for gd in self._gdirs:
            for sid in list_segment_ids(gd):
                if mine is not None and sid not in mine:
                    continue
                for f in list_chunk_files(gd, sid):
                    from org_rdkit_lucene_ray.state.segment import chunk_bucket_of

                    self._bucket_files.setdefault(chunk_bucket_of(f), []) \
                        .append((sid, f))
                    n_chunks += 1
        for lst in self._bucket_files.values():
            lst.sort(key=lambda x: x[0])       # ascending segment order
        self._n_chunks = n_chunks
        if residency not in ("lazy", "eager"):
            raise ValueError(f"residency must be 'lazy' or 'eager', "
                             f"got {residency!r}")
        if residency == "eager":
            for b in self._bucket_files:
                self._bucket_chunks(b)
        self._bucket_cache: dict[str, int] = {}
        # sharded scoring needs GLOBAL df — from the df table, not the
        # shard's partial chunk counts. Kept Arrow-native: a term-sorted
        # (term, df) table + binary search, not a vocab-sized Python dict.
        self._gdf_index: _SortedTermIndex | None = None
        self._gdf_vals: np.ndarray | None = None
        if shard is not None:
            dfs = self._read_df_tables()
            if dfs is not None:
                order = pc.sort_indices(dfs["term"])
                dfs = dfs.take(order)
                self._gdf_index = _SortedTermIndex(dfs["term"])
                self._gdf_vals = dfs["df"].to_numpy()
        # tombstones (upserted-away docs): masked at decode time; like
        # Lucene, they still count in df/avgdl until a merge drops them.
        del_path = os.path.join(self.gdir, "deletes.parquet")
        self._deletes = (pq.read_table(del_path)["doc_id"].to_numpy()
                         if os.path.exists(del_path) else None)
        self._df_cache: dict[str, int] = {}
        # LRU of decoded posting lists + precomputed BM25 weight vectors:
        # head terms recur across queries (T3 warm-searcher analog). Arrays
        # are treated read-only by cursors (only .pos mutates).
        from collections import OrderedDict

        self._decode_cache: "OrderedDict[str, tuple | None]" = OrderedDict()
        self._decode_cache_max = max(64, warm_top_terms)
        if warm_top_terms:
            # eagerly decode the highest-df terms — from the index's df
            # TABLE (one Arrow aggregate + select_k), not a vocab-sized
            # Python dict scan (T3 warm-up; the reference's 5 warm-up FP
            # queries, LuceneBenchmark.java:645-664)
            dfs = self._read_df_tables()
            if dfs is not None:
                top = dfs.take(pc.select_k_unstable(
                    dfs, k=min(warm_top_terms, dfs.num_rows),
                    sort_keys=[("df", "descending")]))
                for t in top["term"].to_pylist():
                    self._decode_term(t)

    def _bucket_chunks(self, bucket: int) -> list[tuple[int, pa.Table, "_SortedTermIndex"]]:
        """Chunk tables + term indexes of one bucket, loaded on first probe
        and cached (lazy residency). memory_map=True keeps the raw Parquet
        bytes on the page cache instead of a heap copy."""
        got = self._by_bucket.get(bucket)
        if got is None:
            from org_rdkit_lucene_ray.state.segment import read_chunk_table

            got = []
            for sid, f in self._bucket_files.get(bucket, ()):
                # ipc chunks map zero-copy (page-cache-resident buffers);
                # parquet decompresses pages into heap on read
                tbl = read_chunk_table(f, memory_map=True)
                if tbl.num_rows:
                    got.append((sid, tbl, _SortedTermIndex(tbl["term"])))
            self._by_bucket[bucket] = got
        return got

    # ------------------------------------------------------------- stats/meta
    def _read_df_tables(self) -> pa.Table | None:
        """Concat + combine the per-bucket (term, df) tables across included
        generations (terms repeat only across generations)."""
        tabs = []
        for gd in self._gdirs:
            df_dir = os.path.join(gd, "df")
            if not os.path.isdir(df_dir):
                continue
            tabs.extend(pq.read_table(os.path.join(df_dir, f))
                        for f in sorted(os.listdir(df_dir))
                        if f.endswith(".parquet"))
        if not tabs:
            return None
        t = pa.concat_tables(tabs)
        if len(self._gdirs) > 1:
            g = t.group_by("term").aggregate([("df", "sum")])
            t = pa.table({"term": g["term"], "df": g["df_sum"]})
        return t

    def _term_bucket(self, term: str) -> int:
        b = self._bucket_cache.get(term)
        if b is None:
            from org_rdkit_lucene_ray.pipelines.build import stable_term_hash

            # int() BEFORE the modulo: a scalar np.uint64 % python-int
            # promotes to float64 and silently loses precision
            b = int(stable_term_hash([term])[0]) % self._term_buckets
            self._bucket_cache[term] = b
        return b

    def df(self, term: str) -> int:
        if self._gdf_vals is not None:
            i = self._gdf_index.find(term)
            return 0 if i is None else int(self._gdf_vals[i])
        d = self._df_cache.get(term)
        if d is None:
            d = sum(
                tbl["df_chunk"][i].as_py()
                for _, tbl, tix in self._bucket_chunks(self._term_bucket(term))
                if (i := tix.find(term)) is not None
            )
            self._df_cache[term] = d
        return d

    def idf(self, term: str) -> float:
        import math
        df = self.df(term)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def _sim_idf_of_df(self, df: int) -> float:
        """idf under the active similarity: BM25's Robertson-Sparck-Jones
        form, or ClassicSimilarity's ``1 + ln((N + 1) / (df + 1))``."""
        import math
        if self.similarity == "classic":
            return 1.0 + math.log((self.n_docs + 1.0) / (df + 1.0))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def _sim_idf(self, term: str) -> float:
        return self._sim_idf_of_df(self.df(term))

    def _weight_arrays(self, idf: float, tf: np.ndarray,
                       dl: np.ndarray) -> np.ndarray:
        """Per-posting float64 weight vector under the active similarity
        (``tf``/``dl`` already float64). Op order matches the oracle SQL."""
        if self.similarity == "classic":
            return (idf * idf) * np.sqrt(tf) / np.sqrt(dl)
        k1, b = self.bm25.k1, self.bm25.b
        K = k1 * ((1.0 - b) + (b * dl) / self.avgdl)
        return idf * (tf * (k1 + 1.0)) / (tf + K)

    # --------------------------------------------------------------- cursors
    def _decode_term(self, term: str):
        """Concatenate this term's chunks across segments (ascending sid);
        cached (LRU) with the term's weight vector + LIVE block-max bounds.

        Block bounds are derived HERE from the exact float64 weight vector,
        not read from the stored ``bm_max_tfn``: stored bounds were encoded
        with that generation's own avgdl and are not admissible once a delta
        generation shifts the combined avgdl (they also stay stale across
        tombstones). One ``np.maximum.reduceat`` per decode makes them exact
        for the live (avgdl, deletes) pair — and tighter, so block-max
        pruning only improves. Stored ``bm_*`` columns remain in the format
        for offline consumers/debug."""
        if term in self._decode_cache:
            self._decode_cache.move_to_end(term)
            return self._decode_cache[term]
        dec = self._decode_term_uncached(term)
        if dec is not None:
            # precompute the per-posting float64 weight vector once per term
            # (same expression as _TermCursor.weight_vector; idf/avgdl are
            # fixed per searcher, so this is query-independent)
            docs, tfs, dls = dec
            weights = self._weight_arrays(self._sim_idf(term),
                                          tfs.astype(np.float64),
                                          dls.astype(np.float64))
            bs = self.block_size
            starts = np.arange(0, docs.size, bs)
            blk_first = docs[starts]
            blk_last = docs[np.minimum(starts + bs, docs.size) - 1]
            blk_maxw = np.maximum.reduceat(weights, starts)
            dec = (docs, tfs, dls, blk_first, blk_last, blk_maxw, weights)
        self._decode_cache[term] = dec
        if len(self._decode_cache) > self._decode_cache_max:
            self._decode_cache.popitem(last=False)
        return dec

    def _decode_term_uncached(self, term: str):
        """Concatenate this term's chunks across segments (ascending sid);
        only the term's own bucket is probed (one binary search per chunk)."""
        docs_l, tfs_l, dls_l = [], [], []
        for _, tbl, tix in self._bucket_chunks(self._term_bucket(term)):
            i = tix.find(term)
            if i is None:
                continue
            n = tbl["df_chunk"][i].as_py()
            deltas = varint_decode(np.frombuffer(tbl["doc_bytes"][i].as_buffer(), np.uint8), n)
            # zero-copy reinterpret + single-pass cumsum: this VM's memory
            # bandwidth makes every 1M-element astype cost ~10 ms
            docs_l.append(np.cumsum(deltas, dtype=np.int64))
            tfs_l.append(varint_decode(np.frombuffer(tbl["tf_bytes"][i].as_buffer(), np.uint8), n).view(np.int64))
            dls_l.append(varint_decode(np.frombuffer(tbl["dl_bytes"][i].as_buffer(), np.uint8), n).view(np.int64))
        if not docs_l:
            return None
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        dls = np.concatenate(dls_l)
        if self._deletes is not None and self._deletes.size:
            keep = ~np.isin(docs, self._deletes)
            if not keep.all():
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
                if docs.size == 0:
                    return None
        return (docs, tfs, dls)

    def _query_terms(self, query: str) -> list[str]:
        """Tokenize a query, honoring ``field:value`` composite terms for
        indexed metadata fields (J5, ``MultiFieldQueryParser`` analog
        ``ChemicalIndex.java:466-491``); everything else goes through the
        query analyzer."""
        fields = set(self.manifest["config"].get("field_columns", []))
        out: list[str] = []
        for raw in query.split():
            if ":" in raw and fields:
                f, v = raw.split(":", 1)
                if f in fields and v:
                    out.append(f + ":" + v.lower())
                    continue
            out.extend(analyze_text(raw, self.query_cfg))
        return out

    def _cursors(self, query: str):
        """-> (occurrence term list sorted asc, {term: _TermCursor})."""
        occurrences = sorted(self._query_terms(query))
        cursors: dict[str, _TermCursor] = {}
        for t in occurrences:
            if t in cursors:
                continue
            dec = self._decode_term(t)
            if dec is None:
                continue
            mult = occurrences.count(t)
            cursors[t] = _TermCursor(t, *dec[:6], idf=self._sim_idf(t), mult=mult,
                                     bm25=self.bm25, avgdl=self.avgdl,
                                     weights=dec[6] if len(dec) > 6 else None)
        return occurrences, cursors

    # ------------------------------------------------------------ exhaustive
    def score_all(self, query: str) -> tuple[np.ndarray, np.ndarray]:
        """Score every matching doc (TermQuery-OR over clauses).

        float-exact vs the oracle: contributions concatenated in ascending
        term-occurrence order, stable-sorted by doc, summed left-to-right per
        doc (np.add.reduceat is sequential below its 128-element pairwise
        threshold; queries have far fewer clauses than 128)."""
        occurrences, cursors = self._cursors(query)
        parts_d, parts_w = [], []
        for t in occurrences:          # duplicates appear once per occurrence
            c = cursors.get(t)
            if c is None:
                continue
            parts_d.append(c.docs)
            parts_w.append(c.weight_vector())
        if not parts_d:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        docs = np.concatenate(parts_d)
        ws = np.concatenate(parts_w)
        order = np.argsort(docs, kind="stable")
        docs_s, ws_s = docs[order], ws[order]
        starts = np.flatnonzero(np.concatenate([[True], docs_s[1:] != docs_s[:-1]]))
        sums = np.add.reduceat(ws_s, starts)
        return docs_s[starts], sums.astype(np.float32)

    @staticmethod
    def _after_mask(docs: np.ndarray, s32: np.ndarray,
                    after: tuple[float, int]) -> np.ndarray:
        """Search-after predicate (K2 collector variant,
        ``SubstructureScoreDocCollector.java:63-256``, factory ``:268-301``):
        keep hits STRICTLY after ``(after_score, after_doc)`` in the global
        (score desc, doc_id asc) order. Comparisons on float32 scores — the
        same domain the final rank comparator uses."""
        a_s = np.float32(after[0])
        a_d = int(after[1])
        return (s32 < a_s) | ((s32 == a_s) & (docs > a_d))

    def topk_exhaustive(self, query: str, k: int,
                        after: tuple[float, int] | None = None) -> list[tuple[int, float]]:
        docs, scores = self.score_all(query)
        if after is not None and docs.size:
            m = self._after_mask(docs, scores, after)
            docs, scores = docs[m], scores[m]
        if docs.size == 0:
            return []
        order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
        return [(int(docs[i]), float(scores[i])) for i in order]

    # ------------------------------------------------------------------ WAND
    def topk_wand(self, query: str, k: int,
                  after: tuple[float, int] | None = None) -> list[tuple[int, float]]:
        """Block-max WAND: identical results to exhaustive, fewer evaluations.

        Pruning is admissible under the tie rule (tie -> larger docID loses;
        docs stream in ascending id, so a candidate tying the heap minimum
        always loses): skip when bound <= theta. With ``after``, hits at or
        before the after-position are dropped before heap insertion (they
        can't raise theta and never reach the result)."""
        occurrences, cursors = self._cursors(query)
        if not cursors or k <= 0:
            return []
        heap: list[tuple[float, int]] = []   # (score, -doc_id): min-heap of keepers
        clause_order = [t for t in occurrences if t in cursors]
        live = list(cursors.values())
        while True:
            live = [c for c in live if not c.exhausted]
            if not live:
                break
            live.sort(key=lambda c: c.doc)
            theta = heap[0][0] if len(heap) == k else float("-inf")
            acc, pivot = 0.0, -1
            for i, c in enumerate(live):
                acc += c.max_ub
                if acc > theta:
                    pivot = i
                    break
            if pivot < 0:
                break                      # no clause set can beat theta
            pivot_doc = live[pivot].doc
            if live[0].doc == pivot_doc:
                at_pivot = [c for c in live if not c.exhausted and c.doc == pivot_doc]
                bub = sum(c.block_ub(pivot_doc) for c in at_pivot)
                if len(heap) == k and bub <= theta:
                    for c in at_pivot:
                        c.advance()
                    continue
                score64 = 0.0
                for t in clause_order:     # ascending term order, dups adjacent
                    c = cursors[t]
                    if not c.exhausted and c.doc == pivot_doc:
                        score64 += c.weight_at(c.pos)
                s32 = float(np.float32(score64))
                eligible = after is None or bool(self._after_mask(
                    np.asarray([pivot_doc]), np.asarray([s32], np.float32), after)[0])
                if eligible:
                    entry = (s32, -pivot_doc)
                    if len(heap) < k:
                        heapq.heappush(heap, entry)
                    elif entry > heap[0]:
                        heapq.heapreplace(heap, entry)
                for c in at_pivot:
                    c.advance()
            else:
                for c in live[:pivot]:
                    if c.doc < pivot_doc:
                        c.seek(pivot_doc)
        out = sorted(heap, key=lambda e: (-e[0], -e[1]))
        return [(-d, s) for s, d in out]

    # ------------------------------------------------- vectorized block-max
    def topk_bmw(self, query: str, k: int,
                 after: tuple[float, int] | None = None) -> list[tuple[int, float]]:
        """Vectorized block-max dynamic pruning (MaxScore skeleton + BMW
        block bounds) — rank- and score-identical to the oracle, numpy
        throughout (the doc-at-a-time loop in :meth:`topk_wand` evaluates
        one doc per Python iteration; this path prunes with the same
        block-max metadata but scores candidates in bulk).

        1. bootstrap θ: exact-score each clause's top-k postings by weight;
        2. split clauses essential/non-essential: maximal UB-ascending
           prefix with ΣUB **strictly** < θ can be ignored as a candidate
           SOURCE (docs only there score < θ; strictness keeps the
           doc-id-asc tie-break exact);
        3. candidates = union of essential lists; per-doc upper bound =
           Σ essential block-max UB (the BMW bound) + Σ non-essential
           global UB; drop bounds < θ;
        4. exact-score survivors with the oracle's summation order
           (float64 accumulated in ascending clause order; +0.0 for absent
           clauses is an exact identity, so skips don't change the sum).
        """
        occurrences, cursors = self._cursors(query)
        if not cursors or k <= 0:
            return []
        terms = sorted(cursors)                   # ascending clause order
        curs = [cursors[t] for t in terms]

        # Head-term fast path: when the posting mass is a sizable fraction
        # of the doc-id span, pruning can't skip much and the sparse
        # searchsorted gathers dominate (profiled ~550 ms/query at 1.5M
        # docs). A dense scatter-add accumulator scores everything in
        # O(total postings) with vector constants (~30 ms same query) and
        # is float-exact: adds happen per term in ascending clause order,
        # doc ids are unique within a term.
        # span measured from the smallest doc id present, not 0: a sharded
        # searcher holds a contiguous doc-range slice, so base-offset
        # indexing keeps its accumulator proportional to the SHARD, not the
        # corpus (and is an exact identity — same adds, same order)
        base = min(int(c.docs[0]) for c in curs)
        span = max(int(c.docs[-1]) for c in curs) + 1 - base
        total = sum(c.docs.size for c in curs)
        if total > span // 16 and span <= 64_000_000:
            acc = np.zeros(span, dtype=np.float64)
            for c in curs:                         # ascending term order
                w = c.weight_vector()
                idx = c.docs - base if base else c.docs
                for _ in range(c.mult):
                    acc[idx] += w
            # BM25 weights are strictly positive (idf > 0 even at df == N),
            # so acc != 0 IS the touched set — no separate bool scatter
            docs = np.flatnonzero(acc) + base
            s32 = acc[docs - base].astype(np.float32)
            if after is not None and docs.size:
                m = self._after_mask(docs, s32, after)
                docs, s32 = docs[m], s32[m]
            if docs.size > k:
                part = np.argpartition(-s32, k - 1)[:k]
                kth = s32[part].min()
                sel = np.flatnonzero(s32 >= kth)   # keep ties for doc-id order
                order = sel[np.lexsort((docs[sel], -s32[sel].astype(np.float64)))][:k]
            else:
                order = np.lexsort((docs, -s32.astype(np.float64)))[:k]
            return [(int(docs[i]), float(s32[i])) for i in order]

        # duplicate query terms: cursor.mult occurrences — replicate the
        # oracle's "one contribution per occurrence" by adding the weight
        # `mult` times (still ascending clause order, duplicates adjacent).
        def exact_scores(docs: np.ndarray) -> np.ndarray:
            acc = np.zeros(docs.size, dtype=np.float64)
            for c in curs:
                pos = np.searchsorted(c.docs, docs)
                pos_c = np.minimum(pos, c.docs.size - 1)
                hit = c.docs[pos_c] == docs
                w = np.where(hit, c.weight_vector()[pos_c], 0.0)
                for _ in range(c.mult):
                    acc = acc + w
            return acc

        # -- 1. bootstrap
        boot_parts = []
        for c in curs:
            w = c.weight_vector()
            if w.size > k:
                idx = np.argpartition(-w, k - 1)[:k]
            else:
                idx = np.arange(w.size)
            boot_parts.append(c.docs[idx])
        boot = np.unique(np.concatenate(boot_parts))
        boot_scores = exact_scores(boot)
        # with search-after, θ must bound the k-th ELIGIBLE score: hits at
        # or before the after-position are excluded by the final filter, so
        # they may not raise the pruning threshold
        boot32 = boot_scores.astype(np.float32)
        if after is not None:
            elig = self._after_mask(boot, boot32, after)
            elig32 = boot32[elig]
        else:
            elig32 = boot32
        if elig32.size >= k:
            # final comparisons are on float32 scores with doc-id tie-break:
            # a doc whose f32 score TIES the k-th must not be pruned, so the
            # pruning threshold steps one f32 ulp below the k-th f32 score.
            kth32 = np.sort(elig32)[-k]
            theta = float(np.nextafter(kth32, np.float32(-np.inf)))
        else:
            theta = float("-inf")

        # -- 2. essential split (UB ascending, strict prefix)
        order = np.argsort([c.max_ub for c in curs], kind="stable")
        cum = 0.0
        non_essential = set()
        for i in order:
            if cum + curs[i].max_ub < theta:
                cum += curs[i].max_ub
                non_essential.add(i)
            else:
                break
        noness_ub = sum(curs[i].max_ub for i in non_essential)

        # -- 3. candidates + block-max bound
        ess = [i for i in range(len(curs)) if i not in non_essential]
        cand = np.unique(np.concatenate([curs[i].docs for i in ess])) \
            if ess else np.zeros(0, np.int64)
        if cand.size:
            bound = np.full(cand.size, noness_ub, dtype=np.float64)
            for i in ess:
                c = curs[i]
                pos = np.searchsorted(c.docs, cand)
                pos_c = np.minimum(pos, c.docs.size - 1)
                hit = c.docs[pos_c] == cand
                blk = np.searchsorted(c.blk_last, c.docs[pos_c], side="left")
                blk = np.minimum(blk, c.blk_maxw.size - 1)
                ub = c.mult * c.blk_maxw[blk]
                bound += np.where(hit, ub, 0.0)
            survivors = cand[bound >= theta]
        else:
            survivors = np.zeros(0, np.int64)

        # -- 4. exact scores over bootstrap ∪ survivors
        final_docs = np.unique(np.concatenate([boot, survivors]))
        final_scores = exact_scores(final_docs).astype(np.float32)
        if after is not None and final_docs.size:
            m = self._after_mask(final_docs, final_scores, after)
            final_docs, final_scores = final_docs[m], final_scores[m]
        order = np.lexsort((final_docs, -final_scores.astype(np.float64)))[:k]
        return [(int(final_docs[i]), float(final_scores[i])) for i in order]

    def search_boolean(self, query: str,
                       max_hits: int | None = None) -> np.ndarray:
        """Lucene-style boolean query over the free-query surface (J5 +
        BooleanQuery MUST/MUST_NOT/SHOULD, ``ChemicalIndex.java:466-491``,
        ``:538-554``, ``:607-637``):

        ``+term`` MUST, ``-term`` MUST_NOT, bare term SHOULD; ``field:value``
        composite terms work in any role. Matching docs: hold every MUST
        term, none of the MUST_NOT terms, and (if any SHOULD terms exist
        and there are no MUST terms) at least one SHOULD term. With MUST
        terms present, SHOULD terms only influence scoring (Lucene
        semantics) — this method returns the doc SET, sorted ascending.
        """
        musts, must_nots, shoulds = [], [], []
        for raw in query.split():
            if raw.startswith("+") and len(raw) > 1:
                musts.extend(self._query_terms(raw[1:]))
            elif raw.startswith("-") and len(raw) > 1:
                must_nots.extend(self._query_terms(raw[1:]))
            else:
                shoulds.extend(self._query_terms(raw))

        def docs_of(term: str) -> np.ndarray:
            d = self._decode_term(term)
            return d[0] if d is not None else np.zeros(0, np.int64)

        if musts:
            sets = [docs_of(t) for t in set(musts)]
            if any(s.size == 0 for s in sets):
                return np.zeros(0, np.int64)
            sets.sort(key=len)
            out = sets[0]
            for s in sets[1:]:
                out = out[np.isin(out, s, assume_unique=True)]
                if out.size == 0:
                    return out
        elif shoulds:
            parts = [docs_of(t) for t in set(shoulds)]
            parts = [p for p in parts if p.size]
            if not parts:
                return np.zeros(0, np.int64)
            out = np.unique(np.concatenate(parts))
        else:
            return np.zeros(0, np.int64)
        for t in set(must_nots):
            ex = docs_of(t)
            if ex.size:
                out = out[~np.isin(out, ex, assume_unique=True)]
        return out if max_hits is None else out[:max_hits]

    def search_free(self, query: str, max_hits: int | None = None) -> np.ndarray:
        """J5 full analog — ``MultiFieldQueryParser`` over ALL live fields
        (``ChemicalIndex.java:466-491``): every BARE term expands across the
        indexed namespaces (the text namespace plus ``field:term`` for each
        field column recorded in the manifest — the ``FieldInfos`` live-field
        discovery analog); explicit ``field:value`` terms stay pinned to
        their field. Disjunctive over terms and namespaces (the parser's
        default OR), doc set sorted ascending; ``max_hits`` caps (iMaxHits).
        """
        fields = list(self.manifest["config"].get("field_columns", []))
        expansions: list[str] = []
        for raw in query.split():
            for t in self._query_terms(raw):
                expansions.append(t)
                if ":" not in t:                    # bare term -> all fields
                    expansions.extend(f"{f}:{t}" for f in fields)
        parts = [d[0] for t in set(expansions)
                 if (d := self._decode_term(t)) is not None]
        if not parts:
            return np.zeros(0, np.int64)
        out = np.unique(np.concatenate(parts))
        return out if max_hits is None else out[:max_hits]

    # ------------------------------------------ term-dictionary expansions
    # Lucene 3.6 multi-term query family (PrefixQuery / WildcardQuery /
    # TermRangeQuery / FuzzyQuery — the QueryParser surface the reference's
    # MultiFieldQueryParser inherits): expand against the term dictionary,
    # then SHOULD-union the expansions' posting lists. Pre-4.0 Lucene
    # rewrites all of these by enumerating the dictionary; ours is the df
    # table (bounded vocabulary), scanned with vectorized Arrow kernels.
    def _dfs(self) -> pa.Table | None:
        """The concatenated (term, df) table, read once per Searcher —
        shared by the multi-term rewrites (vocab scans) and the
        suggester (df weights), so the per-bucket df Parquet files are
        scanned exactly once."""
        if not hasattr(self, "_dfs_cache"):
            self._dfs_cache = self._read_df_tables()
        return self._dfs_cache

    def _vocab(self) -> pa.Array:
        if not hasattr(self, "_vocab_cache"):
            dfs = self._dfs()
            self._vocab_cache = (dfs["term"].combine_chunks()
                                 if dfs is not None else pa.array([], pa.string()))
        return self._vocab_cache

    def _union_docs(self, terms: list[str],
                    max_hits: int | None = None) -> np.ndarray:
        parts = [d[0] for t in set(terms)
                 if (d := self._decode_term(t)) is not None]
        if not parts:
            return np.zeros(0, np.int64)
        out = np.unique(np.concatenate(parts))
        return out if max_hits is None else out[:max_hits]

    def prefix_terms(self, prefix: str) -> list[str]:
        """PrefixQuery expansion (``term*``): vectorized starts_with scan."""
        v = self._vocab()
        return sorted(v.filter(pc.starts_with(v, prefix)).to_pylist())

    def wildcard_terms(self, pattern: str) -> list[str]:
        """WildcardQuery expansion: Lucene ``*`` (any run) / ``?`` (one
        char); anything else matches literally (vocab terms are analyzer
        output, so regex metachars are escaped defensively)."""
        import re as _re

        rx = "".join("[\\s\\S]*" if c == "*" else "[\\s\\S]" if c == "?"
                     else _re.escape(c) for c in pattern)
        v = self._vocab()
        return sorted(v.filter(
            pc.match_substring_regex(v, "^" + rx + "$")).to_pylist())

    def regexp_terms(self, pattern: str) -> list[str]:
        """RegexpQuery expansion (the 3.6-era contrib ``RegexQuery`` the
        QueryParser family sits beside): vocabulary terms FULLY matching
        the RE2 pattern, via one vectorized Arrow regex scan. Fielded
        ``field:value`` namespace terms are excluded — the expansion
        domain is the text-token vocabulary, matching suggest_complete
        (a pattern like ``la.*`` must not union ``lang:de`` postings)."""
        v = self._vocab()
        m = pc.and_(pc.match_substring_regex(v, "^(?:" + pattern + ")$"),
                    pc.invert(pc.match_substring(v, pattern=":")))
        return sorted(v.filter(m).to_pylist())

    def search_regexp(self, pattern: str,
                      max_hits: int | None = None) -> np.ndarray:
        """Docs holding any term matching ``pattern`` (SHOULD-union of the
        expansions, like the other multi-term rewrites)."""
        return self._union_docs(self.regexp_terms(pattern), max_hits)

    def range_terms(self, lo: str, hi: str, *, include_lo: bool = True,
                    include_hi: bool = True) -> list[str]:
        """TermRangeQuery expansion: lexicographic [lo, hi] over the vocab."""
        v = self._vocab()
        m_lo = (pc.greater_equal if include_lo else pc.greater)(v, lo)
        m_hi = (pc.less_equal if include_hi else pc.less)(v, hi)
        return sorted(v.filter(pc.and_(m_lo, m_hi)).to_pylist())

    def search_prefix(self, prefix: str,
                      max_hits: int | None = None) -> np.ndarray:
        return self._union_docs(self.prefix_terms(prefix), max_hits)

    def search_wildcard(self, pattern: str,
                        max_hits: int | None = None) -> np.ndarray:
        return self._union_docs(self.wildcard_terms(pattern), max_hits)

    def search_term_range(self, lo: str, hi: str,
                          max_hits: int | None = None, **kw) -> np.ndarray:
        return self._union_docs(self.range_terms(lo, hi, **kw), max_hits)

    def fuzzy_terms(self, term: str, max_edits: int = 1) -> list[str]:
        """Indexed terms within ``max_edits`` Levenshtein edits of ``term``.

        Lucene 3.6's ``FuzzyQuery`` (the query surface the reference's
        parser inherits) enumerates the TERM DICTIONARY and keeps terms
        within the edit budget — pre-4.0 Lucene had no automaton, it was
        exactly this scan. Here the dictionary is the index's df table
        (term-sorted Arrow); a length-band prefilter (|len(t) - len(q)| <=
        max_edits, an edit-distance lower bound) cuts the exact
        Wagner-Fischer DP to a small candidate set. The scan is per-query
        over the vocabulary (bounded, not corpus-sized); at web scale the
        same filter runs as a map over the df table partitions."""
        terms = self._vocab()
        lens = pc.utf8_length(terms).to_numpy(zero_copy_only=False)
        band = np.flatnonzero(np.abs(lens - len(term)) <= max_edits)
        out = []
        for t in terms.take(pa.array(band)).to_pylist():
            if _levenshtein_within(term, t, max_edits):
                out.append(t)
        return sorted(out)

    def suggest_terms(self, term: str, *, max_edits: int = 2,
                      k: int = 5) -> list[tuple[str, int, int]]:
        """Did-you-mean spell suggestions (Lucene ``DirectSpellChecker``):
        dictionary terms within ``max_edits`` of ``term``, ranked by
        (edit distance asc, df desc, term asc) — Lucene's
        ``SuggestWord.DEFAULT_COMPARATOR`` ordering. The exact query term
        itself is excluded (it needs no correction). Fielded namespace
        terms (``lang:de``) are skipped: suggestions come from the text
        vocabulary, as the analyzer can never emit ``:``. Returns
        ``[(suggestion, distance, df)]``."""
        q = term.lower()
        out = []
        for t in self.fuzzy_terms(q, max_edits=max_edits):
            if t == q or ":" in t:
                continue
            dist = next(d for d in range(1, max_edits + 1)
                        if _levenshtein_within(q, t, d))
            out.append((t, dist, self.df(t)))
        out.sort(key=lambda r: (r[1], -r[2], r[0]))
        return out[:k]

    def suggest_complete(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        """Prefix autocomplete (the Lucene suggest module's
        ``AnalyzingSuggester`` shape, weight = corpus doc frequency):
        dictionary terms starting with ``prefix`` ranked (df desc, term
        asc). One vectorized ``starts_with`` scan over the df table +
        ``select_k`` — the df table doubles as the suggester's
        weight-bearing FST input. Fielded ``lang:de`` namespace terms are
        excluded (completions come from the text vocabulary)."""
        dfs = self._dfs()
        if dfs is None or k <= 0:
            return []
        terms = dfs["term"].combine_chunks()
        m = pc.and_(pc.starts_with(terms, prefix),
                    pc.invert(pc.match_substring(terms, pattern=":")))
        sel = pa.table({"term": terms, "df": dfs["df"]}).filter(m)
        if len(sel) == 0:
            return []
        idx = pc.select_k_unstable(sel, k=min(k, len(sel)), sort_keys=[
            ("df", "descending"), ("term", "ascending")])
        sel = sel.take(idx)
        return [(t, int(d)) for t, d in
                zip(sel["term"].to_pylist(), sel["df"].to_pylist())]

    def search_fuzzy(self, query: str, max_edits: int = 1,
                     max_hits: int | None = None) -> np.ndarray:
        """FuzzyQuery analog: every query term expands to its fuzzy term
        set (:meth:`fuzzy_terms`); docs holding ANY expansion (SHOULD
        semantics, Lucene's fuzzy rewrite), sorted ascending."""
        expansions: list[str] = []
        for t in self._query_terms(query):
            expansions.extend(self.fuzzy_terms(t, max_edits))
        return self._union_docs(expansions, max_hits)

    _CLAUSE_RE = None   # compiled lazily (class-level cache)

    def search_query(self, query: str,
                     max_hits: int | None = None) -> np.ndarray:
        """Lucene-QueryParser-analog string surface — the reference's real
        query language (``MultiFieldQueryParser`` wraps exactly this
        grammar, ``ChemicalIndex.java:466-491``). Supported per clause:

        - ``+body`` MUST, ``-body`` MUST_NOT, bare SHOULD (Lucene doc-set
          semantics: MUSTs intersect; SHOULDs only matter when no MUST
          exists; MUST_NOTs always subtract);
        - ``field:value`` composite terms in any role;
        - ``body~`` / ``body~N`` fuzzy (edit distance N, default 1);
        - ``bo?y*`` wildcard, ``pre*`` prefix (same expansion machinery);
        - ``[lo TO hi]`` / ``field:[lo TO hi]`` term range.

        A multi-term-query clause contributes the UNION of its expansions
        (Lucene's rewrite makes the rewritten BooleanQuery one clause);
        expansion bodies are lowercased verbatim (Lucene's
        ``lowercase_expanded_terms`` default) since the analyzer would
        strip ``*``/``?``. A plain body analyzes through the query
        analyzer; multi-token bodies (e.g. ``+foo-bar``) intersect their
        tokens. Returns the sorted doc-id set (``max_hits`` caps)."""
        import re as _re

        if Searcher._CLAUSE_RE is None:
            Searcher._CLAUSE_RE = _re.compile(
                r"[+-]?(?:[\w.]+:)?\[[^\]]*\]|[+-]?\S+")
        fields = set(self.manifest["config"].get("field_columns", []))

        def norm(body: str) -> str:
            # expansion bodies: lowercase verbatim, keep field: prefixes
            if ":" in body:
                f, v = body.split(":", 1)
                if f in fields:
                    return f + ":" + v.lower()
            return body.lower()

        def clause_docs(body: str) -> np.ndarray:
            m = _re.fullmatch(r"(?:([\w.]+):)?\[(\S+) TO (\S+)\]", body)
            if m:
                f, lo, hi = m.groups()
                pre = f + ":" if f and f in fields else ""
                return self._union_docs(self.range_terms(
                    (pre + lo).lower(), (pre + hi).lower()))
            m = _re.fullmatch(r"(.+?)~(\d*)", body)
            if m:
                edits = int(m.group(2)) if m.group(2) else 1
                return self._union_docs(
                    self.fuzzy_terms(norm(m.group(1)), max_edits=edits))
            if "*" in body or "?" in body:
                return self._union_docs(self.wildcard_terms(norm(body)))
            toks = self._query_terms(body)
            if not toks:
                return np.zeros(0, np.int64)
            sets = [d[0] if (d := self._decode_term(t)) is not None
                    else np.zeros(0, np.int64) for t in set(toks)]
            sets.sort(key=len)
            out = sets[0]
            for s in sets[1:]:
                out = out[np.isin(out, s, assume_unique=True)]
            return out

        musts, must_nots, shoulds = [], [], []
        for raw in Searcher._CLAUSE_RE.findall(query):
            if raw.startswith("+") and len(raw) > 1:
                musts.append(clause_docs(raw[1:]))
            elif raw.startswith("-") and len(raw) > 1:
                must_nots.append(clause_docs(raw[1:]))
            else:
                shoulds.append(clause_docs(raw))
        if musts:
            musts.sort(key=len)
            out = musts[0]
            for s in musts[1:]:
                out = out[np.isin(out, s, assume_unique=True)]
        elif shoulds:
            parts = [p for p in shoulds if p.size]
            out = np.unique(np.concatenate(parts)) if parts \
                else np.zeros(0, np.int64)
        else:
            out = np.zeros(0, np.int64)
        for ex in must_nots:
            if ex.size and out.size:
                out = out[~np.isin(out, ex, assume_unique=True)]
        return out if max_hits is None else out[:max_hits]

    def search_fp_scored(self, query: str, k: int) -> list[tuple[int, float]]:
        """The reference's FP-search type (``searchMoleculesByFingerprintMatch``
        :607-637): BooleanQuery MUST over every query term, scored, top-k —
        i.e. BM25 top-k restricted to docs containing ALL query terms.
        Implemented as an uncapped screen + conjunctive verify (exact)."""
        and_docs = self.search_and(query)
        if and_docs.size == 0 or k <= 0:
            return []
        _, cursors = self._cursors(query)
        terms = sorted(cursors)
        acc = np.zeros(and_docs.size, dtype=np.float64)
        for t in terms:                         # ascending clause order
            c = cursors[t]
            pos = np.searchsorted(c.docs, and_docs)
            pos_c = np.minimum(pos, c.docs.size - 1)
            hit = c.docs[pos_c] == and_docs
            w = np.where(hit, c.weight_vector()[pos_c], 0.0)
            for _ in range(c.mult):
                acc = acc + w
        s32 = acc.astype(np.float32)
        order = np.lexsort((and_docs, -s32.astype(np.float64)))[:k]
        return [(int(and_docs[i]), float(s32[i])) for i in order]

    # ------------------------------------------------- two-phase screen/verify
    def search_screen_verify(self, query: str, k: int,
                             prescreen_multiplier: int = 10,
                             prescreen_cap: int = 100_000) -> list[tuple[int, float]]:
        """The reference's substructure-search plan rebuilt
        (``ChemicalIndex.searchMoleculesWithSubstructure:657-727``):

        1. SCREEN: approximate candidates = BM25 top-``min(k*multiplier,
           cap)`` over the query's terms as SHOULD clauses (the FP-screen
           analog, caps per ``ChemicalIndex.java:661`` /
           ``LuceneBenchmark.java:358-365``);
        2. VERIFY: exact containment — candidate must hold EVERY query term
           (the RDKit ``hasSubstructMatch`` analog, here exact conjunctive
           semantics);
        3. collect verified hits carrying the SCREEN score (`:697`), stop
           at ``k`` in screen-rank order.
        """
        n_screen = min(k * prescreen_multiplier, prescreen_cap)
        screened = self.topk(query, n_screen)
        if not screened:
            return []
        terms = set(self._query_terms(query))
        # verify: membership in every term's posting list (sorted arrays)
        decs = {t: self._decode_term(t) for t in terms}
        if any(d is None for d in decs.values()):
            return []
        out: list[tuple[int, float]] = []
        for doc, score in screened:               # screen-rank order
            if all(np.searchsorted(d[0], doc) < d[0].size
                   and d[0][np.searchsorted(d[0], doc)] == doc
                   for d in decs.values()):
                out.append((doc, score))
                if len(out) >= k:
                    break
        return out

    def topk_cached(self, query: str, k: int, mode: str = "bmw",
                    after: tuple[float, int] | None = None) -> list[tuple[int, float]]:
        """LRU-cached :meth:`topk` (Lucene ``LRUQueryCache`` analog).
        Safe because a Searcher's generation view is IMMUTABLE — writes
        create new generations and re-open searchers (T2/T3 design), so
        a cached result can never go stale within one instance. Keyed on
        (query, k, mode, after); ``result_cache_hits``/``_misses``
        expose the hit rate the reference's warm-up protocol implies."""
        if not hasattr(self, "_result_cache"):
            from collections import OrderedDict

            self._result_cache: "OrderedDict[tuple, list]" = OrderedDict()
            self._result_cache_max = 256
            self.result_cache_hits = 0
            self.result_cache_misses = 0
        key = (query, int(k), mode, after)
        hit = self._result_cache.get(key)
        if hit is not None:
            self._result_cache.move_to_end(key)
            self.result_cache_hits += 1
            return list(hit)
        self.result_cache_misses += 1
        res = self.topk(query, k, mode=mode, after=after)
        self._result_cache[key] = list(res)
        if len(self._result_cache) > self._result_cache_max:
            self._result_cache.popitem(last=False)
        return res

    def topk(self, query: str, k: int, mode: str = "bmw",
             after: tuple[float, int] | None = None) -> list[tuple[int, float]]:
        """Top-k with optional search-after pagination: ``after`` is the
        ``(score, doc_id)`` of the LAST hit of the previous page; results
        resume strictly after it in (score desc, doc_id asc) order."""
        if mode == "bmw":
            return self.topk_bmw(query, k, after=after)
        if mode == "wand":
            return self.topk_wand(query, k, after=after)
        if mode == "phrase":
            # scored exact-phrase queries through the same distributed
            # surface (SearcherStage actor pool); no pagination — phrase
            # hit sets are verify-bounded, page via k
            if after is not None:
                raise ValueError("phrase mode does not support search-after")
            return self.topk_phrase(query, k)
        return self.topk_exhaustive(query, k, after=after)

    # --------------------------------------------- reference-API search peers
    def search_and(self, query: str, max_hits: int | None = None) -> np.ndarray:
        """J3: conjunctive containment (BooleanQuery MUST over terms,
        ``ChemicalIndex.java:607-637``) — sorted posting intersection.

        ``max_hits`` mirrors the reference's ``iMaxHits`` cap
        (``ChemicalIndex.java:513``, used at ``LuceneBenchmark.java:358-365``):
        at most that many hits are returned, in ascending doc-id order —
        a head-term query over a web-scale index stays bounded."""
        terms = set(self._query_terms(query))
        if not terms:
            return np.zeros(0, np.int64)
        sets = []
        for t in terms:
            dec = self._decode_term(t)
            if dec is None:
                return np.zeros(0, np.int64)
            sets.append(dec[0])
        sets.sort(key=len)
        out = sets[0]
        for s in sets[1:]:
            out = out[np.isin(out, s, assume_unique=True)]
            if out.size == 0:
                break
        return out if max_hits is None else out[:max_hits]

    def search_or(self, query: str, max_hits: int | None = None) -> np.ndarray:
        """J4: disjunctive union (BooleanQuery SHOULD, ``:538-554``);
        ``max_hits`` caps per the iMaxHits contract (see search_and)."""
        terms = set(self._query_terms(query))
        parts = [d[0] for t in terms if (d := self._decode_term(t)) is not None]
        if not parts:
            return np.zeros(0, np.int64)
        out = np.unique(np.concatenate(parts))
        return out if max_hits is None else out[:max_hits]

    def search_min_should(self, query: str, min_match: int,
                          max_hits: int | None = None) -> np.ndarray:
        """``BooleanQuery.setMinimumNumberShouldMatch`` analog (the knob
        between J3's pure AND and J4's pure OR): docs holding at least
        ``min_match`` DISTINCT query terms, ascending doc-id order.

        Vectorized as one concat of the (already doc-unique) per-term
        posting doc arrays + ``np.unique(return_counts=True)`` — a term
        absent from the index contributes to no doc's count, exactly like
        a SHOULD clause that matches nothing."""
        if min_match <= 0:
            return self.search_or(query, max_hits)
        terms = set(self._query_terms(query))
        parts = [d[0] for t in terms if (d := self._decode_term(t)) is not None]
        if len(parts) < min_match:
            return np.zeros(0, np.int64)
        u, cnt = np.unique(np.concatenate(parts), return_counts=True)
        out = u[cnt >= min_match]
        return out if max_hits is None else out[:max_hits]

    def topk_dismax(self, query: str, k: int = 10,
                    tie: float = 0.1) -> list[tuple[int, float]]:
        """``DisjunctionMaxQuery`` analog (the multi-field scoring rule the
        reference's MultiFieldQueryParser family rewrites into): clause =
        each DISTINCT query term (composite ``field:value`` clauses score
        through the same cursors); ``score(doc) = max_clause_score +
        tie * (sum_of_other_clause_scores)``.

        Float parity with the SQL oracle: per-clause contributions are the
        per-posting BM25 weights; the segment max is order-independent, the
        segment sum runs in ascending clause order (``np.add.reduceat`` is
        sequential below its 128-element pairwise threshold), and the final
        score is the single IEEE expression ``mx + tie * (sm - mx)``. Rank
        comparator: (float32 score desc, doc_id asc)."""
        _, cursors = self._cursors(query)
        parts_d, parts_w = [], []
        for t in sorted(cursors):          # distinct clauses, ascending term
            c = cursors[t]
            parts_d.append(c.docs)
            parts_w.append(c.weight_vector())
        if not parts_d or k <= 0:
            return []
        docs = np.concatenate(parts_d)
        ws = np.concatenate(parts_w)
        order = np.argsort(docs, kind="stable")
        docs_s, ws_s = docs[order], ws[order]
        starts = np.flatnonzero(
            np.concatenate([[True], docs_s[1:] != docs_s[:-1]]))
        mx = np.maximum.reduceat(ws_s, starts)
        sm = np.add.reduceat(ws_s, starts)
        s32 = (mx + tie * (sm - mx)).astype(np.float32)
        u = docs_s[starts]
        top = np.lexsort((u, -s32.astype(np.float64)))[:k]
        return [(int(u[i]), float(s32[i])) for i in top]

    def search_exact(self, text: str, max_hits: int | None = None) -> np.ndarray:
        """J2: exact-match after canonicalization. Canonical form = the token
        multiset (the analyzer is our 'canonical SMILES',
        ``ChemicalIndex.java:574-589``): doc matches iff it has exactly the
        query's tf for every query term and the same total length."""
        toks = analyze_text(text, self.query_cfg)
        if not toks:
            return np.zeros(0, np.int64)
        from collections import Counter
        want = Counter(toks)
        dl_want = len(toks)
        out = None
        for t, tf_want in sorted(want.items()):
            dec = self._decode_term(t)
            if dec is None:
                return np.zeros(0, np.int64)
            docs, tfs, dls = dec[0], dec[1], dec[2]
            m = (tfs == tf_want) & (dls == dl_want)
            cand = docs[m]
            out = cand if out is None else out[np.isin(out, cand, assume_unique=True)]
            if out.size == 0:
                return out
        return out if max_hits is None else out[:max_hits]

    def phrase_candidates(self, tokens: list[str],
                          max_hits: int | None = None) -> np.ndarray:
        """SCREEN phase of phrase search (Lucene ``PhraseQuery`` /
        ``SpanNearQuery`` analog — the reference index has no positional
        surface; this is the fulltext-tier extension, SURVEY §2.10):
        candidate docs that contain every phrase term with tf >= the term's
        multiplicity IN the phrase (the tf refinement makes the screen
        strictly tighter for repeated-term phrases like ``"table table"``
        at zero extra I/O — tf already rides in every posting). Admissible:
        a true phrase match needs at least that many occurrences. Position
        VERIFY runs over the stored text, candidates only — see
        :func:`search_phrases`."""
        from collections import Counter

        if not tokens:
            return np.zeros(0, np.int64)
        out: np.ndarray | None = None
        for t, mult in sorted(Counter(tokens).items()):
            dec = self._decode_term(t)
            if dec is None:
                return np.zeros(0, np.int64)
            docs = dec[0] if mult == 1 else dec[0][dec[1] >= mult]
            out = docs if out is None else out[np.isin(out, docs,
                                                       assume_unique=True)]
            if out.size == 0:
                break
        assert out is not None
        return out if max_hits is None else out[:max_hits]

    def _decode_term_positions(self, term: str,
                               only_docs: np.ndarray | None = None):
        """Decode one term's positional postings from the ``pos_bytes``
        sidecar: ``(docs, tfs, flat_positions)`` with posting *i*'s
        positions at ``[cumsum(tfs)[i-1], cumsum(tfs)[i])``. Tombstoned
        docs are NOT masked here — callers go through
        :meth:`phrase_candidates`, whose ``_decode_term`` screen already
        excludes them.

        ``only_docs`` (sorted) restricts the result to those docs AND —
        the hot-path point — skips DECODING every other posting's
        positions: LEB128 value boundaries are terminator bytes
        (``b & 0x80 == 0``), so one flatnonzero over the raw stream maps
        posting -> byte range without decoding, and only the selected
        postings' slices are gathered and decoded. A phrase with one rare
        term then pays O(candidate positions) on its HEAD terms too, not
        O(head-term postings) (measured 102 s -> sub-second for a
        head+rare phrase at 1.57M docs, BASELINE r4).

        DENSE decodes (candidate set not selective — stopword-pair
        phrases) are the expensive case, so their full per-term result is
        LRU-cached (bounded by total cached positions) and later calls
        subset the cached arrays whatever their candidate set."""
        from org_rdkit_lucene_ray.functions.codec import decode_position_streams

        if not self.store_positions:
            raise ValueError(
                "index was built without store_positions=True — phrase "
                "verify must run over the stored text (search_phrases)")
        cached = self._pos_cache_get(term)
        if cached is not None:
            docs, tfs, pos = cached
            if only_docs is not None:
                sel = np.isin(docs, only_docs, assume_unique=True)
                if not sel.all():
                    pos = pos[np.repeat(sel, tfs)]
                    docs, tfs = docs[sel], tfs[sel]
            if docs.size == 0:
                return None
            return docs, tfs, pos
        docs_l, tfs_l, pos_l = [], [], []
        full_l: list | None = []       # pre-filter arrays; None once any
        for _, tbl, tix in self._bucket_chunks(self._term_bucket(term)):
            i = tix.find(term)
            if i is None:
                continue
            n = tbl["df_chunk"][i].as_py()
            deltas = varint_decode(
                np.frombuffer(tbl["doc_bytes"][i].as_buffer(), np.uint8), n)
            docs = np.cumsum(deltas, dtype=np.int64)
            tfs = varint_decode(
                np.frombuffer(tbl["tf_bytes"][i].as_buffer(), np.uint8), n) \
                .view(np.int64)
            blob = tbl["pos_bytes"][i]
            if not blob.is_valid:
                raise ValueError(
                    f"term {term!r} carries no positions (fielded "
                    "'col:value' terms are whole-value, not positional)")
            stream = np.frombuffer(blob.as_buffer(), np.uint8)
            if only_docs is not None:
                sel = np.isin(docs, only_docs, assume_unique=True)
                n_sel = int(sel.sum())
                if n_sel * 8 < n:
                    # SELECTIVE: skip decoding non-candidate positions
                    # (chunk not fully decoded -> not cacheable)
                    full_l = None
                    if n_sel == 0:
                        continue
                    # value ends without decoding: terminator-byte scan
                    ends = np.flatnonzero((stream & 0x80) == 0)
                    cumtf = np.concatenate([[0], np.cumsum(tfs)])
                    # posting i's bytes: (end of its last value) + 1 back to
                    # (end of previous posting's last value) + 1
                    byte_hi = ends[cumtf[1:] - 1] + 1
                    byte_lo = np.concatenate([[0], byte_hi[:-1]])
                    docs, tfs = docs[sel], tfs[sel]
                    lo, hi = byte_lo[sel], byte_hi[sel]
                    lens = hi - lo
                    out = np.empty(int(lens.sum()), np.uint8)
                    offs = np.concatenate([[0], np.cumsum(lens)])
                    # gather selected slices (few candidates => few slices;
                    # the 1/8 gate above bounds this loop)
                    for j in range(lo.size):
                        out[offs[j]:offs[j + 1]] = stream[lo[j]:hi[j]]
                    pos = decode_position_streams(out, tfs)
                    docs_l.append(docs)
                    tfs_l.append(tfs)
                    pos_l.append(pos)
                    continue
                # DENSE: decode everything once, filter flat (vectorized);
                # the pre-filter arrays are cache-worthy — this is exactly
                # the expensive stopword-term case that recurs across
                # phrase queries
                pos = decode_position_streams(stream, tfs)
                if full_l is not None:
                    full_l.append((docs, tfs, pos))
                if not sel.all():
                    pos = pos[np.repeat(sel, tfs)]
                    docs, tfs = docs[sel], tfs[sel]
                if docs.size:
                    docs_l.append(docs)
                    tfs_l.append(tfs)
                    pos_l.append(pos)
                continue
            pos = decode_position_streams(stream, tfs)
            if full_l is not None:
                full_l.append((docs, tfs, pos))
            docs_l.append(docs)
            tfs_l.append(tfs)
            pos_l.append(pos)
        if full_l:
            self._pos_cache_put(term, (
                np.concatenate([x[0] for x in full_l]),
                np.concatenate([x[1] for x in full_l]),
                np.concatenate([x[2] for x in full_l])))
        if not docs_l:
            return None
        return (np.concatenate(docs_l), np.concatenate(tfs_l),
                np.concatenate(pos_l))

    # positions LRU: caches FULL per-term decodes (the dense stopword
    # case) bounded by total cached position count, so repeated phrase
    # queries over head terms pay the big decode once per actor
    _POS_CACHE_MAX_VALUES = 64_000_000      # ~0.5 GB of int64 positions

    def _pos_cache_get(self, term: str):
        cache = getattr(self, "_pos_cache", None)
        if cache is None:
            return None
        hit = cache.get(term)
        if hit is not None:
            cache.move_to_end(term)
        return hit

    def _pos_cache_put(self, term: str, dec) -> None:
        from collections import OrderedDict

        if not hasattr(self, "_pos_cache"):
            self._pos_cache = OrderedDict()
            self._pos_cache_values = 0
        n = int(dec[2].size)
        if n > self._POS_CACHE_MAX_VALUES:
            return                           # never cache a monster alone
        self._pos_cache[term] = dec
        self._pos_cache_values += n
        while self._pos_cache_values > self._POS_CACHE_MAX_VALUES:
            _, old = self._pos_cache.popitem(last=False)
            self._pos_cache_values -= int(old[2].size)

    def _phrase_chain(self, tokens: list[str]):
        """Shared SCREEN + greedy occurrence chain behind the positional
        phrase surfaces: returns ``(cand, start, cur, alive)`` or None when
        no occurrence chain exists. ``start``/``cur`` are the first/last
        composite ``(cand_rank << 32 | position)`` keys of each chained
        occurrence attempt; the greedy chain finds each start's minimal
        completion (same decision rule as the stored-text
        :func:`_phrase_match_mask`)."""
        cand = self.phrase_candidates(tokens)
        if cand.size == 0:
            return None
        keys: list[np.ndarray] = []
        for t in tokens:
            dec = self._decode_term_positions(t, only_docs=cand)
            if dec is None:                      # screened => present, but be safe
                return None
            docs, tfs, pos = dec
            rank = np.searchsorted(cand, docs)
            k = (np.repeat(rank, tfs) << 32) | pos
            if k.size == 0:
                return None
            keys.append(k)                       # ascending: docs asc, pos asc
        start = keys[0]
        cur = start
        alive = np.ones(cur.size, bool)
        for k in keys[1:]:
            nxt_idx = np.searchsorted(k, cur, side="right")
            ok = nxt_idx < k.size
            nxt = k[np.minimum(nxt_idx, k.size - 1)]
            ok &= (nxt >> 32) == (cur >> 32)     # same candidate doc
            alive &= ok
            cur = np.where(ok, nxt, cur)
        return cand, start, cur, alive

    def phrase_hits(self, tokens: list[str], slop: int = 0,
                    max_hits: int | None = None) -> np.ndarray:
        """Phrase / in-order proximity hits ENTIRELY from the index (needs
        ``store_positions=True``): SCREEN via :meth:`phrase_candidates`,
        then VERIFY on the candidates' decoded positions with the same
        greedy occurrence chain as the stored-text mask
        (:func:`_phrase_match_mask` — both decide ``p_n - p_1 - (n-1) <=
        slop`` over strictly-increasing in-order occurrences), so the two
        layouts return identical hit sets. Cost is O(candidate postings)
        — no stored-text decode per candidate (r3 verdict #7)."""
        chain = self._phrase_chain(tokens)
        if chain is None:
            return np.zeros(0, np.int64)
        cand, start, cur, alive = chain
        span_extra = (cur & 0xFFFFFFFF) - (start & 0xFFFFFFFF) - (len(tokens) - 1)
        good = alive & (span_extra <= slop)
        hits = cand[np.unique(start[good] >> 32)]
        return hits if max_hits is None else hits[:max_hits]

    def _phrase_freqs(self, tokens: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """(docs, exact-phrase frequency) over the candidate set — freq =
        number of start positions that begin a strict-adjacency occurrence
        (Lucene ``PhraseQuery`` freq at slop=0; the greedy chain finds the
        minimal completion per start, which for slop=0 decides each start
        exactly). Same chain as :meth:`phrase_hits`."""
        chain = self._phrase_chain(tokens)
        if chain is None:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        cand, start, cur, alive = chain
        good = alive & ((cur & 0xFFFFFFFF) - (start & 0xFFFFFFFF)
                        == (len(tokens) - 1))
        freq = np.bincount((start[good] >> 32).astype(np.int64),
                           minlength=cand.size)
        hit = freq > 0
        return cand[hit], freq[hit].astype(np.int64)

    def topk_phrase(self, phrase: str, k: int = 10) -> list[tuple[int, float]]:
        """Scored exact-phrase top-k (Lucene ``PhraseQuery``): tf = the
        doc's exact phrase frequency (adjacent occurrences, from the
        positional sidecar), idf = the SUM of the phrase terms' idfs
        (duplicates counted — Lucene's multi-term ``Weight`` convention),
        fed through the searcher's ACTIVE similarity's weight formula
        (:meth:`_weight_arrays` — the same seam every other scored surface
        uses, so phrase ranking under ``similarity="classic"`` is the
        classic formula, never a BM25/classic hybrid). Under the default
        BM25:

            score = (sum_t idf(t)) * freq*(k1+1) / (freq + k1*(1-b+b*dl/avgdl))

        Ties break to the smaller doc id (K1 comparator). Requires
        ``store_positions=True``."""
        tokens = self._query_terms(phrase)
        if not tokens:
            return []
        docs, freq = self._phrase_freqs(tokens)
        if docs.size == 0:
            return []
        # dl rides every posting: take it from the first term's decode
        d0 = self._decode_term(tokens[0])
        dl = d0[2][np.searchsorted(d0[0], docs)].astype(np.float64)
        idf_sum = float(sum(self._sim_idf(t) for t in tokens))
        scores = self._weight_arrays(idf_sum, freq.astype(np.float64), dl)
        order = np.lexsort((docs, -scores.astype(np.float32)))[:k]
        return [(int(docs[i]), float(scores[i])) for i in order]

    def _fwd_files(self) -> list[str]:
        out = []
        for gd in self._gdirs:
            fwd = os.path.join(gd, "fwd")
            if os.path.isdir(fwd):
                out.extend(os.path.join(fwd, f) for f in sorted(os.listdir(fwd))
                           if f.endswith(".parquet"))
        return out

    def _fwd_meta(self) -> list[tuple[str, int, int, bytes | None]]:
        """(path, min_doc, max_doc, url_bloom) per forward fragment — ONE
        footer read per fragment, cached per searcher. Doc ranges prune
        ``resolve_urls`` (fragments hold contiguous doc ranges by
        construction); the url bloom (written into the footer at build and
        merge time, state/bloom.py) prunes ``lookup_pk`` to the ~1 fragment
        that can contain the url — the Lucene-term-dictionary analog of J1
        (``searchMoleculeByPK:505-519``). ``None`` bloom (pre-bloom
        fragment) degrades to a scan of that fragment, never a miss."""
        if not hasattr(self, "_fwd_meta_cache"):
            from org_rdkit_lucene_ray.state.bloom import read_url_bloom

            out = []
            for p in self._fwd_files():
                md = pq.read_metadata(p)
                bloom = read_url_bloom(md)
                los, his = [], []
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(0)     # doc_id is column 0
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        los, his = [None], [None]
                        break
                    los.append(st.min)
                    his.append(st.max)
                if los and los[0] is None:
                    out.append((p, -(1 << 62), 1 << 62, bloom))  # no stats: scan
                else:
                    out.append((p, int(min(los)), int(max(his)), bloom))
            self._fwd_meta_cache = out
        return self._fwd_meta_cache

    def _not_deleted(self, t: pa.Table) -> pa.Table:
        if self._deletes is None or not self._deletes.size or not t.num_rows:
            return t
        keep = ~np.isin(t["doc_id"].to_numpy(), self._deletes)
        return t.filter(pa.array(keep))

    def facet_counts(self, query: str, field: str, *,
                     mode: str = "or") -> list[tuple[str, int]]:
        """Lucene faceting analog (SortedSetDocValues facet counts): for
        the query's hit set, hits per value of an indexed field namespace,
        computed by intersecting the hit set with each ``field:value``
        posting list — the fielded postings ARE the doc-values structure
        here. Values with zero hits are omitted; order is (count desc,
        value asc), Lucene's ``FacetResult`` ordering."""
        hits = (self.search_and(query) if mode == "and"
                else self.search_or(query))
        if hits.size == 0:
            return []
        prefix = field + ":"
        out: list[tuple[str, int]] = []
        for term in self.prefix_terms(prefix):
            dec = self._decode_term(term)
            if dec is None:
                continue
            c = int(np.intersect1d(hits, dec[0], assume_unique=True).size)
            if c:
                out.append((term[len(prefix):], c))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out

    def mlt_terms(self, text: str, *, max_terms: int = 10) -> list[str]:
        """MoreLikeThis term selection (Lucene ``MoreLikeThis.
        retrieveInterestingTerms`` analog): analyze the source text with
        the query analyzer, score each distinct term by
        tf-in-source x idf-in-index, keep the top ``max_terms``. Terms the
        index has never seen (df == 0) are skipped, as Lucene MLT does.
        Ranking compares float32 scores with term-asc tie-break — the
        repo's float-parity policy (same domain the oracle CASTs to)."""
        from collections import Counter

        cnt = Counter(analyze_text(text, self.query_cfg))
        scored = []
        for term, tf in cnt.items():
            df = self.df(term)
            if df == 0:
                continue
            scored.append((np.float32(tf * self.idf(term)), term))
        scored.sort(key=lambda x: (-x[0], x[1]))
        return [t for _, t in scored[:max_terms]]

    def more_like_this(self, text: str, *, max_terms: int = 10, k: int = 10,
                       exclude_doc: int | None = None,
                       mode: str = "bmw") -> list[tuple[int, float]]:
        """MoreLikeThis: BM25 top-k for the OR-query of the source text's
        most interesting terms (:meth:`mlt_terms`), optionally excluding
        the source doc itself. Asking for ``k + 1`` and dropping the
        source afterwards yields exactly the ranks of a source-excluded
        ranking (the source occupies at most one slot)."""
        terms = self.mlt_terms(text, max_terms=max_terms)
        if not terms:
            return []
        extra = 1 if exclude_doc is not None else 0
        res = self.topk(" ".join(terms), k + extra, mode=mode)
        if exclude_doc is not None:
            res = [(d, s) for d, s in res if d != exclude_doc]
        return res[:k]

    def search_sorted(self, query: str, *, field: str = "dl", k: int = 10,
                      descending: bool = True, mode: str = "or",
                      after: tuple[int, int] | None = None) -> list[tuple[int, int]]:
        """Lucene ``Sort``/``SortField`` collector (TopFieldCollector):
        rank the query's hit set by a STORED numeric field instead of
        relevance. The forward fragments are the doc-values store; each
        overlapping fragment contributes a footer-range-pruned pushdown
        read and a per-fragment partial top-k, then one global merge —
        the per-segment-collector + ``TopFieldDocs.merge`` shape, so at
        web scale only ``k`` rows per fragment ride the merge.

        Order: (field desc|asc, doc_id asc). Returns ``[(doc_id, value)]``
        of length <= k. Numeric fields only (``dl``, ``warc_ts``-encoded
        int64 — Lucene's NumericDocValues analog). ``after=(value,
        doc_id)`` resumes strictly after that position (paged
        ``TopFieldDocs`` searchAfter) — exact because the predicate is
        per-row, applied before each fragment's partial top-k."""
        hits = (self.search_and(query) if mode == "and"
                else self.search_or(query))
        if hits.size == 0 or k <= 0:
            return []
        lo_id, hi_id = int(hits[0]), int(hits[-1])
        parts_d, parts_v = [], []
        for p, lo, hi, _bloom in self._fwd_meta():
            if hi < lo_id or lo > hi_id:
                continue
            t = pq.read_table(
                p, columns=["doc_id", field],
                filters=[("doc_id", ">=", lo_id), ("doc_id", "<=", hi_id)])
            if not t.num_rows:
                continue
            d = t["doc_id"].to_numpy()
            m = np.isin(d, hits, assume_unique=True)
            if not m.any():
                continue
            d = d[m]
            v = t[field].to_numpy(zero_copy_only=False).astype(np.int64)[m]
            if after is not None:
                # strictly after (value, doc) in the global field order —
                # the TopFieldCollector searchAfter predicate
                av, ad = int(after[0]), int(after[1])
                keep = ((v < av) if descending else (v > av)) | \
                    ((v == av) & (d > ad))
                d, v = d[keep], v[keep]
                if d.size == 0:
                    continue
            order = np.lexsort((d, -v if descending else v))[:k]
            parts_d.append(d[order])
            parts_v.append(v[order])
        if not parts_d:
            return []
        d = np.concatenate(parts_d)
        v = np.concatenate(parts_v)
        order = np.lexsort((d, -v if descending else v))[:k]
        return [(int(d[i]), int(v[i])) for i in order]

    def topk_synonyms(self, query: str, synonyms: dict[str, list[str]],
                      k: int = 10) -> list[tuple[int, float]]:
        """Lucene ``SynonymQuery`` scoring: each query-term occurrence
        expands to its synonym group, and the GROUP scores as a single
        pseudo-term — per-doc tf is the SUM of member tfs, the group df is
        the MAX member df (SynonymQuery's blended docFreq) — so a doc
        matching two synonyms is not double-idf-counted the way a plain OR
        expansion would. Groups contribute in ascending base-term order
        (float64, then one float32 cast), the repo's score-parity protocol.
        """
        occurrences = sorted(self._query_terms(query))
        parts_d, parts_w = [], []
        for base in occurrences:
            grp = sorted({base, *(s.lower() for s in synonyms.get(base, []))})
            docs_l, tfs_l, dls_l, dfs = [], [], [], []
            for t in grp:
                dfs.append(self.df(t))
                dec = self._decode_term(t)
                if dec is None:
                    continue
                docs_l.append(dec[0])
                tfs_l.append(dec[1])
                dls_l.append(dec[2])
            if not docs_l:
                continue
            docs = np.concatenate(docs_l)
            tfs = np.concatenate(tfs_l)
            dls = np.concatenate(dls_l)
            order = np.argsort(docs, kind="stable")
            docs, tfs, dls = docs[order], tfs[order], dls[order]
            starts = np.flatnonzero(
                np.concatenate([[True], docs[1:] != docs[:-1]]))
            gtf = np.add.reduceat(tfs, starts).astype(np.float64)
            w = self._weight_arrays(self._sim_idf_of_df(max(dfs)), gtf,
                                    dls[starts].astype(np.float64))
            parts_d.append(docs[starts])
            parts_w.append(w)
        return _fold_topk(parts_d, parts_w, k)

    _BOOST_RE = None

    def topk_boosted(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Query-time boosts (Lucene ``BoostQuery`` / QueryParser
        ``term^2.5`` grammar): every whitespace clause may carry a
        ``^boost`` suffix; the clause's per-posting weight vector is scaled
        by the boost before the per-doc sum. Unboosted clauses get 1.0.
        Clauses contribute in ascending (term, occurrence) order — the
        same float-parity protocol as :meth:`score_all`."""
        import re as _re

        if Searcher._BOOST_RE is None:
            Searcher._BOOST_RE = _re.compile(r"^(.*?)\^(\d+(?:\.\d+)?)$")
        clauses: list[tuple[str, float]] = []
        for raw in query.split():
            m = Searcher._BOOST_RE.match(raw)
            body, boost = (m.group(1), float(m.group(2))) if m else (raw, 1.0)
            for t in self._query_terms(body):
                clauses.append((t, boost))
        clauses.sort()
        parts_d, parts_w = [], []
        for t, boost in clauses:
            dec = self._decode_term(t)
            if dec is None:
                continue
            parts_d.append(dec[0])
            parts_w.append(boost * dec[6])
        return _fold_topk(parts_d, parts_w, k)

    def search_numeric_range(self, field: str, lo, hi, *,
                             include_lo: bool = True,
                             include_hi: bool = True,
                             max_hits: int | None = None) -> np.ndarray:
        """Lucene ``PointRangeQuery`` / ``NumericDocValues`` range filter
        over a STORED numeric field (``dl``, ``warc_ts``): per-fragment
        predicate-pushdown reads — Parquet row-group statistics play the
        role of the BKD tree's cell bounds, so non-overlapping row groups
        never leave storage. Returns the ascending doc-id set
        (tombstones masked; ``max_hits`` caps like the boolean family)."""
        parts = []
        opl = ">=" if include_lo else ">"
        oph = "<=" if include_hi else "<"
        for p, _lo, _hi, _bloom in self._fwd_meta():
            t = pq.read_table(p, columns=["doc_id", field],
                              filters=[(field, opl, lo), (field, oph, hi)])
            if t.num_rows:
                parts.append(self._not_deleted(t)["doc_id"].to_numpy())
        if not parts:
            return np.zeros(0, np.int64)
        out = np.sort(np.concatenate(parts))
        return out if max_hits is None else out[:max_hits]

    def collapse_topk(self, query: str, field: str,
                      k: int = 10) -> list[tuple[str, int, float]]:
        """Lucene grouping / field collapsing (grouping module's
        ``TopGroups`` with 1 doc per group, Elasticsearch ``collapse``):
        the query's scored hit set keeps only the BEST hit per value of an
        indexed field namespace, and the surviving groups rank by their
        best hit's (score desc, doc asc). The fielded postings are the
        group-assignment doc-values; comparisons happen on float32 scores
        (the repo's rank domain). Returns ``[(field_value, doc_id,
        score)]`` of length <= k."""
        docs, scores = self.score_all(query)
        if docs.size == 0 or k <= 0:
            return []
        prefix = field + ":"
        out: list[tuple[str, int, float]] = []
        for term in self.prefix_terms(prefix):
            dec = self._decode_term(term)
            if dec is None:
                continue
            m = np.isin(docs, dec[0], assume_unique=True)
            if not m.any():
                continue
            d, s = docs[m], scores[m]
            best = np.lexsort((d, -s.astype(np.float64)))[0]
            out.append((term[len(prefix):], int(d[best]), float(s[best])))
        out.sort(key=lambda r: (-np.float64(np.float32(r[2])), r[1]))
        return out[:k]

    def explain(self, query: str, doc_id: int) -> pa.Table:
        """Lucene ``IndexSearcher.explain`` analog: the per-clause score
        breakdown for one (query, doc) pair — one row PER OCCURRENCE (the
        same clause multiset the scorers sum), with the exact tf/df inputs
        and each clause's contribution (the exact float64 summand of
        score_all's ascending-term sum, rounded to float32 for the
        display column — the same domain the rank comparator uses)."""
        terms, tfs, dfs, ws = [], [], [], []
        for t in sorted(self._query_terms(query)):
            dec = self._decode_term(t)
            if dec is None:
                continue
            i = int(np.searchsorted(dec[0], doc_id))
            if i >= dec[0].size or int(dec[0][i]) != doc_id:
                continue
            terms.append(t)
            tfs.append(int(dec[1][i]))
            dfs.append(self.df(t))
            ws.append(float(np.float32(dec[6][i])))
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
            "df": pa.array(dfs, pa.int64()),
            "weight": pa.array(ws, pa.float32()),
        })

    def lookup_pk(self, url: str) -> pa.Table:
        """J1: point lookup by primary key (``searchMoleculeByPK:505-519``).

        Per-fragment url blooms (footer metadata) reduce the candidate set
        to the ~1 fragment that can hold the url — O(1) expected file opens
        at any fragment count (vs the pre-r3 scan of every fwd fragment);
        each surviving candidate gets a predicate-pushdown read. A bloom
        false positive (~1-2%) costs one extra read, never a wrong result.
        ``last_lookup_files_opened`` records the opened-file count (tested
        on a multi-fragment index)."""
        from org_rdkit_lucene_ray.pipelines.build import stable_term_hash
        from org_rdkit_lucene_ray.state.bloom import bloom_might_contain

        uh = int(stable_term_hash([url])[0])
        tabs = []
        opened = 0
        schema = None
        for p, _lo, _hi, bloom in self._fwd_meta():
            if bloom is not None and not bloom_might_contain(bloom, uh):
                continue
            opened += 1
            t = self._not_deleted(pq.read_table(p, filters=[("url", "==", url)]))
            schema = t.schema
            tabs.append(t)
        self.last_lookup_files_opened = opened
        if not tabs:
            # every fragment bloom-rejected: empty result with the fwd schema
            files = self._fwd_files()
            schema = pq.read_schema(files[0]) if files else pa.schema(
                [("doc_id", pa.int64()), ("dl", pa.int32()),
                 ("url", pa.string())])
            return schema.empty_table()
        return pa.concat_tables(tabs)

    def resolve_urls(self, doc_ids: list[int]) -> dict[int, str]:
        """J7: top-k doc ids -> urls via pushdown read of JUST the forward
        fragments whose footer doc range overlaps the requested ids."""
        if not doc_ids:
            return {}
        ids = sorted(set(int(d) for d in doc_ids))
        ids_np = np.asarray(ids, dtype=np.int64)
        out: dict[int, str] = {}
        for p, lo, hi, _bloom in self._fwd_meta():
            # any requested id inside this fragment's [lo, hi]?
            i = int(np.searchsorted(ids_np, lo, side="left"))
            if i >= ids_np.size or ids_np[i] > hi:
                continue
            t = pq.read_table(
                p, columns=["doc_id", "url"],
                filters=[("doc_id", ">=", ids[0]), ("doc_id", "<=", ids[-1])],
            )
            if t.num_rows:
                m = pc.is_in(t["doc_id"], value_set=pa.array(ids, pa.int64()))
                sel = t.filter(m)
                out.update(zip(sel["doc_id"].to_pylist(), sel["url"].to_pylist()))
        return out


def _after_of_batch(batch: pa.Table):
    """Optional per-query search-after columns (``after_score:float``,
    ``after_doc:int``; null = first page) — the K2 collector-factory
    surface at the Dataset level."""
    names = batch.column_names
    if "after_score" not in names or "after_doc" not in names:
        return None
    return list(zip(batch["after_score"].to_pylist(),
                    batch["after_doc"].to_pylist()))


class SearcherStage:
    """``map_batches`` actor: batch of queries in, top-k result rows out.

    Optional per-row ``after_score``/``after_doc`` columns resume each
    query strictly after that (score, doc) position (search-after
    pagination). Output schema (FIXTURES.md §3): query_id:int32,
    rank:int32, doc_id:int64, url:string, score:float32."""

    def __init__(self, index_dir: str, mode: str = "bmw", default_k: int = 10,
                 resolve_urls: bool = True, generation: str | None = None,
                 warm_top_terms: int = 16, similarity: str = "bm25"):
        # serving actor: eager residency — init cost is amortized over the
        # actor's lifetime and queries must never pay a first-probe load
        # (lazy stays the default for driver-side / one-shot searchers)
        self.searcher = Searcher(index_dir, generation,
                                 warm_top_terms=warm_top_terms,
                                 similarity=similarity, residency="eager")
        self.mode = mode
        self.default_k = default_k
        self.resolve = resolve_urls

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        ks = batch["k"].to_pylist() if "k" in batch.column_names else None
        afters = _after_of_batch(batch)
        for i, (qid, q) in enumerate(zip(batch["query_id"].to_pylist(),
                                         batch["query"].to_pylist())):
            k = int(ks[i]) if ks else self.default_k
            after = None
            if afters is not None and afters[i][0] is not None:
                after = (float(afters[i][0]), int(afters[i][1]))
            hits = self.searcher.topk(q, k, mode=self.mode, after=after)
            for r, (d, s) in enumerate(hits):
                qids.append(qid)
                ranks.append(r)
                docs.append(d)
                scores.append(s)
        urls = [None] * len(docs)
        if self.resolve and docs:
            lut = self.searcher.resolve_urls(docs)
            urls = [lut.get(d) for d in docs]
        return pa.table({
            "query_id": pa.array(qids, pa.int32()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "score": pa.array(scores, pa.float32()),
        })


class ShardSearcherStage:
    """``map_batches`` actor for ONE segment shard: emits per-shard top-k
    rows (query_id, doc_id, score, k) for a cross-shard merge."""

    def __init__(self, index_dir: str, shard_id: int, n_shards: int,
                 mode: str = "bmw", default_k: int = 10,
                 generation: str | None = None):
        # serving actor: eager residency (see SearcherStage)
        self.searcher = Searcher(index_dir, generation,
                                 shard=(shard_id, n_shards),
                                 residency="eager")
        self.mode = mode
        self.default_k = default_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, scores, ks = [], [], [], []
        kcol = batch["k"].to_pylist() if "k" in batch.column_names else None
        afters = _after_of_batch(batch)
        for i, (qid, q) in enumerate(zip(batch["query_id"].to_pylist(),
                                         batch["query"].to_pylist())):
            k = int(kcol[i]) if kcol else self.default_k
            after = None
            if afters is not None and afters[i][0] is not None:
                after = (float(afters[i][0]), int(afters[i][1]))
            # per-shard after-filter + cross-shard merge == global
            # search-after: the after predicate is per-doc, so each global
            # page-2 doc is in its own shard's after-filtered top-k
            for d, s in self.searcher.topk(q, k, mode=self.mode, after=after):
                qids.append(qid)
                docs.append(d)
                scores.append(s)
                ks.append(k)
        return pa.table({
            "query_id": pa.array(qids, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float32()),
            "k": pa.array(ks, pa.int32()),
        })


def _n_segments(index_dir: str, generation: str | None = None) -> int:
    """Driver-side segment count (manifest + dir listing only, no data read).

    Segment = the shard granularity of ``topk_sharded`` /
    ``phrase_hits_sharded``: a doc lives in exactly one segment, so shards
    beyond the segment count would be empty actors (measured at soak scale:
    a 1.54M-doc index at the default ``docs_per_segment=1M`` has only 2
    segments, so ``n_shards=4`` left two eager-residency actors idle)."""
    manifest = read_manifest(index_dir, generation)
    gdirs = [os.path.join(index_dir, g)
             for g in manifest.get("includes", [manifest["generation"]])]
    return len({s for gd in gdirs for s in list_segment_ids(gd)})


def topk_sharded(
    index_dir: str,
    queries: pa.Table | rd.Dataset,
    *,
    n_shards: int = 2,
    mode: str = "bmw",
) -> rd.Dataset:
    """Segment-sharded distributed top-k (intra-query parallelism).

    Every query fans out to ``n_shards`` shard actors, each scoring only its
    ``sid % n_shards`` segments with GLOBAL idf/avgdl; the cross-shard merge
    re-applies the (score desc, doc_id asc) comparator per query — exact
    because each global top-k doc is in its own shard's top-k (SURVEY K2).
    On a multi-node cluster each shard actor holds ~1/n of the index.
    """
    ds = rd.from_arrow(queries) if isinstance(queries, pa.Table) else queries
    n_shards = max(1, min(n_shards, _n_segments(index_dir)))
    shards = [
        ds.map_batches(
            ShardSearcherStage,
            fn_constructor_kwargs=dict(index_dir=index_dir, shard_id=i,
                                       n_shards=n_shards, mode=mode),
            batch_format="pyarrow", batch_size=16, concurrency=1,
        )
        for i in range(n_shards)
    ]
    merged = shards[0].union(*shards[1:]) if len(shards) > 1 else shards[0]

    def merge_group(g: pa.Table) -> pa.Table:
        k = int(g["k"][0].as_py())
        docs = g["doc_id"].to_numpy()
        scores = g["score"].to_numpy()
        order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
        return pa.table({
            "query_id": pc.cast(g["query_id"], pa.int32())[:0].combine_chunks()
            if order.size == 0 else
            pa.array([g["query_id"][0].as_py()] * order.size, pa.int32()),
            "rank": pa.array(np.arange(order.size, dtype=np.int32)),
            "doc_id": pa.array(docs[order], pa.int64()),
            "score": pa.array(scores[order], pa.float32()),
        })

    return merged.groupby("query_id").map_groups(merge_group, batch_format="pyarrow")


class PhraseShardStage:
    """``map_batches`` actor for ONE contiguous segment shard of the
    phrase surface: ``(query_id, query[, slop])`` batch in,
    ``(query_id, doc_id)`` phrase-hit rows from this shard's positional
    sidecar out. The shard holds ~1/n of the segments (contiguous doc
    ranges, same layout as :class:`ShardSearcherStage`), so the dense
    all-head-term worst case — where the candidate screen barely prunes
    and the verify chain walks nearly every posting's positions — divides
    its decode + chain work by ``n_shards``."""

    def __init__(self, index_dir: str, shard_id: int, n_shards: int,
                 slop: int = 0, generation: str | None = None):
        self.searcher = Searcher(index_dir, generation,
                                 shard=(shard_id, n_shards),
                                 residency="eager")
        self.slop = slop

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids: list[int] = []
        docs: list[np.ndarray] = []
        slops = (batch["slop"].to_pylist()
                 if "slop" in batch.column_names else None)
        for i, (qid, q) in enumerate(zip(batch["query_id"].to_pylist(),
                                         batch["query"].to_pylist())):
            toks = self.searcher._query_terms(q)
            hits = self.searcher.phrase_hits(
                toks, int(slops[i]) if slops is not None else self.slop)
            qids.extend([int(qid)] * hits.size)
            docs.append(hits)
        return pa.table({
            "query_id": pa.array(qids, pa.int64()),
            "doc_id": pa.array(
                np.concatenate(docs) if docs else np.zeros(0, np.int64),
                pa.int64()),
        })


def phrase_hits_sharded(
    index_dir: str,
    queries: pa.Table | rd.Dataset,
    *,
    n_shards: int = 2,
    slop: int = 0,
) -> rd.Dataset:
    """Segment-sharded distributed phrase search (intra-query
    parallelism for :meth:`Searcher.phrase_hits` — VERDICT r4 #8): every
    phrase fans out to ``n_shards`` shard actors, each screening +
    position-verifying only its contiguous segment range. Docs live in
    exactly one segment, so the union of per-shard hit sets IS the
    global hit set — no merge/dedup step, and exactness is structural.

    Queries: ``(query_id, query[, slop])``; output rows
    ``(query_id, doc_id)`` (unordered — phrase hits are a membership
    set, same contract as :class:`SetSearcherStage`)."""
    ds = rd.from_arrow(queries) if isinstance(queries, pa.Table) else queries
    n_shards = max(1, min(n_shards, _n_segments(index_dir)))
    shards = [
        ds.map_batches(
            PhraseShardStage,
            fn_constructor_kwargs=dict(index_dir=index_dir, shard_id=i,
                                       n_shards=n_shards, slop=slop),
            batch_format="pyarrow", batch_size=16, concurrency=1,
        )
        for i in range(n_shards)
    ]
    return shards[0].union(*shards[1:]) if len(shards) > 1 else shards[0]


class SetSearcherStage:
    """``map_batches`` actor for the SET-returning search family (boolean /
    parser / fuzzy / prefix / wildcard / free — any Searcher method taking
    ``(query, **kwargs)`` and returning a doc-id array): batch of queries
    in, ``(query_id, doc_id)`` membership rows out. The batch analog of the
    reference's per-thread search dispatch (``LuceneBenchmark.runTest``
    :352-382) for the uncollected search types."""

    def __init__(self, index_dir: str, method: str = "search_query",
                 method_kwargs: dict | None = None,
                 generation: str | None = None):
        # serving actor: eager residency (see SearcherStage)
        self.searcher = Searcher(index_dir, generation, residency="eager")
        self.fn = getattr(self.searcher, method)
        self.kwargs = method_kwargs or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs = [], []
        for qid, q in zip(batch["query_id"].to_pylist(),
                          batch["query"].to_pylist()):
            hits = self.fn(q, **self.kwargs)
            qids.extend([int(qid)] * len(hits))
            docs.extend(int(d) for d in hits)
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         "doc_id": pa.array(docs, pa.int64())})


def _query_blocks(queries: pa.Table | rd.Dataset, concurrency) -> rd.Dataset:
    """Driver-side split of a known-size Arrow query table into blocks (no
    Repartition exchange); Dataset inputs repartition as before."""
    n_blocks = max(int(concurrency) if not isinstance(concurrency, tuple)
                   else concurrency[1], 1) * 2
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(n_blocks, queries.num_rows))
        step = -(-queries.num_rows // n_blocks)
        return rd.from_arrow([queries.slice(i * step, step)
                              for i in range(n_blocks)
                              if i * step < queries.num_rows])
    return queries.repartition(n_blocks)


def run_set_queries(
    index_dir: str,
    queries: pa.Table | rd.Dataset,
    *,
    method: str = "search_query",
    method_kwargs: dict | None = None,
    concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    """Distributed batch surface for the set-returning search family:
    queries table ``(query_id, query)`` -> searcher actor pool ->
    ``(query_id, doc_id)`` rows."""
    if concurrency is None:
        import ray

        concurrency = max(1, int(ray.cluster_resources().get("CPU", 4)) // 2) \
            if ray.is_initialized() else 2
    return _query_blocks(queries, concurrency).map_batches(
        SetSearcherStage,
        fn_constructor_kwargs=dict(index_dir=index_dir, method=method,
                                   method_kwargs=method_kwargs),
        batch_format="pyarrow",
        batch_size=8,
        concurrency=concurrency,
    )


def run_queries(
    index_dir: str,
    queries: pa.Table | rd.Dataset,
    *,
    mode: str = "bmw",
    concurrency: int | tuple[int, int] | None = None,
    resolve_urls: bool = True,
    similarity: str = "bm25",
) -> rd.Dataset:
    """The ``-benchmark`` query workload rebuilt (SURVEY §3.2): queries table
    -> searcher actor pool -> (query_id, rank, doc_id, url, score)."""
    if concurrency is None:
        import ray

        concurrency = max(1, int(ray.cluster_resources().get("CPU", 4)) // 2) \
            if ray.is_initialized() else 2
    # a small query table arrives as ONE block; split driver-side (no
    # AllToAll Repartition — that extra exchange round was the bm25_topk
    # gate's dominant cost at small query counts, BENCH r2)
    ds = _query_blocks(queries, concurrency)
    return ds.map_batches(
        SearcherStage,
        fn_constructor_kwargs=dict(index_dir=index_dir, mode=mode,
                                   resolve_urls=resolve_urls,
                                   similarity=similarity),
        batch_format="pyarrow",
        batch_size=8,
        concurrency=concurrency,
    )


def search_block_join(
    docs: rd.Dataset,
    queries: list[tuple[int, str, str]],
    *,
    child_tokens: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "standard",
) -> rd.Dataset:
    """Parent/child block join (Lucene ``ToParentBlockJoinQuery``):
    every doc's token stream splits into fixed-size CHILD blocks, a
    query ``(t1, t2)`` matches a child containing BOTH terms, and the
    match reports the PARENT — stricter than doc-level AND (the terms
    must co-occur locally), looser than a phrase. Emits distinct
    ``(query_id, doc_id)`` rows.

    Vectorized per batch: one composite ``(row << 32 | chunk)`` key per
    term occurrence, matched across the two terms with ``np.isin`` —
    no per-row loop, no shuffle."""
    from org_rdkit_lucene_ray.functions.analyze import (
        REGISTRY,
        analyze_text,
        tokenize_column,
    )

    cfg = REGISTRY[analyzer]
    qs = []
    for qid, t1, t2 in queries:
        a1 = analyze_text(t1, cfg)
        a2 = analyze_text(t2, cfg)
        if a1 and a2:                 # a term the analyzer drops can't match
            qs.append((qid, a1[0], a2[0]))
    C = int(child_tokens)

    def match(t: pa.Table) -> pa.Table:
        toks = tokenize_column(t[text_col].combine_chunks(), cfg)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        counts = pc.list_value_length(toks) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        intra = np.arange(len(flat), dtype=np.int64) - starts[parents]
        chunk_key = (parents << 32) | (intra // C)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        qids_out, docs_out = [], []
        for qid, t1, t2 in qs:
            k1 = np.unique(chunk_key[
                pc.equal(flat, t1).to_numpy(zero_copy_only=False)])
            k2 = np.unique(chunk_key[
                pc.equal(flat, t2).to_numpy(zero_copy_only=False)])
            both = k1[np.isin(k1, k2, assume_unique=True)]
            rows = np.unique(both >> 32)
            qids_out.append(np.full(rows.size, qid, np.int64))
            docs_out.append(ids[rows])
        return pa.table({
            "query_id": pa.array(np.concatenate(qids_out) if qids_out
                                 else np.zeros(0, np.int64), pa.int64()),
            "doc_id": pa.array(np.concatenate(docs_out) if docs_out
                               else np.zeros(0, np.int64), pa.int64()),
        })

    return docs.map_batches(match, batch_format="pyarrow")


def percolate(
    docs: rd.Dataset,
    queries: list[tuple[int, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "standard",
) -> rd.Dataset:
    """Percolator / Lucene-Monitor analog — REVERSE search: match a
    document STREAM against a broadcast set of stored conjunctive
    queries (alerting / routing / saved-search, the direction to run
    when queries are long-lived and documents flow through). Emits
    ``(query_id, doc_id)`` membership rows — the same contract as
    ``search_and`` computed without any index.

    Scale shape: the stored-query term dictionary broadcasts once; per
    batch, ONE ``index_in`` maps the batch's flat tokens into it and a
    per-(row, query) hit-count fold decides containment — no per-query
    scan, no shuffle (embarrassingly parallel map)."""
    from org_rdkit_lucene_ray.functions.analyze import (
        REGISTRY,
        analyze_text,
        tokenize_column,
    )

    import ray as _ray

    cfg = REGISTRY[analyzer]
    qterms: list[tuple[int, list[str]]] = [
        (qid, sorted(set(analyze_text(q, cfg)))) for qid, q in queries]
    vocab = sorted({t for _, ts in qterms for t in ts})
    v_index = {t: i for i, t in enumerate(vocab)}
    # per-query term-id sets + required counts
    need = [(qid, np.array([v_index[t] for t in ts], np.int64))
            for qid, ts in qterms]
    model = _ray.put((pa.array(vocab, pa.string()), need))

    def match(t: pa.Table) -> pa.Table:
        vocab_arr, need_b = _ray.get(model)
        toks = tokenize_column(t[text_col].combine_chunks(), cfg)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = pc.index_in(flat, value_set=vocab_arr) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(pos.astype(np.float64)) if pos.dtype.kind == "f" \
            else np.ones(len(pos), bool)
        V = len(vocab_arr)
        # distinct (row, vocab term) keys — SPARSE: per query, count how
        # many of its terms each row holds and demand all of them (no
        # rows x vocab dense matrix; memory stays O(distinct hits))
        key = parents[ok] * V + pos[ok].astype(np.int64)
        uk = np.unique(key) if key.size else np.zeros(0, np.int64)
        uk_row = uk // V
        uk_term = uk % V
        qids_out, docs_out = [], []
        for qid, tids in need_b:
            if tids.size == 0:
                continue
            sel = np.isin(uk_term, tids)
            cnt = np.bincount(uk_row[sel], minlength=t.num_rows)
            hit = np.flatnonzero(cnt == tids.size)
            qids_out.append(np.full(hit.size, qid, np.int64))
            docs_out.append(ids[hit])
        return pa.table({
            "query_id": pa.array(np.concatenate(qids_out) if qids_out
                                 else np.zeros(0, np.int64), pa.int64()),
            "doc_id": pa.array(np.concatenate(docs_out) if docs_out
                               else np.zeros(0, np.int64), pa.int64()),
        })

    return docs.map_batches(match, batch_format="pyarrow")


# --------------------------------------------------------------- phrase search
def _phrase_match_mask(toks: pa.ListArray, ptoks: list[str],
                       slop: int) -> np.ndarray:
    """Per-row bool: does the token list contain the phrase terms at
    strictly-increasing positions ``p_1 < ... < p_n`` with total extra gap
    ``p_n - p_1 - (n-1) <= slop``? ``slop=0`` is exact adjacency (Lucene
    ``PhraseQuery``); ``slop>0`` is the in-order ``SpanNearQuery`` contract.

    Vectorized across the whole batch with NO per-row loop: occurrences of
    each phrase term become sorted composite keys ``row_idx << 32 | pos``,
    and one ``searchsorted(side='right')`` per phrase term chains every
    start occurrence to its greedily-nearest completion at once (the greedy
    chain minimizes ``p_n`` for each ``p_1``, so it is exact for the
    span-<=-slop decision). Repeated phrase terms work because the chain
    demands a strictly later key from the SAME sorted occurrence list."""
    n_rows = len(toks)
    if n_rows == 0 or not ptoks:
        return np.zeros(n_rows, bool)
    counts = pc.fill_null(pc.list_value_length(toks), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    intra = np.arange(len(flat), dtype=np.int64) - starts[parents]
    keys: list[np.ndarray] = []
    for t in ptoks:
        hit = pc.fill_null(pc.equal(flat, t), False) \
            .to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(hit)
        if idx.size == 0:
            return np.zeros(n_rows, bool)
        # ascending by construction: flat order IS (row, position) order
        keys.append((parents[idx].astype(np.int64) << 32) | intra[idx])
    start = keys[0]
    cur = start
    alive = np.ones(cur.size, bool)
    for k in keys[1:]:
        pos = np.searchsorted(k, cur, side="right")
        ok = pos < k.size
        nxt = k[np.minimum(pos, k.size - 1)]
        ok &= (nxt >> 32) == (cur >> 32)     # same row
        alive &= ok
        cur = np.where(ok, nxt, cur)
    span_extra = (cur & 0xFFFFFFFF) - (start & 0xFFFFFFFF) - (len(ptoks) - 1)
    good = alive & (span_extra <= slop)
    mask = np.zeros(n_rows, bool)
    mask[np.unique(start[good] >> 32)] = True
    return mask


class PhraseVerifyStage:
    """VERIFY phase of phrase search over the stored text, as a
    ``map_batches`` actor: the screened candidate-id array (one ``ray.put``
    broadcast, fetched ONCE per actor) prunes each batch before the
    tokenizer runs, then :func:`_phrase_match_mask` decides each phrase.
    Verification cost is proportional to candidates, not corpus — the same
    screen/verify economics as ``search_screen_verify`` (K3)."""

    def __init__(self, cands_ref, phrases: list[tuple[int, list[str], int]],
                 cfg: AnalyzerConfig, id_column: str = "doc_id",
                 text_column: str = "text"):
        import ray

        self.cands = ray.get(cands_ref)          # {query_id: sorted int64[]}
        self.union = np.unique(np.concatenate(
            [v for v in self.cands.values() if v.size]
            or [np.zeros(0, np.int64)]))
        self.phrases = phrases                   # (query_id, tokens, slop)
        self.cfg = cfg
        self.id_column = id_column
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from org_rdkit_lucene_ray.functions.analyze import tokenize_column

        out_schema = pa.schema([("query_id", pa.int64()),
                                ("doc_id", pa.int64())])
        ids = batch[self.id_column].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = np.isin(ids, self.union)
        if not keep.any():
            return out_schema.empty_table()
        sub = batch.filter(pa.array(keep))
        ids = ids[keep]
        toks = tokenize_column(sub[self.text_column], self.cfg)
        qids_out, docs_out = [], []
        for qid, ptoks, slop in self.phrases:
            cand = self.cands[qid]
            if not cand.size:
                continue
            in_q = np.isin(ids, cand)
            m = _phrase_match_mask(toks, ptoks, slop) & in_q
            hit = ids[m]
            qids_out.append(np.full(hit.size, qid, np.int64))
            docs_out.append(hit)
        if not qids_out:
            return out_schema.empty_table()
        return pa.table({"query_id": np.concatenate(qids_out),
                         "doc_id": np.concatenate(docs_out)},
                        schema=out_schema)


def search_phrases(
    searcher: Searcher,
    docs: rd.Dataset,
    phrases: list[tuple[int, str, int]],
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    """Phrase / in-order-proximity search (Lucene ``PhraseQuery`` slop=0,
    ``SpanNearQuery(inOrder=true)`` slop>0) as a two-phase distributed plan:

    1. SCREEN (driver, index-only): multiplicity-aware posting intersection
       per phrase (:meth:`Searcher.phrase_candidates`) — no text touched.
    2. VERIFY (streamed): ONE ``map_batches`` pass over the stored-text
       Dataset checks every phrase's positions on its candidates only; the
       candidate sets ride a single ``ray.put`` broadcast. At 100 TB the
       docs Dataset is the stored-field table and the pass is pruned
       further by pushing ``id in candidates`` into the read when the
       candidate count is small.

    On a ``store_positions=True`` index the verify phase reads the
    positional sidecar instead (``Searcher.phrase_hits``) — cost
    O(candidate postings); only ``docs``'s ID column is streamed (one
    ``select_columns`` pass scoping the hits to the caller's dataset —
    never the text), so both layouts return identical rows for the same
    ``docs`` scope (tested in test_positions.py).

    ``phrases`` rows are ``(query_id, phrase, slop)``; result rows are
    ``(query_id, doc_id)`` membership, like the rest of the set-returning
    search family."""
    import ray

    out_schema = pa.schema([("query_id", pa.int64()), ("doc_id", pa.int64())])
    if searcher.store_positions:
        qids_out, docs_out = [], []
        for qid, phrase, slop in phrases:
            ptoks = analyze_text(phrase, searcher.query_cfg)
            hit = searcher.phrase_hits(ptoks, int(slop))
            qids_out.append(np.full(hit.size, int(qid), np.int64))
            docs_out.append(hit)
        hits_tbl = pa.table({
            "query_id": pa.array(np.concatenate(qids_out)
                                 if qids_out else [], pa.int64()),
            "doc_id": pa.array(np.concatenate(docs_out)
                               if docs_out else [], pa.int64()),
        })
        if hits_tbl.num_rows == 0:
            return rd.from_arrow(out_schema.empty_table())
        # scope the index-wide hits to the docs the caller provided: the
        # docs dataset defines the searchable universe exactly as it does
        # on the stored-text path (each doc id appears in one batch)
        hits_ref = ray.put(hits_tbl)

        def scope(batch: pa.Table) -> pa.Table:
            hits = ray.get(hits_ref)
            keep = np.isin(hits["doc_id"].to_numpy(),
                           batch[id_column].to_numpy(zero_copy_only=False)
                           .astype(np.int64))
            return hits.filter(pa.array(keep)).cast(out_schema)

        return docs.select_columns([id_column]).map_batches(
            scope, batch_format="pyarrow")

    parsed: list[tuple[int, list[str], int]] = []
    cands: dict[int, np.ndarray] = {}
    for qid, phrase, slop in phrases:
        ptoks = analyze_text(phrase, searcher.query_cfg)
        parsed.append((int(qid), ptoks, int(slop)))
        cands[int(qid)] = searcher.phrase_candidates(ptoks)
    ref = ray.put(cands)
    if concurrency is None:
        concurrency = max(1, int(ray.cluster_resources().get("CPU", 4)) // 2) \
            if ray.is_initialized() else 2
    return docs.map_batches(
        PhraseVerifyStage,
        fn_constructor_kwargs=dict(cands_ref=ref, phrases=parsed,
                                   cfg=searcher.query_cfg,
                                   id_column=id_column,
                                   text_column=text_column),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
