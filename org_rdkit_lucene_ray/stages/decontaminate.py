"""Benchmark n-gram decontamination — the GPT-3-style eval-overlap filter.

Large-scale training pipelines must remove (or at least flag) corpus
documents that share long word n-grams with evaluation benchmarks (Brown
et al. 2020 "Language Models are Few-Shot Learners" appendix C uses
13-gram overlap; Chowdhery et al. 2022 (PaLM) and Touvron et al. 2023
(Llama) use the same shape). The reference engine has no analog — this is
one of the pipeline-completeness operators the engine adds on top of the
``org.rdkit.lucene`` surface.

Shape for 100 TB: the benchmark side is ALWAYS tiny relative to the corpus
(eval suites are a few MB; the corpus is the 100 TB), so its distinct gram
hashes are reduced to one sorted uint64 array and broadcast via ``ray.put``
— fetched once per task process, never re-shipped per batch. The corpus
side is a single stateless ``map_batches`` pass: tokenize -> whole-batch
vectorized gram hashing (:func:`~.dedup._batch_shingles`, one FNV pass over
the flat token column) -> ``np.searchsorted`` membership -> per-doc counts
via ``bincount``. No shuffle at all; the corpus streams.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from org_rdkit_lucene_ray.functions.analyze import REGISTRY, tokenize_column
from org_rdkit_lucene_ray.stages.dedup import _batch_shingles, _bcast

logger = logging.getLogger(__name__)

# Refuse to broadcast a benchmark gram set past this many distinct grams
# (8 B each -> 128 MiB). Real eval suites are orders of magnitude below;
# hitting this means the "benchmark" is actually a corpus and the caller
# should flip the sides or hash-partition (see ngram_decontaminate docs).
BENCH_GRAM_LIMIT = 16_000_000


def benchmark_gram_hashes(bench: rd.Dataset, *, n: int,
                          text_col: str = "text",
                          analyzer: str = "standard") -> np.ndarray:
    """Distinct hashed word-``n``-grams of the benchmark set (sorted
    uint64). Docs shorter than ``n`` tokens contribute ONE whole-doc gram
    (same contract as :func:`~.dedup._batch_shingles`); empty docs none.

    Reduced distributed: each batch emits its distinct hashes, the driver
    unions the (tiny) per-batch results. Guarded by
    :data:`BENCH_GRAM_LIMIT` so a mis-sided call fails loudly instead of
    flooding the object store."""
    cfg = REGISTRY[analyzer]

    def grams_of(t: pa.Table) -> pa.Table:
        toks = tokenize_column(t[text_col].combine_chunks(), cfg)
        _, hashes = _batch_shingles(toks, n)
        return pa.table({"gram": pa.array(np.unique(hashes).view(np.int64),
                                          pa.int64())})

    parts = bench.map_batches(grams_of, batch_format="pyarrow").take_all()
    if not parts:
        return np.zeros(0, np.uint64)
    # sort in the UINT64 domain (membership is searchsorted over uint64);
    # int64-order would scramble around the sign bit
    flat = np.unique(np.array([r["gram"] for r in parts],
                              np.int64).view(np.uint64))
    if flat.size > BENCH_GRAM_LIMIT:
        raise ValueError(
            f"benchmark gram set has {flat.size} distinct {n}-grams "
            f"(> {BENCH_GRAM_LIMIT}); this side must be the SMALL one — "
            "swap the arguments or pre-reduce the benchmark")
    return flat


def ngram_decontaminate(docs: rd.Dataset, bench: rd.Dataset, *, n: int = 13,
                        text_col: str = "text", id_col: str = "doc_id",
                        bench_text_col: str = "text",
                        analyzer: str = "standard") -> rd.Dataset:
    """Per-document benchmark-overlap stats: for each corpus doc, how many
    of its DISTINCT word ``n``-grams appear anywhere in ``bench``.

    Returns a Dataset of ``(doc_id, n_grams, n_dirty, contaminated)`` —
    ``n_grams`` = the doc's distinct gram count, ``n_dirty`` = how many of
    those are benchmark grams, ``contaminated`` = 1 iff any. Callers drop
    (C4/GPT-3 policy) or span-mask on the verdict.

    Gram identity is the rolling FNV-1a combine over FNV-1a token hashes
    (shared with the MinHash shingler) — 64-bit, so hash-collision false
    positives are ~``(grams^2)/2^65`` (negligible at any realistic bench
    size); there are no false negatives.
    """
    bench_hashes = benchmark_gram_hashes(bench, n=n, text_col=bench_text_col,
                                         analyzer=analyzer)
    logger.info("decontaminate: %d distinct benchmark %d-grams",
                bench_hashes.size, n)
    bench_ref = ray.put(bench_hashes)
    cfg = REGISTRY[analyzer]

    def check(t: pa.Table) -> pa.Table:
        grams = _bcast(bench_ref)
        ids = pc.cast(t[id_col], pa.int64())
        toks = tokenize_column(t[text_col].combine_chunks(), cfg)
        parents, hashes = _batch_shingles(toks, n)
        n_grams = np.zeros(len(t), np.int64)
        n_dirty = np.zeros(len(t), np.int64)
        if parents.size:
            np.add.at(n_grams, parents, 1)
            if grams.size:
                pos = np.searchsorted(grams, hashes)
                hit = (pos < grams.size) & (grams[np.minimum(pos, grams.size - 1)]
                                            == hashes)
                np.add.at(n_dirty, parents[hit], 1)
        return pa.table({
            "doc_id": ids,
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_dirty": pa.array(n_dirty, pa.int64()),
            "contaminated": pa.array((n_dirty > 0).astype(np.int64), pa.int64()),
        })

    return docs.map_batches(check, batch_format="pyarrow")
