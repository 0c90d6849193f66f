"""Arrow-IPC chunk format (chunk_format="ipc" — the north star's "mmap'd
segment shards"): zero-copy memory-mapped residency with query parity vs
the Parquet layout, across build, resume, delta add, delete and merge."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from org_rdkit_lucene_ray.config import IndexConfig
from org_rdkit_lucene_ray.pipelines.build import build_index
from org_rdkit_lucene_ray.pipelines.query import Searcher


@pytest.fixture(scope="module")
def ipc_index(ray_session, pages_dir, tmp_path_factory):
    idx = tmp_path_factory.mktemp("ipc_index")
    cfg = IndexConfig(docs_per_segment=256, term_buckets=8, block_size=32,
                      chunk_format="ipc")
    manifest = build_index(pages_dir, str(idx), cfg=cfg)
    return str(idx), manifest


def test_ipc_chunks_on_disk(ipc_index):
    idx, manifest = ipc_index
    assert manifest["config"]["chunk_format"] == "ipc"
    files = glob.glob(os.path.join(idx, "*", "segments", "seg=*", "bucket-*"))
    assert files and all(f.endswith(".arrow") for f in files)


def test_ipc_query_parity_with_parquet(ipc_index, built_index):
    """Every query surface returns the parquet layout's exact answers —
    same docs, same scores (the bytes differ, the postings don't)."""
    s_ipc = Searcher(ipc_index[0])
    s_pq = Searcher(built_index[0])
    for q in ["baba cece", "dada", "fafa gaga baba", "cece dada fafa"]:
        assert s_ipc.topk_bmw(q, 10) == s_pq.topk_bmw(q, 10)
        assert np.array_equal(s_ipc.search_and(q), s_pq.search_and(q))
        assert np.array_equal(s_ipc.search_or(q), s_pq.search_or(q))
    assert s_ipc.df("baba") == s_pq.df("baba")


def test_ipc_buffers_are_memory_mapped(ipc_index):
    """The loaded chunk tables' buffers must come from the mapped file —
    the Arrow allocator must NOT have copied them onto the heap."""
    import pyarrow as pa

    s = Searcher(ipc_index[0])
    alloc_before = pa.total_allocated_bytes()
    s.topk_bmw("baba cece", 10)                 # forces bucket loads + decode
    tables = [t for lst in s._by_bucket.values() for _, t, _ in lst]
    assert tables
    mapped_bytes = sum(t.nbytes for t in tables)
    heap_growth = pa.total_allocated_bytes() - alloc_before
    # decode scratch allocates a little; the table buffers themselves
    # (mapped_bytes) must not be on the Arrow heap
    assert heap_growth < mapped_bytes / 2, (heap_growth, mapped_bytes)


def test_ipc_survives_delta_delete_merge(ray_session, pages_dir,
                                         tmp_path_factory):
    from org_rdkit_lucene_ray.pipelines.merge import (
        add_documents, delete_by_query, merge_generations)
    from org_rdkit_lucene_ray.synth import write_pages_dir

    idx = str(tmp_path_factory.mktemp("ipc_lifecycle"))
    cfg = IndexConfig(docs_per_segment=256, term_buckets=8, block_size=32,
                      chunk_format="ipc")
    build_index(pages_dir, idx, cfg=cfg)
    delta = tmp_path_factory.mktemp("ipc_delta")
    write_pages_dir(str(delta), n_docs=100, n_fragments=2, seed=9)
    add_documents(idx, str(delta))                 # inherits chunk_format
    delete_by_query(idx, "baba", mode="or")
    merge_generations(idx)
    s = Searcher(idx)
    assert s.search_or("baba").size == 0
    assert len(s.topk_bmw("cece dada", 5)) > 0
    files = glob.glob(os.path.join(idx, "*", "segments", "seg=*", "bucket-*"))
    assert files and all(f.endswith(".arrow") for f in files)


def test_chunk_format_guard():
    with pytest.raises(ValueError, match="chunk_format"):
        IndexConfig(chunk_format="orc")
