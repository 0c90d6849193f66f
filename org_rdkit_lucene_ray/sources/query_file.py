"""Query-file reader + CSV results sink (the benchmark harness I/O layer).

Reference analogs:
- S3 SMILES query-file reader (``LuceneBenchmark.java:271-288``): line
  reader with a [start, end] row-range filter, tab->space normalization,
  take the first whitespace token per line.
- S6 CSV results writer (``LuceneBenchmark.writeResultFileHeader/Row``,
  ``LuceneBenchmark.java:435-500``): header-once append CSV of per-query
  results.
- K4 random task order (``LuceneBenchmark.java:390-401``): seeded
  ``random_shuffle`` over the query table.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def read_query_file(
    path: str,
    *,
    first_row: int = 0,
    last_row: int | None = None,
    default_k: int = 10,
    shuffle_seed: int | None = None,
) -> rd.Dataset:
    """Text file -> queries Dataset ``(query_id:int32, query:string, k:int32)``.

    One query per line; tabs normalized to spaces; blank lines dropped;
    rows outside [first_row, last_row] filtered (K5). With ``shuffle_seed``
    the rows are randomly re-ordered, seeded (K4 —
    reproducible unlike the reference's bare ``Math.random()``).
    """
    # query files are tiny (the reference's LineNumberReader path,
    # LuceneBenchmark.java:271-288): read on the driver so line numbers —
    # the row-range filter's coordinate system — are stable, then hand the
    # table to Ray Data for the distributed part.
    with open(path) as fh:
        lines = fh.read().splitlines()
    tbl = pa.table({"query": pa.array(lines, pa.string())})
    q = pc.utf8_trim_whitespace(
        pc.replace_substring(tbl["query"].combine_chunks(), "\t", " "))
    tbl = pa.table({"query": q})
    keep = pc.not_equal(q, "")
    tbl = tbl.filter(keep)
    n = tbl.num_rows
    tbl = tbl.add_column(0, "query_id", pa.array(range(n), pa.int32()))
    tbl = tbl.append_column("k", pa.array([default_k] * n, pa.int32()))
    lo, hi = first_row, (last_row if last_row is not None else n - 1)
    tbl = tbl.filter(pc.and_(
        pc.greater_equal(tbl["query_id"], lo),
        pc.less_equal(tbl["query_id"], hi)))
    out = rd.from_arrow(tbl)
    if shuffle_seed is not None:
        out = out.random_shuffle(seed=shuffle_seed)
    return out


RESULTS_CSV_COLUMNS = ["query_id", "rank", "doc_id", "url", "score"]


def write_results_csv(results: rd.Dataset, out_dir: str) -> None:
    """Results Dataset -> CSV directory (header once per shard file).

    The reference synchronizes one shared CSV across threads
    (``LuceneBenchmark.java:435-500``); a distributed sink writes one shard
    per block instead — same rows, no lock."""
    results.write_csv(out_dir)
