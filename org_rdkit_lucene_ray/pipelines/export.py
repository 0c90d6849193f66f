"""Corpus curation/export: quality-filter -> partitioned, resumable sink.

The training-data-pipeline endgame: score documents, keep the ones above a
quality bar, and land them as partitioned Parquet a downstream trainer can
read — with the same resumability contract as the index build (S7 atomic
temp+rename; re-running skips finished fragments, SURVEY §7.4(7)).

Layout: ``out_dir/lang=<lang>/frag-<fragment_id>.parquet`` — one output
file per (input fragment x partition value), so a failed run resumes by
fragment and a reader prunes partitions by directory. At 100 TB the input
fragment is the unit of work and of recovery; nothing is ever globally
shuffled (quality is a per-row function, partitioning is a local fan-out).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from org_rdkit_lucene_ray.stages.textstats import quality_score_batch
from org_rdkit_lucene_ray.state.segment import atomic_write_table


def filter_by_quality(docs: rd.Dataset, min_quality: float,
                      text_col: str = "text") -> rd.Dataset:
    """Rows whose composite quality score >= min_quality (M10 validation-
    predicate analog applied corpus-wide). The score is the SQL-parity
    double from quality_score_batch, so the threshold is oracle-checkable."""
    def score_and_filter(t: pa.Table) -> pa.Table:
        scored = quality_score_batch(t, text_col=text_col)
        return scored.filter(pc.greater_equal(scored["quality"],
                                              pa.scalar(min_quality)))

    return docs.map_batches(score_and_filter, batch_format="pyarrow")


def export_curated(
    input_paths: str | list[str],
    out_dir: str,
    *,
    min_quality: float = 0.7,
    text_col: str = "text",
    partition_col: str = "lang",
    columns: list[str] | None = None,
) -> dict:
    """Curate pages fragments into partitioned Parquet; resumable per
    fragment (skip-if-exists on every output file + a per-fragment _done
    marker committed last)."""
    from org_rdkit_lucene_ray.pipelines.build import plan_fragments, _pin_arrow_threads

    fragments = plan_fragments(input_paths)
    os.makedirs(out_dir, exist_ok=True)

    def export_fragment(batch: pa.Table) -> pa.Table:
        _pin_arrow_threads()
        out = []
        for row in batch.to_pylist():
            fid = int(row["fragment_id"])
            marker = os.path.join(out_dir, f".done-{fid:06d}")
            if os.path.exists(marker):
                with open(marker) as fh:
                    kept = int(fh.read().strip() or 0)
                out.append({"fragment_id": fid, "rows_kept": kept,
                            "resumed_skip": True})
                continue
            t = pq.read_table(row["path"], columns=columns)
            scored = quality_score_batch(t, text_col=text_col)
            keep = scored.filter(pc.greater_equal(scored["quality"],
                                                  pa.scalar(min_quality)))
            kept = 0
            parts = pc.unique(keep[partition_col].combine_chunks())
            for part in parts.to_pylist():
                sub = keep.filter(pc.equal(keep[partition_col], part))
                dst = os.path.join(out_dir, f"{partition_col}={part}",
                                   f"frag-{fid:06d}.parquet")
                atomic_write_table(sub, dst)
                kept += sub.num_rows
            tmp = marker + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(str(kept))
            os.replace(tmp, marker)           # commit point: fragment done
            out.append({"fragment_id": fid, "rows_kept": kept,
                        "resumed_skip": False})
        return pa.Table.from_pylist(out, schema=pa.schema(
            [("fragment_id", pa.int32()), ("rows_kept", pa.int64()),
             ("resumed_skip", pa.bool_())]))

    rows = (rd.from_items(fragments, override_num_blocks=len(fragments))
            .map_batches(export_fragment, batch_format="pyarrow",
                         batch_size=1).take_all())
    return {
        "n_fragments": len(fragments),
        "rows_kept": sum(r["rows_kept"] for r in rows),
        "resumed": sum(1 for r in rows if r["resumed_skip"]),
        "fragments": rows,
    }
