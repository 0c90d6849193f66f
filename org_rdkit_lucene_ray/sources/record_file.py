"""Raw record-file source/sink — the S1/S2 raw-bytes ingest path.

Reference analogs:
- S1 ``addSDFFileToIndex`` opens a file with TRANSPARENT GUNZIP by
  extension (``ChemicalIndex.java:242-245``) and streams records;
- S2 ``SDFParser.readSdfRecord`` accumulates lines until the ``$$$$``
  sentinel and attaches dataset/record-number provenance
  (``sdf/SDFParser.java:98-123``, constants ``sdf/SDFRecord.java:54-60``).

Web analog: files of WARC-style records (``functions/html.serialize_records``
format: header lines, blank line, verbatim body) separated by a ``$$$$``
sentinel line, read via ``ray.data.read_binary_files`` -> a batched split +
parse producing the pages schema plus provenance columns
``(source_file, record_no)``. Same contract as the reference: a record BODY
must not contain a bare ``$$$$`` line (the SDF format has the identical
constraint on its sentinel).

One input FILE is the unit of parallelism (files are the reference's unit
too); at scale, keep files at ~10-500 MB so ``read_binary_files`` blocks
stay bounded.
"""

from __future__ import annotations

import gzip
import os

import pyarrow as pa
import ray.data as rd

from org_rdkit_lucene_ray.functions.html import parse_record, serialize_records

RECORD_SENTINEL = "\n$$$$\n"

RECORD_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("html", pa.binary()),
    ("source_file", pa.string()),
    ("record_no", pa.int64()),     # provenance: position within the file
])


def write_record_files(table: pa.Table, out_dir: str, *,
                       records_per_file: int = 1000,
                       gzip_files: bool = False,
                       exclude: tuple[str, ...] = ()) -> list[str]:
    """Serialize a pages-schema table into record files (S6-style sink for
    the raw format). ``gzip_files`` writes ``.gz`` (the reader gunzips by
    extension, mirroring the reference)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for fi, start in enumerate(range(0, table.num_rows, records_per_file)):
        chunk = table.slice(start, records_per_file)
        recs = serialize_records(chunk, exclude=exclude).to_pylist()
        payload = RECORD_SENTINEL.join(recs).encode("utf-8")
        name = f"records-{fi:05d}.rec" + (".gz" if gzip_files else "")
        path = os.path.join(out_dir, name)
        if gzip_files:
            # fixed mtime -> deterministic bytes across runs (resume parity)
            with gzip.GzipFile(path, "wb", mtime=0) as fh:
                fh.write(payload)
        else:
            with open(path, "wb") as fh:
                fh.write(payload)
        paths.append(path)
    return paths


def _parse_file(data: bytes, path: str) -> pa.Table:
    # transparent gunzip (ChemicalIndex.java:242-245 analog). Ray's
    # read_binary_files ALREADY decompresses .gz by extension, so detect by
    # the gzip magic instead of the filename — covers both that path and
    # raw byte streams handed in directly.
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    text = data.decode("utf-8")
    rows = []
    for i, rec in enumerate(text.split(RECORD_SENTINEL)):
        if not rec.strip():
            continue
        r = parse_record(rec)
        rows.append({
            "url": r.get("url"),
            "warc_ts": r.get("warc_ts"),
            "lang": r.get("lang"),
            "html": r.get("html", "").encode("utf-8"),
            "source_file": path,
            "record_no": i,
        })
    return pa.Table.from_pylist(rows, schema=RECORD_SCHEMA)


def read_record_files(paths: str | list[str]) -> rd.Dataset:
    """Record files -> pages-schema Dataset with provenance columns.

    ``read_binary_files`` gives one row per file; the batched splitter
    yields every record of the batch's files in one Arrow table (record
    parsing is line-structured by design — the reference's reader is too)."""
    def split(batch: pa.Table) -> pa.Table:
        tabs = [_parse_file(b.as_py(), p.as_py())
                for b, p in zip(batch["bytes"], batch["path"])]
        tabs = [t for t in tabs if t.num_rows]
        return pa.concat_tables(tabs) if tabs else RECORD_SCHEMA.empty_table()

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(split, batch_format="pyarrow")
