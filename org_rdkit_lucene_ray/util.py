"""Small shared utilities (driver-side log hygiene)."""

from __future__ import annotations

import logging


class _EmptySchemaDivergenceFilter(logging.Filter):
    """Drop Ray Data's cosmetic "RefBundle with a different schema ...
    new schema: (empty)" warning.

    ROOT CAUSE (VERDICT r2 #9, investigated): the warning is produced by
    Ray's streaming executor when an operator emits an empty, schema-less
    block. Our map/aggregate fns all return ``schema.empty_table()`` for
    empty inputs, but Ray's own sort-based shuffle creates empty partitions
    whenever a groupby/aggregate has fewer distinct keys than sort
    partitions, and ``map_groups``/aggregate emit those as zero-column
    blocks the UDF never sees. Reproduction with no user code involved::

        ray.data.from_arrow(pa.table({"k": [i % 5 for i in range(10_000)]}))
          .repartition(16).groupby("k").aggregate(Count())   # warns

    Ray keeps the previous (correct) schema when the divergent one is empty
    (``streaming_executor_state.py`` keeps ``old_schema`` unless
    ``enforce_schemas``), so the condition is harmless; this filter removes
    exactly that message shape — an EMPTY new schema — and nothing else, so
    genuine schema divergences still surface."""

    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        return not ("different schema than the previous" in msg
                    and "new schema: . This may" in msg)


_INSTALLED = False


def install_empty_schema_warning_filter() -> None:
    """Idempotently install the filter on the emitting Ray Data logger."""
    global _INSTALLED
    if _INSTALLED:
        return
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySchemaDivergenceFilter())
    _INSTALLED = True


def md5_hex_column(arr, *, null_value=None):
    """md5 hex digests of a UTF-8 Arrow string column, DuckDB ``md5()``
    parity. Hashes the column's flat UTF-8 buffer by offset slices —
    no per-row str decode/encode round-trip (measured 1.5 vs 2.8 µs/row
    at the 400k tier; the remaining cost is hashlib's per-call floor,
    profiled r4 — a vectorized md5 kernel exists in neither pyarrow nor
    numpy). ``null_value`` is emitted for null rows (e.g. ``""`` to match
    a ``COALESCE`` oracle, or None to propagate nulls).
    """
    import hashlib

    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.type == pa.large_string():
        off_dtype = np.int64
    elif arr.type == pa.string():
        off_dtype = np.int32
    else:
        arr = arr.cast(pa.string())
        off_dtype = np.int32
    n = len(arr)
    if n == 0:
        return pa.array([], pa.string())
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], off_dtype)[arr.offset: arr.offset + n + 1]
    mv = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    md5 = hashlib.md5
    out = [md5(mv[offs[i]: offs[i + 1]]).hexdigest() for i in range(n)]
    if arr.null_count:
        nulls = np.asarray(pa.compute.is_null(arr))
        for i in np.flatnonzero(nulls):
            out[i] = null_value
    return pa.array(out, pa.string())


def md5_digest64_column(arr) -> "np.ndarray":
    """md5 digests of a UTF-8 Arrow string column as an (n, 2) int64 array
    (the 16-byte digest viewed as two little-endian int64 words — the
    paragraph/span dedup key layout). Same buffer-slice path as
    :func:`md5_hex_column`; null rows hash as empty strings."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.type not in (pa.string(), pa.large_string()):
        arr = arr.cast(pa.string())
    off_dtype = np.int64 if arr.type == pa.large_string() else np.int32
    n = len(arr)
    if n == 0:
        return np.zeros((0, 2), np.int64)
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], off_dtype)[arr.offset: arr.offset + n + 1]
    mv = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    md5 = hashlib.md5
    digs = b"".join(md5(mv[offs[i]: offs[i + 1]]).digest() for i in range(n))
    return np.frombuffer(digs, np.int64).reshape(-1, 2)


def fold_buckets(n_buckets=None) -> int:
    """Resolve the bucket count for a hash-bucket fold exchange.

    An explicit ``n_buckets`` wins; otherwise ``ORL_FOLD_BUCKETS`` (env),
    otherwise ``max(64, 2 x cluster CPUs)``. A fixed 64 was the r1-r4
    default everywhere, which caps a fold at 64 ``map_groups`` tasks and
    makes each task materialize ~1/64 of the whole exchange as one Arrow
    table — fine on one 32-cpu node (where this resolves to exactly 64,
    keeping bench numbers comparable), a parallelism and per-task-memory
    ceiling on a 256-node cluster (ADVICE r4). Per-bucket memory bound =
    total exchange bytes / n_buckets: at 2x cluster CPUs each core folds
    ~2 tasks and a 100 TB-scale exchange of B bytes needs
    B / (2 x CPUs) <= worker heap, so raise ORL_FOLD_BUCKETS further for
    very large exchanges on small clusters."""
    if n_buckets:
        return int(n_buckets)
    import os

    env = os.environ.get("ORL_FOLD_BUCKETS")
    if env:
        return int(env)
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) \
            if ray.is_initialized() else 0
    except Exception:
        cpus = 0
    return max(64, 2 * cpus)


def append_bucket_column(t, key_col: str, n_buckets: int | None = None,
                         out_col: str = "_bkt"):
    """Append an int64 hash-bucket column over ``key_col`` (FNV for
    strings, identity-mod for integers) — the shared front half of every
    bucket-fold exchange: sort-shuffle on a few-dozen-to-few-thousand int
    bucket domain (:func:`fold_buckets`) instead of the key domain, real
    work inside ``map_groups``."""
    import numpy as np
    import pyarrow as pa

    n_buckets = fold_buckets(n_buckets)

    keys = t[key_col].combine_chunks() if hasattr(t[key_col], "combine_chunks") \
        else t[key_col]
    if pa.types.is_integer(keys.type):
        b = keys.to_numpy(zero_copy_only=False).astype(np.int64) % n_buckets
    else:
        from org_rdkit_lucene_ray.pipelines.build import stable_term_hash

        b = (stable_term_hash(keys) % np.uint64(n_buckets)).astype(np.int64)
    return t.append_column(out_col, pa.array(b, pa.int64()))


def fold_grouped_counts(parts, key_col: str, count_cols: list[str],
                        n_buckets: int | None = None):
    """Global sum of per-batch partial count rows WITHOUT a sort-based
    key shuffle: bucket each row by a hash of its key (FNV for string
    keys, identity-mod for integers), ``groupby(bucket)`` over the tiny
    int bucket domain, and run the real (hash-table) aggregation inside
    ``map_groups`` with Arrow's vectorized ``group_by``.

    Ray's ``groupby(key).sum`` is a sort-based shuffle over every
    partial row — measured ~10x the cost of this bucket fold on this
    repo's vocabulary-sized exchanges (BASELINE r3); the bucket sort key
    domain is :func:`fold_buckets` ints regardless of vocabulary size.
    Output: one (key, *count_cols) row per distinct key,
    bucket-partitioned.
    """
    import pyarrow as pa

    def with_bucket(t: pa.Table) -> pa.Table:
        return append_bucket_column(t, key_col, n_buckets)

    def fold(g: pa.Table) -> pa.Table:
        gg = g.group_by(key_col).aggregate(
            [(c, "sum") for c in count_cols])
        cols = {key_col: gg[key_col]}
        for c in count_cols:
            cols[c] = gg[f"{c}_sum"].cast(pa.int64())
        return pa.table(cols)

    return (parts.map_batches(with_bucket, batch_format="pyarrow")
                 .groupby("_bkt")
                 .map_groups(fold, batch_format="pyarrow"))
