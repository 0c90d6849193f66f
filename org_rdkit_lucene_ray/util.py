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
