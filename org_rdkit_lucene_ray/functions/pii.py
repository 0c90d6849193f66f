"""PII detection / redaction — vectorized, SQL-mirrored.

Pre-training corpora are scrubbed of contact-info PII (C4 does this with
blocklists; BigScience ROOTS and Dolma with regex passes — the approach
here). Three detector classes, each ONE RE2 pattern shared verbatim by

1. :func:`scrub_batch` — pyarrow.compute kernels, the hot path
   (``count_substring_regex`` to count, ``replace_substring_regex`` to
   redact);
2. :func:`sql_scrub_expr` / :func:`sql_count_expr` — DuckDB expressions
   (RE2 family) for the driver's oracle.

Redaction is SEQUENTIAL in the declared order (email -> ipv4 -> phone) and
each count is measured on the text state entering that step; placeholders
are digit-free so later patterns can never match inside an earlier
replacement. No lookarounds — every pattern is RE2-safe so Arrow and
DuckDB agree.

Reference analog: the scalar string-function layer (M11,
``util/StringUtils.java:139-220``) as a validation/cleaning pass.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — order matters and is part of the
# contract. Patterns are deliberately conservative (precision over recall:
# a false redaction destroys training text).
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9]{7,15}\b", "<PHONE>"),
)


def scrub_batch(texts: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Counts per rule + redacted text for one batch; one kernel pass per
    rule, no Python per row. Returns ``{"n_email": ..., "n_ipv4": ...,
    "n_phone": ..., "clean": ...}``."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    out: dict[str, pa.Array] = {}
    cur = texts
    for name, pat, repl in PII_RULES:
        out[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(cur, pattern=pat), pa.int64())
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=repl)
    out["clean"] = cur
    return out


def _sql_quote(pat: str) -> str:
    # DuckDB string literals are escape-free: backslashes pass through to
    # RE2 verbatim; only single quotes need doubling.
    return "'" + pat.replace("'", "''") + "'"


def sql_scrub_expr(col: str) -> str:
    """DuckDB expression for the fully-redacted text (same rule order)."""
    expr = col
    for _, pat, repl in PII_RULES:
        expr = f"regexp_replace({expr}, {_sql_quote(pat)}, '{repl}', 'g')"
    return expr


def sql_count_expr(col: str, rule: str) -> str:
    """DuckDB expression counting ``rule`` matches on the text state
    ENTERING that rule's step (mirrors the sequential contract)."""
    expr = col
    for name, pat, repl in PII_RULES:
        if name == rule:
            return f"len(regexp_extract_all({expr}, {_sql_quote(pat)}))::BIGINT"
        expr = f"regexp_replace({expr}, {_sql_quote(pat)}, '{repl}', 'g')"
    raise KeyError(rule)
