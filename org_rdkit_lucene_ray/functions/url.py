"""URL canonicalization for webtext dedup — vectorized, SQL-mirrored.

The standard first dedup key of a web-crawl pipeline (CCNet / C4 style)
is the normalized URL. This module defines ONE canonicalization and keeps
two faithful implementations in sync (the analyzer-registry pattern,
``functions/analyze.py``):

1. :func:`normalize_url_column` — pyarrow.compute (RE2), the hot path;
2. :func:`sql_normalize_url`   — a DuckDB expression (also RE2-family),
   used by the driver's oracle so the SQL can never drift.

Semantics (aggressive dedup canonicalization, NOT RFC 3986 equivalence —
two URLs mapping to one key are treated as one page):

1. lowercase the whole URL;
2. drop the fragment (``#...``);
3. drop the scheme (``http://`` / ``https://`` / any ``x://``);
4. drop a leading ``www.``;
5. unify ``?`` -> ``&``, drop tracking params
   (``utm_*``, ``fbclid``, ``gclid``, ``ref``), restore the first ``&``
   back to ``?``;
6. drop an empty trailing query (``?``/``&`` run) and trailing slashes.

Reference analog: the scalar string-function layer (M11,
``util/StringUtils.java:139-220``) applied to the pipeline's PK column.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (pattern, replacement, max_replacements) applied IN ORDER after lower().
# All patterns are RE2-safe (no lookarounds) so Arrow and DuckDB agree.
_TRACKING = r"&(?:utm_[a-z0-9]+|fbclid|gclid|ref)=[^&]*"
_STEPS: tuple[tuple[str, str, int | None], ...] = (
    (r"#.*$", "", None),                 # fragment
    (r"^[a-z][a-z0-9+.-]*://", "", None),  # scheme
    (r"^www\.", "", None),               # host www.
    (r"\?", "&", None),                  # unify separators
    (_TRACKING, "", None),               # tracking params (global)
    (r"&", "?", 1),                      # first separator back to ?
    (r"[?&]+$", "", None),               # empty trailing query
    (r"/+$", "", None),                  # trailing slash
)


def normalize_url_column(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonical dedup key per URL — one RE2 kernel pass per rule, no
    Python per row."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    out = pc.utf8_lower(urls)
    for pat, repl, max_n in _STEPS:
        kwargs = {} if max_n is None else {"max_replacements": max_n}
        out = pc.replace_substring_regex(out, pattern=pat, replacement=repl,
                                         **kwargs)
    return out


def sql_normalize_url(col: str) -> str:
    """DuckDB expression computing the SAME canonical key (RE2 'g' flag =
    Arrow's replace-all; the single-replacement step omits the flag —
    DuckDB's default is first-match-only)."""
    expr = f"lower({col})"
    for pat, repl, max_n in _STEPS:
        # DuckDB string literals are escape-free: a backslash passes through
        # to RE2 verbatim, so only quotes need doubling.
        sql_pat = pat.replace("'", "''")
        flag = "'g'" if max_n is None else "''"
        expr = f"regexp_replace({expr}, '{sql_pat}', '{repl}', {flag})"
    return expr
