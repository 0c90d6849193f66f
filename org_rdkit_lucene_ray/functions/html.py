"""Deterministic HTML -> text extraction (vectorized over Arrow).

Reference analogs:
- ``StringUtils.removeHtmlComments`` (``util/StringUtils.java:194``) ->
  :func:`remove_html_comments`
- ``StringUtils.removeTags`` (``util/StringUtils.java:207``) -> :func:`remove_tags`
- mol block -> canonical SMILES normalization
  (``ChemicalIndex.createCanonicalizedSmilesFromSdf``,
  ``ChemicalIndex.java:972-1046``) -> :func:`extract_text` — the normalizer
  whose output keys document identity. The per-row invariant from
  BASELINE.json: ``extract_text(html) == text`` byte-identical per url.

All transforms are pure pyarrow.compute (re2) kernels — no Python-per-row
loops — and fully deterministic: the same bytes in give the same string out
on every worker, every run.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Entity subset handled by the extractor. Order matters: &amp; is decoded LAST
# so "&amp;lt;" decodes to "&lt;" (single pass, standard behavior).
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def remove_html_comments(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Strip ``<!-- ... -->`` comments (non-greedy, may span lines)."""
    return pc.replace_substring_regex(arr, pattern=r"<!--[\s\S]*?-->", replacement=" ")


def remove_script_style(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Drop <script>/<style> elements INCLUDING their text content."""
    arr = pc.replace_substring_regex(
        arr, pattern=r"(?i)<script[\s\S]*?</script\s*>", replacement=" "
    )
    return pc.replace_substring_regex(
        arr, pattern=r"(?i)<style[\s\S]*?</style\s*>", replacement=" "
    )


def remove_tags(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Replace every remaining ``<...>`` tag with a single space."""
    return pc.replace_substring_regex(arr, pattern=r"<[^>]*>", replacement=" ")


def decode_entities(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    for ent, ch in _ENTITIES:
        arr = pc.replace_substring(arr, pattern=ent, replacement=ch)
    return arr


def collapse_whitespace(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    arr = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(arr)


def extract_text(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """``html:binary`` -> ``text:string``; THE deterministic normalizer.

    Pipeline: utf-8 decode (invalid bytes replaced) -> strip comments ->
    strip script/style -> strip tags -> decode entities -> collapse
    whitespace -> trim.
    """
    if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
        # Cast binary -> string validates utf-8; corpus is generated utf-8.
        s = pc.cast(html, pa.string())
    else:
        s = html
    s = remove_html_comments(s)
    s = remove_script_style(s)
    s = remove_tags(s)
    s = decode_entities(s)
    s = collapse_whitespace(s)
    return s


def truncate_string(arr: pa.Array | pa.ChunkedArray, max_len: int) -> pa.Array:
    """Analog of ``StringUtils.truncateString`` (``util/StringUtils.java:139``)."""
    return pc.utf8_slice_codeunits(arr, start=0, stop=max_len)


def is_empty_after_trimming(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Analog of ``StringUtils.isEmptyAfterTrimming`` (``util/StringUtils.java:171``)."""
    trimmed = pc.utf8_trim_whitespace(arr)
    return pc.or_kleene(pc.is_null(arr), pc.equal(trimmed, ""))
