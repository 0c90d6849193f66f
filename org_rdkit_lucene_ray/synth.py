"""Deterministic synthetic Common-Crawl-style corpus + query set.

Implements the `input_hint` table shape from BASELINE.json:
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string
where ``text`` is EXACTLY ``functions.html.extract_text(html)`` — the golden
column for the byte-identical-extraction invariant — and the vocabulary is
Zipf-distributed so head-term skew is present even at small scale
(FIXTURES.md §1). Seeded; no wall clock, no external data.

Reference analog: the ChEMBL SDF + ZINC query files used as the
benchmark-as-conformance corpus (``/root/reference/README.txt:36-50``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 10_000
_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds

_LANGS = np.array(["en", "en", "en", "en", "en", "en", "en", "en", "es", "de", "fr", "zh"])


def vocab(size: int = VOCAB_SIZE) -> list[str]:
    """Deterministic word-like vocabulary; rank 0 is the heaviest head term."""
    syl = ["ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "ne",
           "pa", "qui", "ro", "su", "ta", "ve", "wi", "xo", "yu", "ze"]
    words = []
    for i in range(size):
        if i < 20:
            words.append(syl[i] * 2)                      # short head words
        else:
            a, b, c = i % 20, (i // 20) % 20, (i // 400) % 20
            words.append(syl[a] + syl[b] + syl[c] + str(i % 10))
    return words


def _zipf_probs(size: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = 1.0 / ranks**s
    return p / p.sum()


def gen_pages(
    n_docs: int,
    seed: int = 42,
    dup_url_frac: float = 0.02,
    near_dup_frac: float = 0.02,
    max_len: int = 400,
    len_mean: float = 4.0,
    index_offset: int = 0,
) -> pa.Table:
    """Generate the pages table. ``n_docs`` counts total ROWS including the
    duplicated-url rows (upsert-dedup exercise, J6 / ChemicalIndex.java:801).
    ``index_offset`` shifts the url/ts numbering so independently generated
    chunks stay globally unique (chunked big-corpus generation)."""
    rng = np.random.default_rng(seed)
    words = np.array(vocab())
    probs = _zipf_probs(len(words))

    lens = np.clip(rng.lognormal(mean=len_mean, sigma=0.8, size=n_docs), 10, max_len).astype(np.int64)
    token_ranks = [rng.choice(len(words), size=int(L), p=probs) for L in lens]

    # near-duplicates: row i copies row j's tokens with a few substitutions
    n_near = int(n_docs * near_dup_frac)
    near_targets = rng.choice(n_docs, size=n_near, replace=False) if n_near else np.array([], int)
    for i in near_targets:
        j = int(rng.integers(0, n_docs))
        if j == i:
            continue
        toks = token_ranks[j].copy()
        n_edit = max(1, len(toks) // 50)
        pos = rng.integers(0, len(toks), size=n_edit)
        toks[pos] = rng.choice(len(words), size=n_edit, p=probs)
        token_ranks[i] = toks

    urls, texts, htmls, ts, langs = [], [], [], [], []
    for i in range(n_docs):
        toks = words[token_ranks[i]]
        third = max(1, len(toks) // 3)
        title = " ".join(toks[:third])
        para1 = " ".join(toks[third:2 * third])
        para2 = " ".join(toks[2 * third:])
        # text is the EXACT golden extraction target; '&' exercises entities
        text = f"{title} {para1} & {para2}".strip()
        html = (
            "<html><head><!-- crawler:synthetic -->"
            f"<title>{title}</title>"
            "<style>p { color: #000; }</style></head>"
            f"<body>\n<p>{para1}</p> &amp; <P class=\"x\">{para2}</P>"
            "<script type='text/javascript'>var x = 1 < 2;</script>"
            "</body></html>"
        )
        gi = index_offset + i
        urls.append(f"https://site{gi % 997}.example/p/{gi}")
        texts.append(text)
        htmls.append(html.encode("utf-8"))
        ts.append(_EPOCH_US + (index_offset + i) * 1_000_000)
        langs.append(_LANGS[int(rng.integers(0, len(_LANGS)))])

    # duplicated urls: overwrite the url of some rows with an earlier row's
    # url; the LATER warc_ts row must win dedup (last-write-wins upsert).
    n_dup = int(n_docs * dup_url_frac)
    if n_dup:
        src = rng.choice(n_docs // 2, size=n_dup, replace=False)
        for k, s in enumerate(src):
            tgt = n_docs // 2 + (k * 2) % (n_docs - n_docs // 2)
            urls[tgt] = urls[s]

    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def write_pages_dir(
    out_dir: str,
    n_docs: int,
    n_fragments: int = 8,
    seed: int = 42,
    **kw,
) -> list[str]:
    """Write the corpus as ``n_fragments`` Parquet files (the resume/lineage
    unit). Deterministic: same args -> byte-identical fragment split."""
    os.makedirs(out_dir, exist_ok=True)
    table = gen_pages(n_docs, seed=seed, **kw)
    paths = []
    per = (n_docs + n_fragments - 1) // n_fragments
    for f in range(n_fragments):
        part = table.slice(f * per, per)
        if part.num_rows == 0:
            break
        path = os.path.join(out_dir, f"pages-{f:05d}.parquet")
        pq.write_table(part, path, row_group_size=4096)
        paths.append(path)
    return paths


def gen_queries(seed: int = 42, n_random: int = 40) -> pa.Table:
    """Reference query set (FIXTURES.md §2): 1-5 terms from head/mid/tail of
    the vocabulary + edge cases (absent term, all-head, rarest, duplicates)."""
    rng = np.random.default_rng(seed + 1)
    words = vocab()
    queries: list[str] = [
        words[0],                                   # single heaviest head term
        " ".join(words[:4]),                        # all-head query
        words[-1],                                  # rarest term
        "zzznotaterm",                              # absent from corpus
        f"{words[5]} {words[5]} {words[200]}",      # duplicate terms in query
        f"{words[1]} {words[300]} {words[7000]}",   # head+mid+tail mix
    ]
    for _ in range(n_random):
        n = int(rng.integers(1, 6))
        ranks = [int(r) for r in rng.choice(VOCAB_SIZE, size=n, p=_zipf_probs(VOCAB_SIZE))]
        queries.append(" ".join(words[r] for r in ranks))
    ks = [10] * len(queries)
    ks[1], ks[2] = 1, 100
    return pa.table({
        "query_id": pa.array(range(len(queries)), pa.int32()),
        "query": pa.array(queries, pa.string()),
        "k": pa.array(ks, pa.int32()),
    })


def write_pages_dir_chunked(
    out_dir: str,
    n_docs: int,
    n_fragments: int = 64,
    seed: int = 42,
    **kw,
) -> list[str]:
    """Chunked variant of :func:`write_pages_dir` for bench-scale corpora:
    each fragment is generated independently (seed + fragment id, url/ts
    numbering offset by the fragment base) so peak memory is one fragment,
    not the whole corpus. Dup/near-dup planting happens within fragments."""
    os.makedirs(out_dir, exist_ok=True)
    per = (n_docs + n_fragments - 1) // n_fragments
    paths = []
    for f in range(n_fragments):
        n = min(per, n_docs - f * per)
        if n <= 0:
            break
        table = gen_pages(n, seed=seed + f, index_offset=f * per, **kw)
        path = os.path.join(out_dir, f"pages-{f:05d}.parquet")
        pq.write_table(table, path, row_group_size=4096)
        paths.append(path)
    return paths
