"""Search-hit highlighting — the Lucene ``Highlighter`` analog.

Lucene's highlighter re-analyzes a hit's stored field and returns the
best fragment with the matched terms wrapped in markup; every search UI
over the reference engine needs it (the reference itself renders hit
structures in its Swing demo instead, ``LayoutUtils``-driven — the
markup-fragment form is the standard Lucene contract this engine keeps).

Deterministic contract (SQL-mirrorable, hash-stable):
- the fragment is the token window ``[anchor - window, anchor + window]``
  where ``anchor`` is the FIRST occurrence of any query term in the doc
  (minimum first-position across terms);
- every window token equal to a query term is wrapped in ``<b>...</b>``;
- tokens are the analyzer's (so markup applies to canonical terms, as
  Lucene's ``SimpleHTMLFormatter`` does post-analysis).

Scale shape: hits are bounded (k x queries), so the hit list rides a
single ``ray.put`` broadcast; the corpus streams through one shuffle-free
``map_batches`` that tokenizes ONLY the batch rows that are hits (an
``is_in`` prefilter keeps non-hit docs out of the tokenizer entirely).
The per-hit snippet assembly is a Python loop over that tiny filtered
set, never over the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from org_rdkit_lucene_ray.functions.analyze import REGISTRY, tokenize_column
from org_rdkit_lucene_ray.stages.dedup import _bcast

_SCHEMA = pa.schema([("query_id", pa.int64()), ("rank", pa.int64()),
                     ("doc_id", pa.int64()), ("snippet", pa.string())])


def highlight_hits(docs: rd.Dataset, hits: pa.Table,
                   query_terms: dict[int, list[str]], *, window: int = 5,
                   text_col: str = "text", id_col: str = "doc_id",
                   analyzer: str = "standard") -> rd.Dataset:
    """Snippets for search hits: one ``(query_id, rank, doc_id, snippet)``
    row per ``hits`` row (columns ``query_id``/``rank``/``doc_id``).
    ``query_terms`` maps each query_id to its ANALYZED terms."""
    cfg = REGISTRY[analyzer]
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for qid, rank, doc in zip(hits["query_id"].to_pylist(),
                              hits["rank"].to_pylist(),
                              hits["doc_id"].to_pylist()):
        by_doc.setdefault(int(doc), []).append((int(qid), int(rank)))
    bcast = ray.put((by_doc, {int(q): list(t) for q, t in query_terms.items()}))
    hit_ids = pa.array(sorted(by_doc), pa.int64())

    def fragment(t: pa.Table) -> pa.Table:
        doc_hits, terms = _bcast(bcast)
        sel = t.filter(pc.is_in(pc.cast(t[id_col], pa.int64()),
                                value_set=hit_ids))
        if sel.num_rows == 0:
            return _SCHEMA.empty_table()
        ids = sel[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = tokenize_column(sel[text_col].combine_chunks(), cfg).to_pylist()
        qids, ranks, dids, snips = [], [], [], []
        for doc, tk in zip(ids, toks):
            for qid, rank in doc_hits[int(doc)]:
                tset = terms[qid]
                firsts = [tk.index(term) for term in tset if term in tk]
                if not firsts:          # a hit without any term cannot occur
                    continue            # for term queries; guard anyway
                a = min(firsts)
                win = tk[max(0, a - window):a + window + 1]
                snips.append(" ".join(
                    f"<b>{x}</b>" if x in tset else x for x in win))
                qids.append(qid)
                ranks.append(rank)
                dids.append(int(doc))
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         "rank": pa.array(ranks, pa.int64()),
                         "doc_id": pa.array(dids, pa.int64()),
                         "snippet": pa.array(snips, pa.string())})

    return docs.map_batches(fragment, batch_format="pyarrow")
