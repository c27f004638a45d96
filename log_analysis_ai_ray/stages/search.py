"""BM25 ranked retrieval over a document corpus (search family).

Completes the search-index story started by the inverted-index build
(`pipelines/queries.q_inverted_index`): given a term query, rank
documents by Okapi BM25 (Robertson & Zaragoza 2009, "The Probabilistic
Relevance Framework"; idf in the +1 "Lucene" form so it is always
positive).  The reference exposes keyword search over its stored
entries (reference: python/logai_agent.py search/trending tools); BM25
is the ranked-retrieval generalization a web-corpus engine needs.

Scale shape (single scan, mergeable, bounded shuffle):

- ONE pass over the corpus emits, per block, (a) one candidate row per
  document containing >= 1 query term — (doc_id, dl, tf_j per term) —
  and (b) ONE stats row carrying the block's doc count, summed doc
  length, and per-term partial document frequencies.  The stats rows
  reuse the tf_j columns as df_j partials (flagged by ``is_stats``, a
  dedicated column, never an in-band sentinel value).
- The candidate set is exactly the union of the query terms' posting
  lists — the same data a search index would touch — and is the only
  thing materialized; corpus-sized state never leaves the blocks.
- Global stats (N, avgdl, df_j -> idf_j) are an O(blocks) driver fold
  over the stats rows; scoring is a vectorized map over candidates
  with the broadcast stats, followed by per-block partial top-k and an
  O(blocks * k) driver merge — no global sort.

Scores are rounded (default 4 digits) BEFORE ranking so the ordering
is reproducible across engines/summation orders (the DuckDB oracle
ranks by the same rounded value).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import aggregate as agg

K1 = 1.2
B = 0.75


def _tf_matrix(t: pa.Table, text_col: str, terms: list[str]):
    """Whitespace-tokenize ``text_col`` and return (dl, tf) where dl is
    the per-row count of non-empty tokens and tf is rows x terms term
    frequencies.  Vectorized: one split + one equality scan per term."""
    n = t.num_rows
    toks = pc.split_pattern(t.column(text_col).combine_chunks(),
                            pattern=" ")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    dl = np.bincount(parent[nonempty], minlength=n).astype(np.int64)
    tf = np.zeros((n, len(terms)), dtype=np.int64)
    for j, term in enumerate(terms):
        hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
        tf[:, j] = np.bincount(parent[hit], minlength=n)
    return dl, tf


class Bm25Candidates:
    """map_batches stage: candidate rows + one stats row per block.

    Output columns: ``is_stats`` (bool), ``doc_id``, ``dl``, ``tf_0``..
    ``tf_{m-1}``.  Candidate rows (is_stats=False) carry the document's
    length and per-term tfs; the stats row (is_stats=True, doc_id null)
    carries dl = sum of all doc lengths in the block, and tf_j = the
    block's partial document frequency of term j (docs with tf_j > 0),
    plus ``n_docs`` = block row count.  All fields sum across blocks.
    """

    def __init__(self, terms, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.terms = [str(x) for x in terms]
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        dl, tf = _tf_matrix(t, self.text_col, self.terms)
        keep = tf.sum(axis=1) > 0
        m = int(keep.sum())
        ids = t.column(self.id_col).to_numpy(zero_copy_only=False)[keep]
        cols = {
            "is_stats": pa.array(np.r_[np.zeros(m, dtype=bool), True]),
            # the stats row is not a document: null doc_id
            "doc_id": pa.concat_arrays([
                pa.array(ids, type=pa.int64()),
                pa.array([None], type=pa.int64())]),
            "dl": pa.array(np.r_[dl[keep], [dl.sum()]], type=pa.int64()),
            "n_docs": pa.array(np.r_[np.zeros(m, dtype=np.int64), [n]],
                               type=pa.int64()),
        }
        for j in range(len(self.terms)):
            cols[f"tf_{j}"] = pa.array(
                np.r_[tf[keep, j], [(tf[:, j] > 0).sum()]],
                type=pa.int64())
        return pa.table(cols)


def bm25_topk(ds, terms, k: int = 10, k1: float = K1, b: float = B,
              ndigits: int = 4, text_col: str = "text",
              id_col: str = "doc_id") -> pa.Table:
    """Rank documents by BM25 for ``terms``; return the top ``k`` as
    (doc_id, score) with ``score`` rounded to ``ndigits``."""
    terms = [str(x) for x in terms]
    cand = ds.map_batches(Bm25Candidates(terms, text_col, id_col),
                          batch_format="pyarrow").materialize()

    stats = agg._to_arrow(cand.map_batches(
        lambda t: t.filter(t.column("is_stats")),
        batch_format="pyarrow"))
    if "n_docs" not in stats.column_names:
        # zero-block input: schema-less empty (round-4 review)
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "score": pa.array([], type=pa.float64())})
    n_docs = int(pc.sum(stats.column("n_docs")).as_py() or 0)
    sum_dl = int(pc.sum(stats.column("dl")).as_py() or 0)
    if n_docs == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "score": pa.array([], type=pa.float64())})
    avgdl = sum_dl / n_docs or 1.0
    idf = np.array([
        math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        for df in (int(pc.sum(stats.column(f"tf_{j}")).as_py() or 0)
                   for j in range(len(terms)))])

    def score_head(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t.column("is_stats")))
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        tf = np.stack([t.column(f"tf_{j}").to_numpy()
                       for j in range(len(terms))], axis=1)
        dl = t.column("dl").to_numpy().astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * dl[:, None] / avgdl)
        s = np.round((idf * tf * (k1 + 1.0) / denom).sum(axis=1),
                     ndigits)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:k]
        return pa.table({"doc_id": pa.array(ids[order], type=pa.int64()),
                         "score": pa.array(s[order],
                                           type=pa.float64())})

    heads = agg._to_arrow(cand.map_batches(score_head,
                                           batch_format="pyarrow"))
    if heads.num_rows == 0 or "doc_id" not in heads.column_names:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "score": pa.array([], type=pa.float64())})
    s = heads.column("score").to_numpy()
    ids = heads.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -s))[:k]
    return pa.table({"doc_id": pa.array(ids[order], type=pa.int64()),
                     "score": pa.array(s[order], type=pa.float64())})
