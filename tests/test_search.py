"""BM25 ranked retrieval: parity with a naive in-memory scorer, block
invariance, and degenerate corpora."""

import math

import numpy as np
import pyarrow as pa
import pytest

from log_analysis_ai_ray.stages.search import Bm25Candidates, bm25_topk

K1, B = 1.2, 0.75


def _naive_bm25(docs: list[str], terms: list[str], k: int,
                ndigits: int = 4):
    toks = [[w for w in d.split(" ") if w] for d in docs]
    n = len(docs)
    dl = [len(t) for t in toks]
    avgdl = (sum(dl) / n) if n else 1.0
    if avgdl == 0:
        avgdl = 1.0
    df = {q: sum(1 for t in toks if q in t) for q in terms}
    idf = {q: math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
           for q in terms}
    scored = []
    for i, t in enumerate(toks):
        s = 0.0
        any_hit = False
        for q in terms:
            tf = t.count(q)
            if tf:
                any_hit = True
                s += (idf[q] * tf * (K1 + 1)
                      / (tf + K1 * (1 - B + B * dl[i] / avgdl)))
        if any_hit:
            scored.append((i, round(s, ndigits)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def _corpus(rng, n):
    vocab = ["hash", "join", "scan", "sort", "batch", "row", "spark",
             "table", "merge", "the", "a"]
    return [" ".join(rng.choice(vocab, size=rng.integers(3, 40)))
            for _ in range(n)]


def _ds(docs, blocks=1):
    import ray.data

    t = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                  "text": pa.array(docs, type=pa.string())})
    ds = ray.data.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_bm25_matches_naive(ray_session):
    rng = np.random.default_rng(17)
    docs = _corpus(rng, 300)
    terms = ["hash", "join", "spark"]
    got = bm25_topk(_ds(docs, blocks=1), terms, k=10)
    want = _naive_bm25(docs, terms, 10)
    assert got.column("doc_id").to_pylist() == [i for i, _ in want]
    np.testing.assert_allclose(got.column("score").to_numpy(),
                               [s for _, s in want], atol=1e-9)


def test_bm25_block_invariance(ray_session):
    rng = np.random.default_rng(23)
    docs = _corpus(rng, 400)
    terms = ["merge", "scan"]
    one = bm25_topk(_ds(docs, blocks=1), terms, k=15)
    many = bm25_topk(_ds(docs, blocks=7), terms, k=15)
    assert one.column("doc_id").to_pylist() == \
        many.column("doc_id").to_pylist()
    np.testing.assert_allclose(one.column("score").to_numpy(),
                               many.column("score").to_numpy())


def test_bm25_absent_term_and_empty(ray_session):
    docs = ["the a the", "a a a"]
    out = bm25_topk(_ds(docs), ["zebra"], k=5)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "score"]
    empty = bm25_topk(_ds([""]), ["hash"], k=5)
    assert empty.num_rows == 0


def test_candidate_stats_row():
    t = pa.table({"doc_id": pa.array([7, 8, 9], type=pa.int64()),
                  "text": pa.array(["hash join hash", "", "the end"])})
    out = Bm25Candidates(["hash", "end"])(t)
    stats = out.filter(out.column("is_stats")).to_pylist()[0]
    assert stats["n_docs"] == 3
    assert stats["dl"] == 3 + 0 + 2
    assert stats["tf_0"] == 1  # df partial: docs containing 'hash'
    assert stats["tf_1"] == 1  # docs containing 'end'
    assert stats["doc_id"] is None
    cand = out.filter(pa.compute.invert(out.column("is_stats")))
    assert cand.column("doc_id").to_pylist() == [7, 9]
    assert cand.column("tf_0").to_pylist() == [2, 0]
