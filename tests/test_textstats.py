import duckdb
import pyarrow as pa

from log_analysis_ai_ray.functions.hashing import rolling_fingerprint
from log_analysis_ai_ray.stages import textstats


def _t(texts, ids=None):
    ids = ids or list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


def test_langid_basic():
    t = _t([
        "the cat and the dog went to the park and that was fun",
        "der hund und die katze sind nicht mit der maus",
        "le chat est dans la maison pour les vacances",
        "el perro es una mascota para la familia",
        "xyzzy plugh 12345",
    ])
    out = textstats.langid_features(t)
    assert out["pred_lang"].to_pylist() == ["en", "de", "fr", "es", "und"]


def test_langid_matches_oracle_sql():
    texts = [
        "the cat and the dog", "der hund und die katze", "le la les et",
        "el los para con", "no stopwords here xyz", "la la the the",
    ]
    t = _t(texts)
    ours = textstats.langid_features(t)
    con = duckdb.connect()
    con.register("documents", t)
    theirs = con.execute(textstats.oracle_langid_sql()).fetch_arrow_table()
    assert ours["pred_lang"].to_pylist() == \
        theirs["pred_lang"].to_pylist()
    for c in ("c_en", "c_de", "c_fr", "c_es"):
        assert ours[c].to_pylist() == theirs[c].to_pylist()


def test_quality_features():
    t = _t(["AbC 12!", ""])
    out = textstats.quality_features(t)
    assert out["n_chars"].to_pylist() == [7, 0]
    assert out["n_tokens"].to_pylist() == [2, 0]
    # 3 alpha of 7 chars = 428 per-mille
    assert out["alpha_pm"].to_pylist() == [428, 0]


def test_subtokens_bpe_ish():
    t = _t(["hello world42!"])
    out = textstats.subtoken_counts(t)
    # hello | world | 4 | 2 | !  → 5 subtokens; 2 words
    assert out["n_words"].to_pylist() == [2]
    assert out["n_subtokens"].to_pylist() == [5]


def test_fingerprint_matches_scalar_spec():
    texts = ["the quick brown fox jumps over the lazy dog",
             "short", "", "a" * 100]
    t = _t(texts)
    out = textstats.fingerprints(t)
    got = out["fingerprint"].to_pylist()
    expect = [format(rolling_fingerprint(s), "016x") for s in texts]
    assert got == expect


def test_fingerprint_block_boundary_independent():
    a = "boundary independence test string one two three"
    b = "another document entirely with different bytes"
    t_ab = _t([a, b])
    t_a = _t([a])
    f_ab = textstats.fingerprints(t_ab)["fingerprint"].to_pylist()
    f_a = textstats.fingerprints(t_a)["fingerprint"].to_pylist()
    assert f_ab[0] == f_a[0]


def test_lm_scoring_separates_gibberish(ray_session):
    """Corpus-modal text must score fewer bits/trigram than gibberish;
    scores are block-structure invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.textstats import doc_lm_bits

    rng = np.random.default_rng(41)
    normal = ["the quick brown fox jumps over the lazy dog and runs on "
              f"path {i} through the usual fields of text" for i in range(40)]
    gib = ["".join(chr(33 + int(c)) for c in rng.integers(0, 90, 80))
           for _ in range(3)]
    texts = normal + gib
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    out = doc_lm_bits(ray.data.from_arrow(t).repartition(4))
    bits = dict(zip(out["doc_id"].to_pylist(),
                    out["bits_per_trigram"].to_pylist()))
    mean_normal = np.mean([bits[i] for i in range(40)])
    mean_gib = np.mean([bits[i] for i in range(40, 43)])
    assert mean_gib > mean_normal + 2.0  # clear separation

    out2 = doc_lm_bits(ray.data.from_arrow(t).repartition(9))
    assert out.equals(out2)


def test_lm_empty_and_short_docs(ray_session):
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.textstats import doc_lm_bits

    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": pa.array(["", "ab", "abcdef"], type=pa.string())})
    out = doc_lm_bits(ray.data.from_arrow(t))
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["n_trigrams"] == 0 and rows[1]["bits_per_trigram"] == 0
    assert rows[2]["n_trigrams"] == 0
    assert rows[3]["n_trigrams"] == 4
