"""Perceptual-hash near-dup semantics: aHash determinism, popcount
correctness, banded-bucket recall guarantees, planted-duplicate
recovery through the full Ray pipeline."""

import numpy as np
import pyarrow as pa
import ray.data

from log_analysis_ai_ray.stages import multimodal as mm


def test_popcount64_matches_python_bitcount():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 2**63, 200, dtype=np.int64).view(np.uint64)
    got = mm.popcount64(x)
    want = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def test_ahash_deterministic_and_flip_sensitivity():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    h1 = mm.ahash64(px)
    assert h1 == mm.ahash64(px.copy())
    # flipping one ON-GRID pixel strongly changes few bits (that bit
    # plus possible mean-drift flips), never zero for a strong flip
    px2 = px.copy()
    px2[0, 0] = 255 - px2[0, 0]
    d = int(mm.popcount64(np.array([h1 ^ mm.ahash64(px2)],
                                   dtype=np.uint64))[0])
    assert 1 <= d <= 8
    # off-grid pixels shift only the mean: hamming stays small
    px3 = px.copy()
    px3[1, 1] = 255 - px3[1, 1]
    d3 = int(mm.popcount64(np.array([h1 ^ mm.ahash64(px3)],
                                    dtype=np.uint64))[0])
    assert d3 <= 4


def _brute_pairs(tbl, max_hamming):
    ids = tbl.column("media_id").to_pylist()
    hs = [mm.ahash64(mm.parse_pgm(p))
          for p in tbl.column("payload").to_pylist()]
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(int(hs[i]) ^ int(hs[j])).count("1")
            if d <= max_hamming:
                a, b = sorted((ids[i], ids[j]))
                out[(a, b)] = d
    return out


def test_phash_pipeline_planted_dups_and_parity():
    tbl = mm.synth_media_dups(90, seed=77)
    brute = _brute_pairs(tbl, max_hamming=8)
    ds = ray.data.from_arrow(tbl).repartition(4)
    got_t = mm.phash_pairs(ds, max_hamming=8)
    got = {(a, b): h for a, b, h in zip(
        got_t.column("id_a").to_pylist(),
        got_t.column("id_b").to_pylist(),
        got_t.column("hamming").to_pylist())}
    # no self pairs, canonical order
    assert all(a < b for a, b in got)
    # bucketed pairs are a SUBSET of brute force with identical hamming
    for k, v in got.items():
        assert brute[k] == v
    # pigeonhole guarantee: every brute pair with hamming <= 3 shares
    # an unchanged 16-bit band and MUST be found
    close = {k: v for k, v in brute.items() if v <= 3}
    for k in close:
        assert k in got, k
    # planted exact copies (hamming 0) all recovered
    zero = [k for k, v in brute.items() if v == 0]
    assert zero and all(k in got for k in zero)


def test_synth_media_dups_deterministic():
    a = mm.synth_media_dups(30, seed=77)
    b = mm.synth_media_dups(30, seed=77)
    assert a.equals(b)
