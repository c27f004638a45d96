"""Deduplication family for training-data pipelines.

- exact dedup: content-hash groupby (keep min doc_id) — the scale path
  groups on a 64-bit content hash so the shuffle moves keys, not text.
- MinHash + LSH near-dup: char-shingle → minhash signatures (vectorized
  numpy over flat byte buffers, segment-min via ufunc.reduceat) →
  banded LSH buckets → candidate pairs → signature-estimated Jaccard.
- SimHash: token-hash bit-majority 64-bit fingerprints; near-dups =
  pairs at small Hamming distance found via 16-bit chunk bucketing.

All randomness is seeded & derived from fixed constants — outputs are
pure functions of the input table, reproducible across parallelism.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import _flat_bytes

MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(text_array, width: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """uint64 rolling hashes of all char shingles, flat across the
    batch + per-doc window offsets. Wraparound polynomial, base 1099511628211
    (FNV prime) — deterministic."""
    buf, offsets = _flat_bytes(text_array)
    n = len(offsets) - 1
    base = np.uint64(1099511628211)
    if len(buf) >= width:
        h = np.zeros(len(buf) - width + 1, dtype=np.uint64)
        b = buf.astype(np.uint64)
        for k in range(width):
            h = h * base + b[k:len(b) - width + 1 + k]
    else:
        h = np.empty(0, dtype=np.uint64)
    # windows for doc i live at [offsets[i], offsets[i+1]-width] inclusive
    starts = np.minimum(offsets[:-1], len(h))
    ends = np.maximum(np.minimum(offsets[1:] - width + 1, len(h)), starts)
    return h, np.stack([starts, ends])


def minhash_signatures(text_array, num_perm: int = 64,
                       width: int = 5, seed: int = 42) -> np.ndarray:
    """(n_docs, num_perm) uint64 signature matrix, fully vectorized.

    Cross-document windows are compacted away first (valid window
    indices gathered per doc), then each permutation is one
    (a*h+b) % p pass + a contiguous segment-min (minimum.reduceat).
    Empty docs (< width bytes) get all-max signatures.
    """
    h, (starts, ends) = shingle_hashes(text_array, width)
    n = len(starts)
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    seg_len = (ends - starts).astype(np.int64)
    nonempty = seg_len > 0
    if len(h) == 0 or not nonempty.any():
        return sig
    # compact valid (in-document) windows into one contiguous array
    total = int(seg_len.sum())
    vidx = np.repeat(starts, seg_len) + (
        np.arange(total) - np.repeat(np.cumsum(seg_len) - seg_len, seg_len))
    hv = h[vidx]
    seg_starts = (np.cumsum(seg_len) - seg_len)[nonempty]
    a, b = _perm_params(num_perm, seed)
    for p in range(num_perm):
        v = (a[p] * hv + b[p]) % MERSENNE
        sig[nonempty, p] = np.minimum.reduceat(v, seg_starts)
    return sig


def simhash64(text_array, seed: int = 42) -> np.ndarray:
    """64-bit SimHash over whitespace tokens (weight 1 per token)."""
    arr = text_array.combine_chunks() if isinstance(
        text_array, pa.ChunkedArray) else text_array
    toks = pc.split_pattern_regex(arr, pattern=r"\s+")
    flat = pc.list_flatten(toks)
    parent = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    n = len(arr)
    keep = np.asarray(pc.not_equal(flat, ""))
    flat = flat.filter(pa.array(keep))
    parent = parent[keep]
    # hash each DISTINCT token once (token vocab ≪ token count), then
    # index_in-join hashes back — same broadcast idiom as enrichment
    uniq = pc.unique(flat)
    uh = np.array([int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
                   for s in uniq.to_pylist()], dtype=np.uint64)
    idx = np.asarray(pc.index_in(flat, uniq), dtype=np.int64)
    tok_hash = uh[idx]
    bits = ((tok_hash[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
    votes = np.zeros((n, 64), dtype=np.int64)
    np.add.at(votes, parent, bits * 2 - 1)
    out = (votes > 0).astype(np.uint64)
    return (out << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)


# ---------------------------------------------------------------------------
# Ray Data pipelines
# ---------------------------------------------------------------------------


def exact_dedup_by_hash(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Scale-path exact dedup: shuffle moves (hash, id) pairs only.
    Returns small table (content_hash, keep_id, n_copies)."""
    from .aggregate import _combine_partials, _to_arrow

    def partial(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        uniq = pc.unique(text)
        uh = pa.array([hashlib.md5(s.encode()).hexdigest()
                       for s in uniq.to_pylist()], type=pa.string())
        idx = pc.index_in(text, uniq)
        tt = pa.table({
            "content_hash": uh.take(idx),
            "keep_id": t.column(id_col),
        }).group_by("content_hash").aggregate(
            [("keep_id", "min"), ([], "count_all")])
        return tt.rename_columns(["content_hash", "keep_id", "n_copies"])

    merged = _combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["content_hash"],
        aggs=[("keep_id", "min"), ("n_copies", "sum")])
    return merged.sort_by("keep_id")


class MinHashStage:
    """Actor-pool stage: append minhash band keys per doc. Permutation
    params built once per actor in __init__."""

    def __init__(self, num_perm: int = 64, bands: int = 16,
                 width: int = 5, seed: int = 42,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.width = width
        self.seed = seed
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(batch.column(self.text_col),
                                 self.num_perm, self.width, self.seed)
        n = sig.shape[0]
        r = self.rows_per_band
        # band key: wraparound polynomial combine of the band's r rows
        # (vectorized; collisions only add candidate checks, never lose dups)
        C = np.uint64(0x9E3779B97F4A7C15)
        keys = np.zeros((n, self.bands), dtype=np.uint64)
        for bi in range(self.bands):
            acc = np.full(n, np.uint64(bi + 1), dtype=np.uint64)
            for k in range(r):
                acc = acc * C + sig[:, bi * r + k]
            keys[:, bi] = acc
        ids = np.asarray(batch.column(self.id_col), dtype=np.int64)
        rep = np.repeat(np.arange(n), self.bands)
        sig_i64 = sig.view(np.int64)  # bit-preserving reinterpret
        return pa.table({
            "band_key": pa.array(keys.ravel().view(np.int64), type=pa.int64()),
            "doc_id": pa.array(ids[rep], type=pa.int64()),
            "sig": pa.array([sig_i64[i].tolist() for i in rep],
                            type=pa.list_(pa.int64())),
        })


def minhash_near_dups(ds, num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.5, concurrency=2) -> pa.Table:
    """MinHash+LSH candidate pairs with signature-estimated Jaccard.

    band rows → groupby(band_key) → pairs inside buckets → global pair
    dedup → est_jaccard filter. Returns (doc_a, doc_b, est_jaccard)."""
    band_rows = ds.map_batches(
        MinHashStage, fn_constructor_kwargs={
            "num_perm": num_perm, "bands": bands},
        concurrency=concurrency, num_cpus=0.5, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column("doc_id"), dtype=np.int64)
        if len(ids) < 2:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64()),
                             "est_jaccard": pa.array([], type=pa.float64())})
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        sigs = np.array(group.column("sig").to_pylist(), dtype=np.int64)[order]
        out_a, out_b, est = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                e = float((sigs[i] == sigs[j]).mean())
                if e >= threshold:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    est.append(e)
        return pa.table({"doc_a": pa.array(out_a, type=pa.int64()),
                         "doc_b": pa.array(out_b, type=pa.int64()),
                         "est_jaccard": pa.array(est, type=pa.float64())})

    pairs = band_rows.groupby("band_key").map_groups(
        bucket_pairs, batch_format="pyarrow")
    # dedup pairs discovered via multiple bands
    from .aggregate import _combine_partials, _to_arrow

    def pair_partial(t: pa.Table) -> pa.Table:
        tt = t.group_by(["doc_a", "doc_b"]).aggregate([("est_jaccard", "max")])
        return tt.rename_columns(["doc_a", "doc_b", "est_jaccard"])

    merged = _combine_partials(
        pairs.map_batches(pair_partial, batch_format="pyarrow"),
        keys=["doc_a", "doc_b"], aggs=[("est_jaccard", "max")])
    out = merged
    if out.num_rows == 0:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "est_jaccard": pa.array([], type=pa.float64())})
    return out.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


def simhash_fingerprints(ds, id_col: str = "doc_id",
                         text_col: str = "text") -> pa.Table:
    """Per-doc 64-bit SimHash (hex string for portability)."""
    def stage(t: pa.Table) -> pa.Table:
        sh = simhash64(t.column(text_col))
        return pa.table({
            id_col: t.column(id_col),
            "simhash": pa.array([format(int(x), "016x") for x in sh],
                                type=pa.string()),
        })

    from .aggregate import _to_arrow
    return _to_arrow(ds.map_batches(stage, batch_format="pyarrow")) \
        .sort_by(id_col)


def ngram_jaccard(text_a: str, text_b: str, width: int = 5) -> float:
    """Exact char-shingle Jaccard (verification oracle for MinHash)."""
    sa = {text_a[i:i + width] for i in range(max(len(text_a) - width + 1, 1))}
    sb = {text_b[i:i + width] for i in range(max(len(text_b) - width + 1, 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
