"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: the query matrix is broadcast (ray.put →
  actor __init__), each batch contributes a numpy matmul partial top-k,
  and the driver merges partials (k is small). One pass, no shuffle.
- LSH-bucketed variant (scale path): seeded random hyperplanes give
  each vector a sign-bit bucket; candidates = vectors whose bucket is
  within Hamming distance ``probe_radius`` (default 2) of the query's
  bucket; exact cosine within candidates. At 10^12 rows, bucketing
  turns the scan into a targeted read when the bucket id is a
  partition key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _batch_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 numpy matrix (zero-copy flat)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(arr.values, dtype=np.float64)
    offsets = np.asarray(arr.offsets)
    d = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
    return flat.reshape(len(arr), d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


class BruteForceTopK:
    """map_batches stage: per-batch cosine top-k against the broadcast
    query matrix; emits (query_id, vec_id, sim) partial rows."""

    def __init__(self, queries_ref, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        q = (ray.get(queries_ref)
             if isinstance(queries_ref, ray.ObjectRef) else queries_ref)
        self.query_ids = np.asarray(q["ids"], dtype=np.int64)
        self.Q = _normalize(np.asarray(q["matrix"], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _normalize(_batch_matrix(batch.column(self.vec_col)))
        ids = np.asarray(batch.column(self.id_col), dtype=np.int64)
        return partial_topk_table(M @ self.Q.T, ids, self.query_ids,
                                  self.k)


def partial_topk_table(sims: np.ndarray, ids: np.ndarray,
                       query_ids: np.ndarray, k: int) -> pa.Table:
    """One batch's top-k partial rows per query from an (n, q) sims
    matrix — shared by every top-k stage (float and quantized) so the
    candidate-emission semantics cannot drift between paths."""
    k = min(k, sims.shape[0])
    if k <= 0:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "vec_id": pa.array([], type=pa.int64()),
                         "sim": pa.array([], type=pa.float64())})
    out_q, out_v, out_s = [], [], []
    for qi in range(sims.shape[1]):
        col = sims[:, qi]
        top = np.argpartition(-col, k - 1)[:k]
        out_q.append(np.full(k, query_ids[qi], dtype=np.int64))
        out_v.append(ids[top])
        out_s.append(col[top])
    return pa.table({
        "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
        "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
        "sim": pa.array(np.concatenate(out_s), type=pa.float64()),
    })


def topk_merge(t: pa.Table, k: int, round_digits: int) -> pa.Table:
    """Driver merge of partial rows: round → (query, sim desc, vec_id
    asc) sort → first k per query. THE deterministic tie-break
    contract; every top-k path must merge through here."""
    if t.num_rows == 0 or "sim" not in t.column_names:
        # fully-pruned probes leave schema-less empties
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "vec_id": pa.array([], type=pa.int64()),
                         "sim": pa.array([], type=pa.float64())})
    t = t.set_column(t.schema.get_field_index("sim"), "sim",
                     pc.round(t.column("sim"), ndigits=round_digits))
    t = t.sort_by([("query_id", "ascending"), ("sim", "descending"),
                   ("vec_id", "ascending")])
    q = np.asarray(t.column("query_id"))
    keep = np.zeros(len(q), dtype=bool)
    for qid in np.unique(q):
        keep[np.flatnonzero(q == qid)[:k]] = True
    return t.filter(pa.array(keep))


def brute_force_topk(ds, query_ids: list[int], query_matrix: np.ndarray,
                     k: int = 10, round_digits: int = 6,
                     concurrency=2) -> pa.Table:
    """Global top-k per query: partial top-k per batch → driver merge.
    Deterministic: ties broken by (sim desc, vec_id asc) after rounding."""
    import ray

    from .aggregate import _to_arrow

    ref = ray.put({"ids": query_ids, "matrix": query_matrix})
    partials = ds.map_batches(
        BruteForceTopK, fn_constructor_args=(ref, k),
        concurrency=concurrency, num_cpus=0.5, batch_format="pyarrow")
    return topk_merge(_to_arrow(partials), k, round_digits)


class LshBucketStage:
    """Append a sign-bit LSH bucket id (seeded hyperplanes, built once
    per actor)."""

    def __init__(self, dim: int, n_bits: int = 8, seed: int = 42,
                 vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _batch_matrix(batch.column(self.vec_col))
        bits = (M @ self.planes) > 0
        bucket = bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))
        return batch.append_column("lsh_bucket",
                                   pa.array(bucket, type=pa.int64()))


def ivf_train(ds, n_centroids: int = 16, n_iters: int = 5,
              train_size: int = 10_000, seed: int = 42,
              vec_col: str = "embedding") -> np.ndarray:
    """k-means-lite centroid training for IVF: a deterministic driver-side
    Lloyd's loop over a bounded training sample (first ``train_size``
    rows — block order is deterministic for a fixed input). Returns a
    normalized (n_centroids, d) matrix."""
    sample = ds.limit(train_size).to_pandas()[vec_col]
    M = _normalize(np.asarray(np.stack(sample.to_numpy()), dtype=np.float64))
    rng = np.random.default_rng(seed)
    C = M[rng.choice(len(M), size=min(n_centroids, len(M)), replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(M @ C.T, axis=1)
        for c in range(len(C)):
            members = M[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


class IvfAssignStage:
    """Append each vector's IVF cell (argmax centroid cosine). The
    centroid matrix is broadcast once per actor."""

    def __init__(self, centroids_ref, vec_col: str = "embedding"):
        import ray

        C = (ray.get(centroids_ref)
             if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref)
        self.C = _normalize(np.asarray(C, dtype=np.float64))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _normalize(_batch_matrix(batch.column(self.vec_col)))
        cell = np.argmax(M @ self.C.T, axis=1)
        return batch.append_column("ivf_cell",
                                   pa.array(cell, type=pa.int64()))


def ivf_query_cells(C: np.ndarray, query_matrix: np.ndarray,
                    nprobe: int) -> list[int]:
    """Union of each query's ``nprobe`` nearest centroid ids — the
    single probe-enumeration source shared by the in-memory scan and
    the persisted store (they must enumerate identically or recall
    parity between the paths silently drifts)."""
    Q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qcells = np.argsort(-(Q @ np.asarray(C, dtype=np.float64).T),
                        axis=1)[:, :nprobe]
    return sorted({int(c) for row in qcells for c in row})


def lsh_multiprobe_buckets(planes: np.ndarray,
                           query_matrix: np.ndarray,
                           probe_radius: int) -> list[int]:
    """Sign-bit buckets of the queries plus every bucket within
    ``probe_radius`` bit flips (multi-probe enumeration) — shared by
    lsh_topk and the persisted LSH store probe."""
    from itertools import combinations

    n_bits = planes.shape[1]
    qbits = (np.asarray(query_matrix, dtype=np.float64) @ planes) > 0
    qbuckets = qbits @ (1 << np.arange(n_bits, dtype=np.int64))
    wanted: set[int] = set()
    for qb in qbuckets:
        for r in range(probe_radius + 1):
            for flip in combinations(range(n_bits), r):
                x = int(qb)
                for bit in flip:
                    x ^= 1 << bit
                wanted.add(x)
    return sorted(wanted)


def ivf_topk(ds, query_ids: list[int], query_matrix: np.ndarray,
             k: int = 10, n_centroids: int = 16, nprobe: int = 4,
             seed: int = 42, round_digits: int = 6,
             concurrency=2) -> pa.Table:
    """IVF approximate top-k: restrict the brute-force scan to vectors
    whose cell is among each query's ``nprobe`` nearest centroids. The
    scale path: at 10^12 rows the cell id becomes a partition key and
    probing reads only nprobe/n_centroids of the data."""
    import ray

    C = ivf_train(ds, n_centroids=n_centroids, seed=seed)
    wanted = pa.array(ivf_query_cells(C, query_matrix, nprobe),
                      type=pa.int64())

    ref = ray.put(C)
    assigned = ds.map_batches(
        IvfAssignStage, fn_constructor_args=(ref,),
        concurrency=concurrency, num_cpus=0.5, batch_format="pyarrow")
    candidates = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t.column("ivf_cell"),
                                    value_set=wanted)),
        batch_format="pyarrow")
    return brute_force_topk(candidates, query_ids, query_matrix, k=k,
                            round_digits=round_digits,
                            concurrency=concurrency)


# Candidate-vector bytes at or below this bound are paired in the
# driver-path single sweep; beyond it the groupby branch runs.
EMBED_SWEEP_MAX_BYTES = 512 * 2 ** 20


def embedding_near_dups(ds, threshold: float = 0.95, n_bits: int = 10,
                        seed: int = 42, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        max_bucket: int = 4096) -> pa.Table:
    """Embedding-cosine near-duplicate pairs: LSH-bucket every vector
    (sign-bit hyperplanes), co-locate buckets with a groupby, and do
    exact pairwise cosine only inside buckets. Approximate by
    construction (near-dups split across buckets are missed —
    probability falls as similarity rises; identical vectors always
    share a bucket); returns (id_a, id_b, sim) with id_a < id_b.

    Hot-bucket bound: a global bucket-size count (keys-only) runs
    first; singleton buckets are dropped before any further work (they
    cannot pair — on a spread-out corpus that strips most rows), and
    buckets over ``max_bucket`` rows are sub-salted by a doc-id hash —
    the O(n²) in-bucket cosine then never sees more than ~``max_bucket``
    vectors, at the logged cost of pairs that span sub-buckets of one
    popular bucket. Small candidate sets pair on the driver (one numpy
    sweep, no Ray sort); in-bucket similarity is computed in row
    chunks so memory stays bounded regardless of n.

    Materialized state is 16-byte (vec_id, lsh_bucket) rows only — the
    embedding vectors are re-read in a second, id-filtered pass over
    just the surviving candidates (same discipline as
    dedup.minhash_near_dups), so the object store never pins dim×8
    bytes per corpus vector.
    """
    from .aggregate import _to_arrow
    from .dedup import (_nsub_vector, _subsalt_keys, census_gate,
                        census_stats, multi_bucket_sizes)

    # dim probed from the first row; a fully-empty corpus has none
    probe_rows = ds.take(1)
    if not probe_rows:
        return pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64()),
                         "sim": pa.array([], type=pa.float64())})
    first = probe_rows[0][vec_col]
    dim = len(first)

    # task-based: the hyperplane matrix is tiny to rebuild, and
    # skipping actor-pool spin-up saves ~1-2 s of fixed latency
    stage = LshBucketStage(dim=dim, n_bits=n_bits, seed=seed,
                           vec_col=vec_col)

    def keys_only(t: pa.Table) -> pa.Table:
        return stage(t).select([id_col, "lsh_bucket"])

    key_rows = ds.map_batches(
        keys_only, batch_format="pyarrow").materialize()

    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "sim": pa.array([], type=pa.float64())})
    sizes = multi_bucket_sizes(key_rows, "lsh_bucket",
                               as_dataset_past_bound=True)
    n_candidates, nsub = census_stats(sizes, "lsh_bucket", max_bucket,
                                      "embedding_near_dups")
    if n_candidates == 0:
        return empty
    keep_multi_ds = census_gate(sizes, "lsh_bucket")

    def cand_id_partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({id_col: pc.unique(ids)})

    cand_tbl = _to_arrow(keep_multi_ds(key_rows).map_batches(
        cand_id_partial, batch_format="pyarrow"))
    if cand_tbl.num_rows == 0 or id_col not in cand_tbl.column_names:
        return empty
    cand_ids = pc.unique(cand_tbl.column(id_col).combine_chunks())

    def keep_cand_ids(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(id_col), value_set=cand_ids))

    # second pass: vectors fetched only for surviving candidate ids
    candidates = keep_multi_ds(
        ds.map_batches(keep_cand_ids, batch_format="pyarrow")
        .map_batches(stage, batch_format="pyarrow"))

    def resalt_keys(t: pa.Table) -> np.ndarray:
        keys = np.asarray(t.column("lsh_bucket"), dtype=np.int64)
        if not nsub:
            return keys
        sub_n = _nsub_vector(keys, nsub)
        hit = sub_n > 0
        if not hit.any():
            return keys
        ids_h = np.asarray(t.column(id_col), dtype=np.int64) \
            .astype(np.uint64)
        ids_h = (ids_h ^ (ids_h >> np.uint64(33))) \
            * np.uint64(0xFF51AFD7ED558CCD)
        subs = np.zeros(len(keys), dtype=np.uint64)
        subs[hit] = ids_h[hit] % sub_n[hit]
        keys = keys.copy()
        keys[hit] = _subsalt_keys(keys[hit], subs[hit])
        return keys

    def _pairs_in_bucket(ids: np.ndarray, M: np.ndarray):
        """Row-chunked upper-triangular cosine scan: memory O(chunk×n)."""
        n = len(ids)
        out_a, out_b, out_s = [], [], []
        chunk = max(2_000_000 // max(n, 1), 16)
        for lo in range(0, n - 1, chunk):
            hi = min(lo + chunk, n)
            sims = M[lo:hi] @ M.T  # (chunk, n)
            ri, ci = np.nonzero(sims >= threshold)
            keep = (ri + lo) < ci  # strict upper triangle (global index)
            if not keep.any():
                continue
            ri, ci = ri[keep], ci[keep]
            a, b = ids[ri + lo], ids[ci]
            # duplicate vec_id rows in one bucket are not pairs —
            # uphold the id_a < id_b contract (mirrors dedup.py)
            neq = a != b
            if not neq.any():
                continue
            a, b = a[neq], b[neq]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_s.append(np.round(sims[ri[neq], ci[neq]], 6))
        return out_a, out_b, out_s

    def _pairs_table(out_a, out_b, out_s) -> pa.Table:
        if not out_a:
            return empty
        return pa.table({"id_a": pa.array(np.concatenate(out_a),
                                          type=pa.int64()),
                         "id_b": pa.array(np.concatenate(out_b),
                                          type=pa.int64()),
                         "sim": pa.array(np.concatenate(out_s),
                                         type=pa.float64())})

    # driver path: candidate vectors are few — one segment sweep
    if n_candidates * dim * 8 <= EMBED_SWEEP_MAX_BYTES:
        tbl = _to_arrow(candidates)
        if tbl.num_rows == 0 or "lsh_bucket" not in tbl.column_names:
            return empty
        keys = resalt_keys(tbl)
        ids = np.asarray(tbl.column(id_col), dtype=np.int64)
        M = _normalize(_batch_matrix(tbl.column(vec_col)))
        order = np.argsort(keys, kind="stable")
        keys, ids, M = keys[order], ids[order], M[order]
        bounds = np.concatenate([[0], np.flatnonzero(np.diff(keys)) + 1,
                                 [len(keys)]])
        out_a, out_b, out_s = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            a, b, sm = _pairs_in_bucket(ids[s:e], M[s:e])
            out_a += a
            out_b += b
            out_s += sm
        out = _pairs_table(out_a, out_b, out_s)
    else:
        def with_salt(t: pa.Table) -> pa.Table:
            return t.set_column(t.schema.get_field_index("lsh_bucket"),
                                "lsh_bucket",
                                pa.array(resalt_keys(t), type=pa.int64()))

        def bucket_pairs(group: pa.Table) -> pa.Table:
            ids = np.asarray(group.column(id_col), dtype=np.int64)
            if len(ids) < 2:
                return empty
            M = _normalize(_batch_matrix(group.column(vec_col)))
            return _pairs_table(*_pairs_in_bucket(ids, M))

        pairs = candidates.map_batches(with_salt, batch_format="pyarrow") \
            .groupby("lsh_bucket").map_groups(bucket_pairs,
                                              batch_format="pyarrow")
        out = _to_arrow(pairs)
    if out.num_rows == 0:
        return empty
    # a pair may surface twice (duplicate ids across buckets); dedup
    out = out.group_by(["id_a", "id_b"]).aggregate([("sim", "max")]) \
        .rename_columns(["id_a", "id_b", "sim"])
    return out.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def lsh_topk(ds, query_ids: list[int], query_matrix: np.ndarray,
             dim: int, k: int = 10, n_bits: int = 8, seed: int = 42,
             probe_radius: int = 2, round_digits: int = 6,
             concurrency=2) -> pa.Table:
    """Approximate top-k: restrict the brute-force scan to vectors whose
    LSH bucket is within Hamming distance ``probe_radius`` of a query
    bucket (multi-probe; radius trades recall for scan fraction)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))
    wanted_arr = pa.array(
        lsh_multiprobe_buckets(planes, query_matrix, probe_radius),
        type=pa.int64())

    # fractional CPUs: two chained actor pools must not starve the
    # task stages between them on small machines
    bucketed = ds.map_batches(
        LshBucketStage, fn_constructor_kwargs={
            "dim": dim, "n_bits": n_bits, "seed": seed},
        concurrency=concurrency, num_cpus=0.5, batch_format="pyarrow")
    candidates = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t.column("lsh_bucket"),
                                    value_set=wanted_arr)),
        batch_format="pyarrow")
    return brute_force_topk(candidates, query_ids, query_matrix, k=k,
                            round_digits=round_digits,
                            concurrency=concurrency)
