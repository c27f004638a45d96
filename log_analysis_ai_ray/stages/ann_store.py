"""Persisted, partition-pruned ANN store.

Ray-Data analog of the reference's persistent vector index
(/root/reference/python/vector_store.py:21-56 keeps a Qdrant
collection so repeated similarity queries never rescan the corpus).
Here the index IS the storage layout: build once by assigning every
vector its IVF cell (argmax centroid cosine) or LSH bucket (sign-bit
hyperplanes) and writing the table as parquet PARTITIONED BY that id
(`ivf_cell=<k>/` directories), persisting the tiny centroid /
hyperplane matrix beside it. Query many: load the matrix (KBs), pick
each query's ``nprobe`` nearest cells, and READ ONLY those
partitions' files — scan cost is ~nprobe/n_centroids of the corpus by
construction, asserted by comparing pruned file bytes against the
whole store (see ``scan_fraction`` and tests/test_ann_store.py).

At cluster scale the build is one assign pass + partitioned write
(each worker writes its blocks' partition files independently — no
shuffle), and probes read only the probed directories from shared
storage; the store is resumable/idempotent because the build lands in
a temp dir and renames into place atomically.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

from .knn import (IvfAssignStage, LshBucketStage, _normalize,
                  brute_force_topk, ivf_query_cells, ivf_train,
                  lsh_multiprobe_buckets, partial_topk_table,
                  topk_merge)


def _empty_topk():
    import pyarrow as pa

    return pa.table({"query_id": pa.array([], type=pa.int64()),
                     "vec_id": pa.array([], type=pa.int64()),
                     "sim": pa.array([], type=pa.float64())})


def _write_store(assigned, store_dir: str, part_col: str, meta: dict,
                 arrays: dict[str, np.ndarray]) -> None:
    """Atomic store build: partitioned vectors + index sidecars land in
    a temp dir, then one rename publishes the store."""
    from .compact import compact_store

    tmp = store_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "vectors"), exist_ok=True)
    assigned.write_parquet(os.path.join(tmp, "vectors"),
                           partition_cols=[part_col])
    # write_parquet(partition_cols=...) fans out blocks × partitions
    # kilobyte-files; a probe that opens hundreds of them spends its
    # time in parquet metadata, not data (measured: 2.5 s of a 2.9 s
    # sf0.1 q8 probe). Compact each cell to one part before publishing.
    compact_store(os.path.join(tmp, "vectors"),
                  partition_prefixes=(f"{part_col}=",))
    for name, arr in arrays.items():
        np.save(os.path.join(tmp, f"{name}.npy"), arr)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    # swap without a no-store window: the old store moves aside
    # first, so a crash between the renames leaves either the old or
    # the new store visible — never neither (round-4 review finding)
    old = store_dir + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(store_dir):
        os.replace(store_dir, old)
    os.replace(tmp, store_dir)
    shutil.rmtree(old, ignore_errors=True)


def build_ivf_store(ds, store_dir: str, *, n_centroids: int = 16,
                    seed: int = 42, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    train_size: int = 10_000) -> dict:
    """Train centroids, assign cells, write ``store_dir/vectors/``
    partitioned by ``ivf_cell``. One pass over the data after the
    bounded training sample; no shuffle."""
    import ray

    C = ivf_train(ds, n_centroids=n_centroids, seed=seed,
                  train_size=train_size, vec_col=vec_col)
    ref = ray.put(C)
    assigned = ds.map_batches(
        IvfAssignStage, fn_constructor_args=(ref,),
        fn_constructor_kwargs={"vec_col": vec_col},
        concurrency=2, num_cpus=0.5, batch_format="pyarrow")
    meta = {"kind": "ivf", "n_centroids": int(len(C)), "seed": seed,
            "id_col": id_col, "vec_col": vec_col, "dim": int(C.shape[1])}
    _write_store(assigned, store_dir, "ivf_cell", meta, {"centroids": C})
    return meta


def build_lsh_store(ds, store_dir: str, *, dim: int, n_bits: int = 8,
                    seed: int = 42, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> dict:
    """Assign sign-bit LSH buckets, write partitioned by
    ``lsh_bucket``. The hyperplane matrix is persisted so probes use
    the exact build-time planes."""
    stage = LshBucketStage(dim=dim, n_bits=n_bits, seed=seed,
                           vec_col=vec_col)
    assigned = ds.map_batches(stage, batch_format="pyarrow")
    meta = {"kind": "lsh", "n_bits": n_bits, "seed": seed,
            "id_col": id_col, "vec_col": vec_col, "dim": dim}
    _write_store(assigned, store_dir, "lsh_bucket", meta,
                 {"planes": stage.planes})
    return meta


def build_ivf_store_from_text(ds, store_dir: str, *,
                              model_factory=None,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              dim: int = 64, embed_concurrency=2,
                              **kw) -> dict:
    """The T4 end-to-end surface: embed a TEXT dataset with the
    pluggable actor-pool EmbedStage (stages/embed.py — default
    deterministic char-n-gram model; pass ``model_factory`` to slot a
    real local model), then build the partition-pruned IVF store over
    the embedded stream. One embedding pass feeds the store build
    directly — vectors never materialize on the driver."""
    from .embed import embed_dataset

    emb = embed_dataset(ds, model_factory, text_col=text_col,
                        id_col=id_col, out_id_col="vec_id",
                        vec_col="embedding", dim=dim,
                        concurrency=embed_concurrency)
    meta = build_ivf_store(emb, store_dir, id_col="vec_id",
                           vec_col="embedding", **kw)
    meta["embedded_from"] = text_col
    return meta


def build_lsh_store_from_text(ds, store_dir: str, *,
                              model_factory=None,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              dim: int = 64, embed_concurrency=2,
                              **kw) -> dict:
    """LSH twin of build_ivf_store_from_text (same EmbedStage
    contract)."""
    from .embed import embed_dataset

    emb = embed_dataset(ds, model_factory, text_col=text_col,
                        id_col=id_col, out_id_col="vec_id",
                        vec_col="embedding", dim=dim,
                        concurrency=embed_concurrency)
    meta = build_lsh_store(emb, store_dir, dim=dim, id_col="vec_id",
                           vec_col="embedding", **kw)
    meta["embedded_from"] = text_col
    return meta


def load_meta(store_dir: str) -> dict:
    with open(os.path.join(store_dir, "meta.json")) as f:
        return json.load(f)


def partition_paths(store_dir: str, part_col: str,
                    values) -> list[str]:
    """Directories of the requested partitions (missing = empty cell,
    skipped)."""
    out = []
    for root in _vector_roots(store_dir):
        for v in sorted({int(v) for v in values}):
            p = os.path.join(root, f"{part_col}={v}")
            if os.path.isdir(p):
                out.append(p)
    return out


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f))
                     for f in files if f.endswith(".parquet"))
    return total


def scan_fraction(store_dir: str, probed_paths: list[str]) -> float:
    """Pruned-read bytes / whole-store bytes — the quantity the
    partition pruning exists to shrink."""
    total = sum(_tree_bytes(r) for r in _vector_roots(store_dir))
    if total == 0:
        return 0.0
    return sum(_tree_bytes(p) for p in probed_paths) / total


def ivf_probe_cells(store_dir: str, query_matrix: np.ndarray,
                    nprobe: int = 4) -> list[int]:
    # shared enumeration with the in-memory scan (knn.ivf_query_cells)
    return ivf_query_cells(
        np.load(os.path.join(store_dir, "centroids.npy")),
        query_matrix, nprobe)


def lsh_probe_buckets(store_dir: str, query_matrix: np.ndarray,
                      probe_radius: int = 2) -> list[int]:
    # shared enumeration with the in-memory scan
    return lsh_multiprobe_buckets(
        np.load(os.path.join(store_dir, "planes.npy")),
        query_matrix, probe_radius)


def _pruned_topk(store_dir: str, paths: list[str],
                 query_ids: list[int], query_matrix: np.ndarray,
                 k: int, round_digits: int, concurrency):
    import ray.data

    files = [os.path.join(p, f) for p in paths
             for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
    if not files:
        return _empty_topk()
    meta = load_meta(store_dir)
    ds = ray.data.read_parquet(files,
                               columns=[meta["id_col"], meta["vec_col"]])
    return brute_force_topk(ds, query_ids, query_matrix, k=k,
                            round_digits=round_digits,
                            concurrency=concurrency)


def ivf_store_topk(store_dir: str, query_ids: list[int],
                   query_matrix: np.ndarray, k: int = 10,
                   nprobe: int = 4, round_digits: int = 6,
                   concurrency=2):
    """IVF approximate top-k as a PRUNED READ: only the probed cells'
    partition files are opened — nprobe/n_centroids of the store."""
    cells = ivf_probe_cells(store_dir, query_matrix, nprobe=nprobe)
    paths = partition_paths(store_dir, "ivf_cell", cells)
    return _pruned_topk(store_dir, paths, query_ids, query_matrix,
                        k, round_digits, concurrency)


def lsh_store_topk(store_dir: str, query_ids: list[int],
                   query_matrix: np.ndarray, k: int = 10,
                   probe_radius: int = 2, round_digits: int = 6,
                   concurrency=2):
    """Multi-probe LSH top-k as a pruned partition read."""
    buckets = lsh_probe_buckets(store_dir, query_matrix,
                                probe_radius=probe_radius)
    paths = partition_paths(store_dir, "lsh_bucket", buckets)
    return _pruned_topk(store_dir, paths, query_ids, query_matrix,
                        k, round_digits, concurrency)


# ---------------------------------------------------------------------------
# int8 scalar quantization (Faiss-SQ8-style): 4-8x smaller store, exact
# rescore of the survivors from the source table
# ---------------------------------------------------------------------------


class Int8QuantStage:
    """Replace the float vector column with per-vector int8 codes:
    v_unit = v/|v|, scale = max|v_unit|/127, q = round(v_unit/scale).
    Codes land in a fixed_size_binary(dim) column (contiguous buffer →
    zero-copy decode) plus a float64 ``q_scale``; the float vectors are
    DROPPED — that is the point: the quantized store's partitions are
    ~4x (float32 source) / ~8x (float64) smaller, so every probe reads
    proportionally fewer bytes. Approximate cosine is then
    (q_u·q_v)·s_u·s_v with bounded error; exact rescoring re-reads only
    the few surviving candidate ids from the source parquet."""

    def __init__(self, vec_col: str = "embedding"):
        self.vec_col = vec_col

    def __call__(self, batch):
        import pyarrow as pa

        from .knn import _batch_matrix

        M = _normalize(_batch_matrix(batch.column(self.vec_col)))
        scale = np.abs(M).max(axis=1) / 127.0
        scale[scale == 0] = 1.0
        q = np.rint(M / scale[:, None]).astype(np.int8)
        dim = M.shape[1]
        codes = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(dim), len(q), [None, pa.py_buffer(q.tobytes())])
        batch = batch.drop_columns([self.vec_col])
        batch = batch.append_column("q8", codes)
        return batch.append_column(
            "q_scale", pa.array(scale.astype(np.float32),
                                type=pa.float32()))


def _decode_q8(arr) -> np.ndarray:
    """Zero-copy (n, dim) int8 view of a fixed_size_binary column."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dim = arr.type.byte_width
    buf = np.frombuffer(arr.buffers()[1], dtype=np.int8)
    start = arr.offset * dim
    return buf[start:start + len(arr) * dim].reshape(len(arr), dim)


class Q8TopK:
    """Per-batch approximate cosine top-k over int8 codes (the
    quantized twin of knn.BruteForceTopK)."""

    def __init__(self, queries_ref, k: int = 10, id_col: str = "vec_id"):
        import ray

        q = (ray.get(queries_ref)
             if isinstance(queries_ref, ray.ObjectRef) else queries_ref)
        self.query_ids = np.asarray(q["ids"], dtype=np.int64)
        self.Q = _normalize(np.asarray(q["matrix"], dtype=np.float64))
        self.k = k
        self.id_col = id_col

    def __call__(self, batch):
        Mq = _decode_q8(batch.column("q8")).astype(np.float64)
        Mq *= np.asarray(batch.column("q_scale"),
                         dtype=np.float64)[:, None]
        ids = np.asarray(batch.column(self.id_col), dtype=np.int64)
        # identical emission semantics to the float path by
        # construction (shared kernel)
        return partial_topk_table(Mq @ self.Q.T, ids, self.query_ids,
                                  self.k)


def build_ivf_q8_store(ds, store_dir: str, *, n_centroids: int = 16,
                       seed: int = 42, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       train_size: int = 10_000) -> dict:
    """IVF store with int8-quantized vectors: same assign pass, codes
    instead of floats on disk."""
    import ray

    from .knn import IvfAssignStage, ivf_train

    C = ivf_train(ds, n_centroids=n_centroids, seed=seed,
                  train_size=train_size, vec_col=vec_col)
    ref = ray.put(C)
    assigned = ds.map_batches(
        IvfAssignStage, fn_constructor_args=(ref,),
        fn_constructor_kwargs={"vec_col": vec_col},
        concurrency=2, num_cpus=0.5, batch_format="pyarrow") \
        .map_batches(Int8QuantStage(vec_col=vec_col),
                     batch_format="pyarrow")
    meta = {"kind": "ivf", "n_centroids": int(len(C)), "seed": seed,
            "id_col": id_col, "vec_col": vec_col,
            "dim": int(C.shape[1]), "quantized": "int8"}
    _write_store(assigned, store_dir, "ivf_cell", meta, {"centroids": C})
    return meta


def ivf_q8_store_topk(store_dir: str, query_ids: list[int],
                      query_matrix: np.ndarray, k: int = 10,
                      nprobe: int = 4, oversample: int = 4,
                      rescore_source: str | None = None,
                      round_digits: int = 6, concurrency=2):
    """Quantized pruned-read top-k: probe cells → scan CODES only
    (~4-8x fewer bytes than float vectors) → top-(oversample·k)
    candidates → optional exact rescore that reads ONLY the candidate
    ids from ``rescore_source`` (parquet predicate pushdown)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from .aggregate import _to_arrow
    from .knn import _batch_matrix

    meta = load_meta(store_dir)
    assert meta.get("quantized") == "int8"
    cells = ivf_probe_cells(store_dir, query_matrix, nprobe=nprobe)
    paths = partition_paths(store_dir, "ivf_cell", cells)
    files = [os.path.join(p, f) for p in paths
             for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
    if not files:
        return _empty_topk()
    ds = ray.data.read_parquet(
        files, columns=[meta["id_col"], "q8", "q_scale"])
    ref = ray.put({"ids": query_ids, "matrix": query_matrix})
    cand_k = k if rescore_source is None else k * oversample
    partials = ds.map_batches(
        Q8TopK, fn_constructor_args=(ref, cand_k),
        fn_constructor_kwargs={"id_col": meta["id_col"]},
        concurrency=concurrency, num_cpus=0.5, batch_format="pyarrow")
    t = _to_arrow(partials)
    if rescore_source is None:
        return topk_merge(t, k, round_digits)

    # reduce the PER-BATCH partials to the promised global
    # top-(oversample·k) per query before the exact-rescore read —
    # without this the candidate id set (and the pushdown read) grew
    # with input block count (round-4 review finding)
    t = topk_merge(t, cand_k, round_digits)
    cands = sorted(set(t.column("vec_id").to_pylist()))
    src = pq.read_table(
        rescore_source, columns=[meta["id_col"], meta["vec_col"]],
        filters=[(meta["id_col"], "in", cands)])
    V = _normalize(_batch_matrix(src.column(meta["vec_col"])))
    ids = np.asarray(src.column(meta["id_col"]), dtype=np.int64)
    Q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    sims = V @ Q.T
    qids = np.asarray(query_ids, dtype=np.int64)
    exact = pa.table({
        "query_id": pa.array(np.repeat(qids, len(ids)), type=pa.int64()),
        "vec_id": pa.array(np.tile(ids, len(qids)), type=pa.int64()),
        "sim": pa.array(sims.T.ravel(), type=pa.float64()),
    })
    return topk_merge(exact, k, round_digits)


# ---------------------------------------------------------------------------
# incremental append (the reference's persistent index supports add):
# generation directories with a commit-in-meta protocol
# ---------------------------------------------------------------------------


def _vector_roots(store_dir: str) -> list[str]:
    """Base build + every COMMITTED append generation. A generation is
    visible only once listed in meta.json, so a crashed append (its
    directory exists, its commit doesn't) is invisible to readers and
    harmlessly replaced by the next attempt."""
    meta = load_meta(store_dir)
    roots = [os.path.join(store_dir, "vectors")]
    roots += [os.path.join(store_dir, g)
              for g in meta.get("generations", [])]
    return [r for r in roots if os.path.isdir(r)]


def append_to_store(store_dir: str, ds) -> dict:
    """Append vectors to an existing IVF store (float or int8): assign
    with the PERSISTED centroids (the index stays consistent — no
    retrain, same cell semantics), write a new partitioned generation
    directory, then commit it by rewriting meta.json atomically.
    Readers union all committed generations; compaction of many small
    generations is the same maintenance story as stages/compact.py."""
    import ray

    meta = load_meta(store_dir)
    if meta["kind"] != "ivf":
        raise NotImplementedError("append supported for IVF stores")
    C = np.load(os.path.join(store_dir, "centroids.npy"))
    ref = ray.put(C)

    from .knn import IvfAssignStage

    assigned = ds.map_batches(
        IvfAssignStage, fn_constructor_args=(ref,),
        fn_constructor_kwargs={"vec_col": meta["vec_col"]},
        concurrency=2, num_cpus=0.5, batch_format="pyarrow")
    if meta.get("quantized") == "int8":
        assigned = assigned.map_batches(
            Int8QuantStage(vec_col=meta["vec_col"]),
            batch_format="pyarrow")

    gens = meta.get("generations", [])
    gen_name = f"vectors-gen-{len(gens) + 1:04d}"
    tmp = os.path.join(store_dir, gen_name + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    assigned.write_parquet(tmp, partition_cols=["ivf_cell"])
    from .compact import compact_store
    compact_store(tmp, partition_prefixes=("ivf_cell=",))
    final = os.path.join(store_dir, gen_name)
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)
    # commit: generation becomes visible only here
    meta["generations"] = gens + [gen_name]
    mt = os.path.join(store_dir, "meta.json.tmp")
    with open(mt, "w") as f:
        json.dump(meta, f)
    os.replace(mt, os.path.join(store_dir, "meta.json"))
    return meta
