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
                  brute_force_topk, ivf_train)


def _empty_topk():
    import pyarrow as pa

    return pa.table({"query_id": pa.array([], type=pa.int64()),
                     "vec_id": pa.array([], type=pa.int64()),
                     "sim": pa.array([], type=pa.float64())})


def _write_store(assigned, store_dir: str, part_col: str, meta: dict,
                 arrays: dict[str, np.ndarray]) -> None:
    """Atomic store build: partitioned vectors + index sidecars land in
    a temp dir, then one rename publishes the store."""
    tmp = store_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "vectors"), exist_ok=True)
    assigned.write_parquet(os.path.join(tmp, "vectors"),
                           partition_cols=[part_col])
    for name, arr in arrays.items():
        np.save(os.path.join(tmp, f"{name}.npy"), arr)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    shutil.rmtree(store_dir, ignore_errors=True)
    os.replace(tmp, store_dir)


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


def load_meta(store_dir: str) -> dict:
    with open(os.path.join(store_dir, "meta.json")) as f:
        return json.load(f)


def partition_paths(store_dir: str, part_col: str,
                    values) -> list[str]:
    """Directories of the requested partitions (missing = empty cell,
    skipped)."""
    out = []
    for v in sorted({int(v) for v in values}):
        p = os.path.join(store_dir, "vectors", f"{part_col}={v}")
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
    total = _tree_bytes(os.path.join(store_dir, "vectors"))
    if total == 0:
        return 0.0
    return sum(_tree_bytes(p) for p in probed_paths) / total


def ivf_probe_cells(store_dir: str, query_matrix: np.ndarray,
                    nprobe: int = 4) -> list[int]:
    C = np.load(os.path.join(store_dir, "centroids.npy"))
    Q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qcells = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    return sorted({int(c) for row in qcells for c in row})


def lsh_probe_buckets(store_dir: str, query_matrix: np.ndarray,
                      probe_radius: int = 2) -> list[int]:
    from itertools import combinations

    planes = np.load(os.path.join(store_dir, "planes.npy"))
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
