"""Per-file Bloom skipping index for point lookups.

The zone-map manifest (stages/zonemap.py) skips files by MIN/MAX range
— it only helps when the lookup key is range-clustered in the layout.
A per-file Bloom filter skips files for ARBITRARY keys: a
needle-in-haystack lookup (trace id, request id, content hash) reads
only the files whose filter matches, regardless of how the key is
distributed across files (the same per-file bloom every table format
keeps — e.g. Parquet's own optional bloom pages, ORC bloom streams).
Bloom filters admit false positives, never false negatives, so an
exact ``is_in`` residual over the surviving files makes results exact.

Scale shape: the build is a pure fan-out — ONE dataset row per file,
each task reads ONLY its file's key column and emits the filter bytes;
no shuffle, no driver data path (the manifest itself is
|files| × m_bits/8 bytes, a metadata-scale artifact). Lookups probe
the manifest driver-side (vectorized bit tests over a bounded file
list) and read only matching files.

Sizing: m = 2¹⁷ bits (16 KiB/file) keeps fpp < 1e-4 up to ~10k distinct
keys per file; pass a larger ``m_bits`` for bigger files — correctness
never depends on fpp thanks to the residual.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa

from .bloomjoin import _column_to_u64, bloom_from_keys, bloom_probe

M_BITS_FILE_DEFAULT = 1 << 17
K_HASHES_FILE_DEFAULT = 5


def _store_files(store_dir: str) -> list[str]:
    # underscore-prefixed parquet files are STORE ARTIFACTS (bloom /
    # zonemap manifests), not data: indexing a manifest into its own
    # refresh crashed on the missing key column (round-4 review)
    return sorted(
        p for p in glob.glob(os.path.join(store_dir, "**",
                                          "*.parquet"),
                             recursive=True)
        if not os.path.basename(p).startswith("_"))


def _manifest_path(store_dir: str, key_col: str) -> str:
    return os.path.join(store_dir, f"_bloom_{key_col}.parquet")


def write_bloom_manifest(store_dir: str, key_col: str,
                         m_bits: int = M_BITS_FILE_DEFAULT,
                         k_hashes: int = K_HASHES_FILE_DEFAULT) -> str:
    """Build the per-file Bloom manifest distributed (one task per
    file, each reading only the key column of its own file) and write
    it atomically next to the data."""
    import pyarrow.parquet as pq
    import ray.data

    from . import aggregate as agg

    files = _store_files(store_dir)
    items = [{"path": os.path.relpath(p, store_dir)} for p in files]
    if not items:
        # empty / not-yet-populated store: an empty manifest (so
        # pruned reads see zero candidate files) instead of a
        # KeyError on the schema-less empty dataset (round-4 review)
        meta = pa.table({
            "path": pa.array([], type=pa.string()),
            "bloom": pa.array([], type=pa.binary()),
            "n_keys": pa.array([], type=pa.int64()),
            "m_bits": pa.array([], type=pa.int64()),
            "k_hashes": pa.array([], type=pa.int64())})
        out = _manifest_path(store_dir, key_col)
        tmp = f"{out}.{os.getpid()}.tmp"
        pq.write_table(meta, tmp)
        os.replace(tmp, out)
        return out

    def build_one(t: pa.Table) -> pa.Table:
        paths, blooms, nkeys = [], [], []
        for rel in t.column("path").to_pylist():
            col = pq.read_table(os.path.join(store_dir, rel),
                                columns=[key_col]).column(key_col)
            keys, valid = _column_to_u64(col)
            keys = np.unique(keys[valid])
            blooms.append(bloom_from_keys(keys, m_bits,
                                          k_hashes).tobytes())
            paths.append(rel)
            nkeys.append(len(keys))
        return pa.table({"path": pa.array(paths, type=pa.string()),
                         "bloom": pa.array(blooms, type=pa.binary()),
                         "n_keys": pa.array(nkeys, type=pa.int64())})

    rows = agg._to_arrow(
        ray.data.from_items(items)
        .map_batches(build_one, batch_format="pyarrow", batch_size=1))
    meta = pa.table({
        "path": rows.column("path"),
        "bloom": rows.column("bloom"),
        "n_keys": rows.column("n_keys"),
        "m_bits": pa.array([m_bits] * rows.num_rows, type=pa.int64()),
        "k_hashes": pa.array([k_hashes] * rows.num_rows,
                             type=pa.int64()),
    }).sort_by([("path", "ascending")])
    out = _manifest_path(store_dir, key_col)
    tmp = f"{out}.{os.getpid()}.tmp"
    pq.write_table(meta, tmp)
    os.replace(tmp, out)
    return out


def bloom_pruned_read(store_dir: str, key_col: str, lookup_keys,
                      columns: list[str] | None = None):
    """Ray Dataset over ONLY the files whose Bloom filter matches at
    least one lookup key, with the exact ``is_in`` residual applied
    per batch. Returns (dataset | None, n_files_read, n_files_total)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    meta = pq.read_table(_manifest_path(store_dir, key_col))
    key_arr = pa.array(lookup_keys)
    probe_u64, _ = _column_to_u64(key_arr)
    keep = []
    for row in meta.to_pylist():
        bm = np.frombuffer(row["bloom"], dtype=np.uint8)
        if bloom_probe(bm, probe_u64, row["k_hashes"]).any():
            keep.append(os.path.join(store_dir, row["path"]))
    if not keep:
        return None, 0, meta.num_rows

    def residual(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(key_col), value_set=key_arr))

    ds = ray.data.read_parquet(keep, columns=columns).map_batches(
        residual, batch_format="pyarrow", zero_copy_batch=True)
    return ds, len(keep), meta.num_rows
