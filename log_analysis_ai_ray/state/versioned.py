"""Versioned-manifest tables: a minimal lakehouse layer over parquet.

Every VERSION is a JSON manifest (`_versions/v{N:06d}.json`) listing
the exact parquet files that make up the table at that version, plus
the parent version and an operation note — the lineage record the
north rule's resumable/auditable requirement asks for. Data files are
immutable once referenced; a new version REFERENCES unchanged files
and adds/removes others (copy-on-write), so:

- readers pin a version and are isolated from concurrent rewrites;
- a crashed writer leaves only an unreferenced data directory and a
  missing manifest — the table is unchanged (commit = one atomic
  os.replace of the manifest);
- time travel = read an older manifest;
- version diff = set difference of two manifests' file lists.

Reference analog: the registry/sink bookkeeping the flagship already
persists, generalized to multi-version reads (the reference keeps one
mutable store, /root/reference/python/vector_store.py — no history).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

_VDIR = "_versions"


def _vpath(root: str, v: int) -> str:
    return os.path.join(root, _VDIR, f"v{v:06d}.json")


def latest_version(root: str) -> int:
    vdir = os.path.join(root, _VDIR)
    if not os.path.isdir(vdir):
        return 0
    vs = [int(f[1:7]) for f in os.listdir(vdir)
          if f.startswith("v") and f.endswith(".json")]
    return max(vs, default=0)


def read_manifest(root: str, version: int | None = None) -> dict:
    v = latest_version(root) if version is None else version
    with open(_vpath(root, v)) as f:
        return json.load(f)


def commit_version(root: str, files: list[str], *, parent: int | None,
                   op: str, extra: dict | None = None) -> int:
    """Atomically publish a new version referencing ``files``
    (paths relative to root). Returns the new version number.
    ``parent`` is lineage metadata; the version NUMBER is always
    latest+1 (a recompute whose parent is an old version must not
    collide with — and silently lose to — the existing successor)."""
    new_v = latest_version(root) + 1
    os.makedirs(os.path.join(root, _VDIR), exist_ok=True)
    manifest = {
        "version": new_v,
        "parent": parent,
        "op": op,
        "files": sorted(files),
        "extra": extra or {},
    }
    path = _vpath(root, new_v)
    # per-writer-unique tmp + os.link publish: link fails with
    # FileExistsError if the version exists, atomically — no
    # check-then-replace window where two writers clobber each other
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    try:
        os.link(tmp, path)
    finally:
        os.unlink(tmp)
    return new_v


def read_version(root: str, version: int | None = None, *,
                 schema_evolution: bool = False):
    """Ray Dataset over the table at a version (time travel).

    ``schema_evolution=True`` supports versions whose files were
    written under DIFFERENT schemas (ALTER TABLE ADD COLUMN without a
    rewrite): the union schema is taken from the file footers (names
    appear in first-seen footer order; a name reused with a different
    type is an error, not a coercion), files are grouped per distinct
    physical schema — each group is its own pruned ``read_parquet``,
    so no file is read twice — and a zero-copy map_batches pads each
    group's batches with typed nulls. The default (False) keeps the
    plain single-read fast path for homogeneous versions."""
    import ray.data

    m = read_manifest(root, version)
    paths = [os.path.join(root, f) for f in m["files"]]
    if not schema_evolution:
        return ray.data.read_parquet(paths)

    import pyarrow.parquet as pq

    groups: dict[tuple, list[str]] = {}
    union_fields: dict[str, pa.DataType] = {}
    for p in paths:
        s = pq.read_schema(p)
        key = tuple(zip(s.names, (str(t) for t in s.types)))
        groups.setdefault(key, []).append(p)
        for f in s:
            prev = union_fields.get(f.name)
            if prev is not None and prev != f.type:
                raise ValueError(
                    f"schema evolution cannot unify column "
                    f"{f.name!r}: {prev} vs {f.type}")
            union_fields.setdefault(f.name, f.type)
    union = pa.schema(list(union_fields.items()))

    def pad_to(names_present):
        missing = [n for n in union.names if n not in names_present]

        def pad(t: pa.Table) -> pa.Table:
            for n in missing:
                t = t.append_column(
                    n, pa.nulls(t.num_rows, union.field(n).type))
            return t.select(union.names)

        return pad

    parts = []
    for key, ps in sorted(groups.items()):
        present = {n for n, _ in key}
        parts.append(ray.data.read_parquet(ps).map_batches(
            pad_to(present), batch_format="pyarrow"))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def diff_versions(root: str, v_old: int, v_new: int) -> dict:
    a = set(read_manifest(root, v_old)["files"])
    b = set(read_manifest(root, v_new)["files"])
    return {"added": sorted(b - a), "removed": sorted(a - b),
            "unchanged": len(a & b)}


def vacuum_versions(root: str, *, keep_last: int = 2,
                    dry_run: bool = False) -> dict:
    """Retention/VACUUM: drop manifests older than the newest
    ``keep_last`` versions and delete data files no RETAINED manifest
    references (files are copy-on-write shared across versions, so
    liveness is the union of the kept manifests' file lists — a file
    referenced by v5 and v9 survives a vacuum that drops v5).

    Deletion order is crash-safe for concurrent readers of retained
    versions: old MANIFESTS go first (so no reader can pin a version
    that is about to lose files), then the now-unreferenced data
    files. A reader already inside a dropped version may see a
    missing-file error — the same contract as Delta/Iceberg VACUUM.
    Time travel to dropped versions becomes unavailable; lineage
    stays intact because retained manifests keep their ``parent``
    numbers. Returns the removal report (also for ``dry_run``)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vdir = os.path.join(root, _VDIR)
    if not os.path.isdir(vdir):
        return {"kept_versions": [], "dropped_versions": [],
                "deleted_files": [], "kept_files": 0}
    vs = sorted(int(f[1:7]) for f in os.listdir(vdir)
                if f.startswith("v") and f.endswith(".json"))
    kept = vs[-keep_last:]
    dropped = vs[:-keep_last] if len(vs) > keep_last else []
    live: set[str] = set()
    for v in kept:
        live.update(read_manifest(root, v)["files"])
    dead: set[str] = set()
    for v in dropped:
        dead.update(read_manifest(root, v)["files"])
    dead -= live
    report = {"kept_versions": kept, "dropped_versions": dropped,
              "deleted_files": sorted(dead), "kept_files": len(live)}
    if dry_run:
        return report
    for v in dropped:                      # manifests first
        os.unlink(_vpath(root, v))
    for rel in sorted(dead):               # then orphaned data
        p = os.path.join(root, rel)
        if os.path.isfile(p):
            os.unlink(p)
        d = os.path.dirname(p)
        try:                               # clean now-empty dirs
            while os.path.realpath(d) != os.path.realpath(root):
                os.rmdir(d)
                d = os.path.dirname(d)
        except OSError:
            pass                           # dir still shared — keep
    return report
