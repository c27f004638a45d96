"""Per-partition checkpoint manifests for resumable runs.

Ray Data has no built-in job-level resume (the reference has none
either — errors are logged and swallowed,
/root/reference/src/file_data_loader.cpp:397-409). The scalable design
(SURVEY.md §4.1) is fragment-aligned: input files are processed in
GROUPS; each completed group writes a manifest entry
(``_done/group-<id>.json`` with its input files + row counts); a
resumed run skips groups whose manifest entry exists. Output for a
group goes under its own subdirectory, so a partially-written group is
simply overwritten on retry — idempotent by construction.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass


@dataclass
class GroupManifest:
    group_id: int
    input_files: list[str]
    rows_out: int
    extra: dict

    def path(self, out_dir: str) -> str:
        return os.path.join(out_dir, "_done", f"group-{self.group_id:05d}.json")


def plan_groups(input_files: list[str], files_per_group: int) -> list[list[str]]:
    files = sorted(input_files)
    return [files[i:i + files_per_group]
            for i in range(0, len(files), files_per_group)]


def is_done(out_dir: str, group_id: int,
            input_files: list[str] | None = None) -> bool:
    """Group complete — and, when ``input_files`` is given, built from
    EXACTLY those files. Positional group ids shift when the input
    file list changes (a new file re-partitions every group), so an
    id-only check silently skipped groups whose membership changed —
    dropping the new file and double-counting moved ones (round-4
    review finding)."""
    path = os.path.join(out_dir, "_done", f"group-{group_id:05d}.json")
    if not os.path.exists(path):
        return False
    if input_files is None:
        return True
    try:
        with open(path) as f:
            return json.load(f).get("input_files") == \
                sorted(input_files)
    except Exception:
        return False


def mark_done(out_dir: str, group_id: int, input_files: list[str],
              rows_out: int, extra: dict | None = None) -> None:
    m = GroupManifest(group_id, sorted(input_files), rows_out,
                      extra or {})
    path = m.path(out_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m.__dict__, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def completed_groups(out_dir: str) -> dict[int, dict]:
    done_dir = os.path.join(out_dir, "_done")
    out = {}
    if os.path.isdir(done_dir):
        for name in sorted(os.listdir(done_dir)):
            if name.startswith("group-") and name.endswith(".json"):
                with open(os.path.join(done_dir, name)) as f:
                    m = json.load(f)
                out[m["group_id"]] = m
    return out
