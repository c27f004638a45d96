"""Pages-table source (the input_hint-shaped primary input).

Scale discipline: ALWAYS prune columns at the read — the wide ``html``
binary column never leaves storage unless a stage actually needs it
(SURVEY.md §7.3 "wide binary html column").
"""

from __future__ import annotations

import os

PAGE_COLUMNS_FOR_PARSE = ["url", "warc_ts", "text", "lang"]


def read_pages(path: str, columns: list[str] | None = PAGE_COLUMNS_FOR_PARSE,
               include_paths: bool = False, **kwargs):
    import ray.data

    files = (list_page_files(path)
             if isinstance(path, str) and os.path.isdir(path) else path)
    return ray.data.read_parquet(
        files, columns=columns, include_paths=include_paths, **kwargs)


def list_page_files(dir_path: str) -> list[str]:
    return sorted(
        os.path.join(dir_path, f)
        for f in os.listdir(dir_path)
        if f.endswith(".parquet")
    )
