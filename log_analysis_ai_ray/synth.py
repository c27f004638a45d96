"""Deterministic synthetic Common-Crawl-style `pages` table (FIXTURES.md F1).

The table shape is fixed by BASELINE.json ``input_hint``:
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``. Each page's ``text`` is 1–20 synthetic log lines
rendered from a fixed template pool (F1a) with seeded parameters, so the
expected Drain output (template set, per-template counts) is known in
closed form.

Determinism: generation is split into ``n_files`` independent shards;
shard ``i`` is generated entirely from ``default_rng((seed, i))`` and
covers global row range ``[start_i, end_i)``. The same ``(n_pages,
seed, n_files)`` therefore yields byte-identical output regardless of
how many shards are generated in parallel — and a resumable generator
can skip shards whose files already exist.

Line shapes mirror the reference's only fixture
(``/root/reference/python/samples/sample_logs.jsonl`` rows 1–5) plus
access-log / kv styles exercising the parser family semantics
(SURVEY.md §2.2).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import PAGES_SCHEMA

SEED = 42

# ---------------------------------------------------------------------------
# F1a template pool. {ts} {int} {float} {word} {ip} are parameter slots.
# `expected_template` = what Drain should converge to after the preprocess
# stage strips the leading "[{ts}] " header (reference strip patterns,
# /root/reference/src/drain_parser.cpp:97-105) and masking/mining wildcard
# the parameters. Weights are Zipf-ish; template 0 is the hot key
# (~30% of lines) for skew tests.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LineTemplate:
    fmt: str
    level: str  # "" for non-leveled (access-log style) lines
    weight: float

    @property
    def expected_template(self) -> str:
        """Post-mining normalized template (closed form).

        Header ``[{ts}] `` is stripped by the preprocess stage. Numeric
        slots ({int}/{float}/{ip}) are masked deterministically inside
        their token; a token containing {word} varies across lines, so
        Drain wildcards the WHOLE token when merging.
        """
        body = self.fmt
        if body.startswith("[{ts}] "):
            body = body[len("[{ts}] "):]
        out_tokens = []
        for tok in body.split(" "):
            if "{word}" in tok:
                out_tokens.append("<*>")
            else:
                for slot in ("{ts}", "{int}", "{float}", "{ip}"):
                    tok = tok.replace(slot, "<*>")
                out_tokens.append(tok)
        return " ".join(out_tokens)


TEMPLATES: list[LineTemplate] = [
    LineTemplate("[{ts}] INFO Server started on port {int}", "INFO", 30.0),
    LineTemplate("[{ts}] INFO User {word} logged in from {ip}", "INFO", 12.0),
    LineTemplate("[{ts}] WARN High CPU usage detected: {float} percent", "WARN", 8.0),
    LineTemplate("[{ts}] ERROR Failed to connect to database {word} after {int} retries", "ERROR", 6.0),
    LineTemplate("[{ts}] DEBUG Cache hit ratio {float} for shard {int}", "DEBUG", 5.0),
    LineTemplate("GET /api/v1/{word}/{int} {int} {int}ms", "", 5.0),
    LineTemplate("POST /api/v1/{word} {int} {int}ms", "", 4.0),
    LineTemplate("[{ts}] INFO Request completed in {int}ms", "INFO", 4.0),
    LineTemplate("[{ts}] INFO User {word} logged out", "INFO", 3.0),
    LineTemplate("[{ts}] WARN Disk usage at {float} percent on {word}", "WARN", 3.0),
    LineTemplate("[{ts}] ERROR Timeout after {int}ms calling {word}", "ERROR", 2.5),
    LineTemplate("[{ts}] INFO Scheduled job {word} finished in {float}s", "INFO", 2.5),
    LineTemplate("[{ts}] DEBUG GC pause {int}ms heap {int}MB", "DEBUG", 2.0),
    LineTemplate("[{ts}] INFO Connection from {ip} accepted", "INFO", 2.0),
    LineTemplate("[{ts}] WARN Retry {int} of {int} for request {word}", "WARN", 1.8),
    LineTemplate("[{ts}] ERROR Unhandled exception in {word}: code {int}", "ERROR", 1.6),
    LineTemplate("[{ts}] INFO Cache evicted {int} entries", "INFO", 1.5),
    LineTemplate("[{ts}] INFO Worker {int} heartbeat ok", "INFO", 1.4),
    LineTemplate("[{ts}] WARN Queue depth {int} exceeds threshold {int}", "WARN", 1.2),
    LineTemplate("[{ts}] ERROR Permission denied for user {word} on {word}", "ERROR", 1.0),
    LineTemplate("[{ts}] DEBUG Session {word} touched by {ip}", "DEBUG", 1.0),
    LineTemplate("[{ts}] INFO Flushed {int} rows to {word}", "INFO", 0.9),
    LineTemplate("[{ts}] WARN Certificate for {word} expires in {int} days", "WARN", 0.8),
    LineTemplate("[{ts}] INFO Autoscaler set replicas to {int}", "INFO", 0.7),
    LineTemplate("[{ts}] ERROR Checksum mismatch for block {int}", "ERROR", 0.6),
]

WORDS = np.array(
    [
        "alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi",
        "ivan", "judy", "mallory", "oscar", "peggy", "trent", "victor",
        "wendy", "orders", "billing", "search", "auth", "payments", "users",
        "inventory", "shipping", "analytics", "cache", "primary", "replica",
        "eu-west", "us-east",
    ]
)

LANGS = np.array(["en", "de", "fr", "es", "zh", "und"])
LANG_P = np.array([0.6, 0.1, 0.1, 0.08, 0.07, 0.05])

N_DOMAINS = 50
BASE_TS = np.datetime64("2025-01-01T00:00:00", "us")
SPAN_SECONDS = 30 * 24 * 3600

_W = np.array([t.weight for t in TEMPLATES])
TEMPLATE_P = _W / _W.sum()

HTML_VARIANTS = [
    ("<html><body>", "</body></html>"),
    ("<html><head><title>page</title></head><body>", "</body></html>"),
    ("<html><body><div class=\"main\">", "</div></body></html>"),
]

# Domain popularity: Zipf over 50 domains.
_DW = 1.0 / np.arange(1, N_DOMAINS + 1, dtype=np.float64)
DOMAIN_P = _DW / _DW.sum()

# Corpus generator version: bump whenever generated bytes change so
# cached /tmp corpora regenerate (ensure_pages checks the marker).
PAGES_VERSION = 2

_DOMAIN_CDF = np.cumsum(DOMAIN_P)


def domain_of_rownum(rownum: np.ndarray) -> np.ndarray:
    """Zipf-distributed domain as a PURE FUNCTION of the global row
    number (Knuth multiplicative hash → uniform → inverse CDF), so any
    shard can reconstruct any page's url — the property the link graph
    needs for cross-shard link targets to be real pages."""
    h = (np.asarray(rownum, dtype=np.uint64) * np.uint64(2654435761)
         % np.uint64(2**32)).astype(np.float64) / 2.0**32
    return np.searchsorted(_DOMAIN_CDF, h, side="right").clip(0, N_DOMAINS - 1)


def url_of_rownum(rownum: np.ndarray) -> np.ndarray:
    """Canonical url of a page row (see domain_of_rownum)."""
    rownum = np.asarray(rownum, dtype=np.int64)
    k = domain_of_rownum(rownum)
    return np.char.add(
        np.char.add("https://example", k.astype("U2")),
        np.char.add(".com/p", rownum.astype("U20")),
    )


def domain_tier(k: int) -> str:
    """Deterministic enrichment ground truth: domain rank → tier."""
    return "tier1" if k < 5 else ("tier2" if k < 20 else "tier3")


DOMAIN_TIERS: dict[str, str] = {
    f"example{k}.com": domain_tier(k) for k in range(N_DOMAINS)
}

LANG_NAMES: dict[str, str] = {
    "en": "English", "de": "German", "fr": "French", "es": "Spanish",
    "zh": "Chinese", "und": "Unknown",
}


def _split_fmt(fmt: str) -> list[str]:
    """Split a template fmt into literal / slot pieces in order."""
    pieces, rest = [], fmt
    slots = ("{ts}", "{int}", "{float}", "{word}", "{ip}")
    while rest:
        nxt = min(((rest.find(s), s) for s in slots if rest.find(s) >= 0),
                  default=None)
        if nxt is None:
            pieces.append(rest)
            break
        pos, slot = nxt
        if pos:
            pieces.append(rest[:pos])
        pieces.append(slot)
        rest = rest[pos + len(slot):]
    return pieces


import pyarrow.compute as pc  # noqa: E402


def _render_lines(rng: np.random.Generator, n_lines: int,
                  line_ts: np.ndarray) -> tuple[pa.Array, np.ndarray]:
    """Render n_lines log lines; returns (string array, template_idx).

    All concatenation happens in Arrow's binary_join_element_wise kernel
    (one C pass), not Python string ops.
    """
    tidx = rng.choice(len(TEMPLATES), size=n_lines, p=TEMPLATE_P)
    # Pre-draw parameter pools; each template consumes what it needs.
    ints = rng.integers(0, 100000, size=(n_lines, 4))
    fl_whole = rng.integers(0, 100, size=(n_lines, 2))
    fl_frac = rng.integers(10, 100, size=(n_lines, 2))  # 2 digits, no zfill
    words_i = rng.integers(0, len(WORDS), size=(n_lines, 2))
    ip_oct = rng.integers(0, 256, size=(n_lines, 4))

    # Sort once by template id; per-template work is contiguous slices.
    order = np.argsort(tidx, kind="stable")
    counts = np.bincount(tidx, minlength=len(TEMPLATES))
    starts = np.concatenate(([0], np.cumsum(counts)))

    # cast to second precision: Arrow's %S renders fractional digits
    # for sub-second timestamp units
    ts_sorted = pc.strftime(pa.array(line_ts[order]).cast(pa.timestamp("s")),
                            format="%Y-%m-%d %H:%M:%S")
    ints_s = ints[order].astype("U6")
    flw_s = fl_whole[order].astype("U2")
    flf_s = fl_frac[order].astype("U2")
    words_s = WORDS[words_i[order]]
    ipo_s = ip_oct[order].astype("U3")
    ips_sorted = pc.binary_join_element_wise(
        pa.array(ipo_s[:, 0]), pa.array(ipo_s[:, 1]),
        pa.array(ipo_s[:, 2]), pa.array(ipo_s[:, 3]), ".")

    rendered_parts: list[pa.Array] = []
    for t in range(len(TEMPLATES)):
        lo, hi = int(starts[t]), int(starts[t + 1])
        if lo == hi:
            continue
        pools = {"{int}": 0, "{float}": 0, "{word}": 0}
        cols = []
        for piece in _split_fmt(TEMPLATES[t].fmt):
            if piece == "{ts}":
                cols.append(ts_sorted.slice(lo, hi - lo))
            elif piece == "{ip}":
                cols.append(ips_sorted.slice(lo, hi - lo))
            elif piece == "{int}":
                cols.append(pa.array(ints_s[lo:hi, pools[piece]]))
                pools[piece] += 1
            elif piece == "{float}":
                i = pools[piece]
                pools[piece] += 1
                cols.append(pc.binary_join_element_wise(
                    pa.array(flw_s[lo:hi, i]), pa.array(flf_s[lo:hi, i]), "."))
            elif piece == "{word}":
                cols.append(pa.array(words_s[lo:hi, pools[piece]]))
                pools[piece] += 1
            else:
                cols.append(piece)  # literal scalar, broadcast by the kernel
        rendered_parts.append(pc.binary_join_element_wise(*cols, ""))
    # Reassemble in original line order with a single inverse take.
    if not rendered_parts:
        # zero-line shard (n_pages < n_files): typed empty, not an
        # un-inferable concat_arrays([]) crash (round-4 review)
        return pa.array([], type=pa.string()), tidx
    by_template = pa.concat_arrays(
        [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
         for p in rendered_parts])
    inv = np.empty(n_lines, dtype=np.int64)
    inv[order] = np.arange(n_lines)
    return by_template.take(pa.array(inv)), tidx


def generate_shard(shard: int, start_row: int, n_rows: int,
                   seed: int = SEED,
                   total_pages: int | None = None) -> pa.Table:
    """Generate one shard of the pages table (rows [start_row,
    start_row+n_rows)). ``total_pages`` is the whole corpus size —
    outlink targets are drawn from it so every link resolves to a real
    page; when absent (unit-scale callers) the local row range is the
    universe."""
    rng = np.random.default_rng((seed, shard))
    n_lines_per_page = rng.integers(1, 21, size=n_rows)
    offsets = np.concatenate(([0], np.cumsum(n_lines_per_page)))
    total_lines = int(offsets[-1])

    rownum = np.arange(start_row, start_row + n_rows)
    # rng.choice kept to preserve the draw sequence for the fields
    # below; the domain itself is the rownum-deterministic function.
    rng.choice(N_DOMAINS, size=n_rows, p=DOMAIN_P)
    urls = url_of_rownum(rownum)
    warc_off = rng.integers(0, SPAN_SECONDS, size=n_rows)
    warc_ts = BASE_TS + warc_off * np.timedelta64(1_000_000, "us")

    # Per-line timestamp = page warc_ts + line_no seconds.
    page_idx = np.repeat(np.arange(n_rows), n_lines_per_page)
    line_no = np.arange(total_lines) - offsets[:-1][page_idx]
    line_ts = warc_ts[page_idx] + line_no * np.timedelta64(1_000_000, "us")

    lines, _tidx = _render_lines(rng, total_lines, line_ts)

    # Page text = '\n'.join(lines) — via a ListArray + Arrow's binary_join.
    line_lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), lines)
    texts = pc.binary_join(line_lists, "\n")

    variant = rng.integers(0, len(HTML_VARIANTS), size=n_rows)
    pre = pa.array(np.array([v[0] for v in HTML_VARIANTS])[variant])
    post = pa.array(np.array([v[1] for v in HTML_VARIANTS])[variant])

    # Outlinks: 0-5 per page to uniformly-drawn real pages of the
    # corpus, appended as empty-anchor <a> tags (contribute NO visible
    # text, so the html→text extraction invariant stays byte-exact).
    # Separate rng stream: the main stream's draw sequence (and hence
    # all previously-pinned content) is untouched.
    lrng = np.random.default_rng((seed, shard, 101))
    universe = total_pages if total_pages else start_row + n_rows
    n_links = lrng.integers(0, 6, size=n_rows)
    tgt = lrng.integers(0, universe, size=int(n_links.sum()))
    anchors = pa.array(np.char.add(
        np.char.add('<a href="', url_of_rownum(tgt)), '"></a>'))
    link_lists = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(n_links))),
                 type=pa.int32()), anchors)
    links_html = pc.binary_join(link_lists, "")

    htmls = pc.binary_join_element_wise(pre, texts, links_html, post,
                                        "").cast(pa.binary())

    langs = LANGS[rng.choice(len(LANGS), size=n_rows, p=LANG_P)]

    return pa.Table.from_arrays(
        [
            pa.array(urls),
            pa.array(warc_ts, type=pa.timestamp("us")),
            htmls,
            texts,
            pa.array(langs),
        ],
        schema=PAGES_SCHEMA,
    )


def shard_bounds(n_pages: int, n_files: int) -> list[tuple[int, int]]:
    base, rem = divmod(n_pages, n_files)
    bounds, start = [], 0
    for i in range(n_files):
        n = base + (1 if i < rem else 0)
        bounds.append((start, n))
        start += n
    return bounds


def _write_shard(args) -> str:
    out_dir, shard, start, n, seed, total_pages = args
    path = os.path.join(out_dir, f"pages-{shard:05d}.parquet")
    tbl = generate_shard(shard, start, n, seed=seed,
                         total_pages=total_pages)
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp, compression="zstd")
    os.replace(tmp, path)
    return path


def write_pages(out_dir: str, n_pages: int, seed: int = SEED,
                n_files: int = 8, overwrite: bool = False,
                processes: int | None = None) -> list[str]:
    """Write the pages table as n_files parquet shards; resumable (skips
    shards whose file already exists unless overwrite). Shards are
    independent (seeded per shard), so generation parallelizes across
    processes."""
    os.makedirs(out_dir, exist_ok=True)
    paths, todo = [], []
    for shard, (start, n) in enumerate(shard_bounds(n_pages, n_files)):
        path = os.path.join(out_dir, f"pages-{shard:05d}.parquet")
        paths.append(path)
        if not (os.path.exists(path) and not overwrite):
            todo.append((out_dir, shard, start, n, seed, n_pages))
    if todo:
        procs = processes or min(16, os.cpu_count() or 4, len(todo))
        if procs > 1 and len(todo) > 1:
            import multiprocessing as mp

            with mp.get_context("spawn").Pool(procs) as pool:
                list(pool.imap_unordered(_write_shard, todo))
        else:
            for args in todo:
                _write_shard(args)
    return paths


def ensure_pages(out_dir: str, n_pages: int, seed: int = SEED,
                 n_files: int = 8) -> str:
    """Idempotently materialize the pages dataset; returns out_dir."""
    marker = os.path.join(out_dir, "_COMPLETE")
    expect = f"{n_pages} {seed} {n_files} v{PAGES_VERSION}\n"
    have = None
    if os.path.exists(marker):
        with open(marker) as f:
            have = f.read()
    if have == expect:
        # corroborate the marker: a run killed mid-rebuild (or a /tmp
        # sweeper) can leave the marker without the parquet shards,
        # which poisons every later read with a confusing glob miss
        import glob as _glob

        if len(_glob.glob(os.path.join(out_dir, "pages-*.parquet"))) \
                != n_files:
            have = None
    if have != expect:
        # wipe on ANY mismatch — including marker ABSENT with shard
        # files present (a run killed before the marker write):
        # write_pages skips existing same-named shards, so unmarked
        # leftovers from different params would be falsely certified
        # (round-4 review finding)
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        write_pages(out_dir, n_pages, seed=seed, n_files=n_files)
        with open(marker, "w") as f:
            f.write(expect)
    return out_dir


def make_edge_pages() -> pa.Table:
    """F5 hand-written edge-case corpus (unit tests only)."""
    texts = [
        "",  # empty page
        "solo",  # single-token line
        "12345\n987 654 321",  # all-numeric lines (is_number gating)
        "[2025-01-01 00:00:00] INFO Server started on port 80",
        "<13>Feb  5 17:32:18 host app[123]: something happened",  # syslog pri
        "2025/03/04 05:06:07 slash-format timestamp line",
        "ünïcødé line with emoji ☃",
    ]
    n = len(texts)
    return pa.Table.from_arrays(
        [
            pa.array([f"https://edge.example.com/e{i}" for i in range(n)]),
            pa.array([BASE_TS + np.timedelta64(i, "s") for i in range(n)],
                     type=pa.timestamp("us")),
            pa.array([(f"<html><body>{t}</body></html>").encode() for t in texts],
                     type=pa.binary()),
            pa.array(texts, type=pa.string()),
            pa.array(["en", "en", "en", "en", "en", "de", "und"]),
        ],
        schema=PAGES_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Raw-log corpora for the reader/parser family oracles (CSV, JSON-lines,
# syslog text, logical-line pages). Deterministic pure functions of
# (n_rows, seed); cached under /tmp like the pages corpus. Constraints
# that keep the DuckDB oracles exact:
# - CSV bodies contain no commas/quotes/newlines (no dialect ambiguity);
# - JSON values are scalars only (strings / ints);
# - no line carries trailing whitespace (the logical-line continuation
#   decision then depends only on the RAW previous line, which SQL can
#   express with lag() instead of a recurrence).
# ---------------------------------------------------------------------------

CSV_COMPONENTS = np.array(["api", "db", "cache", "auth", "worker"])
CSV_SEVERITIES = np.array(["DEBUG", "INFO", "WARN", "ERROR"])
CSV_SEV_P = np.array([0.2, 0.55, 0.15, 0.1])
SYSLOG_PROGS = np.array(["sshd", "cron", "nginx", "systemd", "kernel"])
SYSLOG_HOSTS = np.array([f"node{i:02d}" for i in range(8)])
JSON_USERS = np.array([f"user{i}" for i in range(40)])


def _ts_strings(rng: np.random.Generator, n: int) -> np.ndarray:
    secs = rng.integers(0, SPAN_SECONDS, size=n)
    ts = BASE_TS + secs.astype("timedelta64[s]")
    return np.datetime_as_string(ts.astype("datetime64[s]"), unit="s")


def write_rawlogs_csv(out_dir: str, n_rows: int, seed: int = SEED,
                      n_files: int = 4) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed + 101)
    ts = np.char.replace(_ts_strings(rng, n_rows), "T", " ")
    sev = CSV_SEVERITIES[rng.choice(len(CSV_SEVERITIES), size=n_rows,
                                    p=CSV_SEV_P)]
    comp = CSV_COMPONENTS[rng.integers(0, len(CSV_COMPONENTS), size=n_rows)]
    code = rng.integers(100, 600, size=n_rows)
    lat = rng.integers(1, 5000, size=n_rows)
    body = np.char.add(
        np.char.add("request handled in ", lat.astype(str)),
        np.char.add(" ms by ", comp))
    for f, (lo, cnt) in enumerate(shard_bounds(n_rows, n_files)):
        lines = ["ts,sev,body,component,code"]
        lines += [f"{ts[i]},{sev[i]},{body[i]},{comp[i]},{code[i]}"
                  for i in range(lo, lo + cnt)]
        path = os.path.join(out_dir, f"logs-{f:03d}.csv")
        with open(path + ".tmp", "w") as fh:
            fh.write("\n".join(lines) + "\n")
        os.replace(path + ".tmp", path)


def write_rawlogs_jsonl(out_dir: str, n_rows: int, seed: int = SEED,
                        n_files: int = 4) -> None:
    """JSON-lines with heuristic-key variety: half the rows use
    message/level/time, half msg/severity/timestamp; extras
    (user/status/latency_ms) are independently present/absent."""
    import json as _json

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed + 202)
    ts = np.char.replace(_ts_strings(rng, n_rows), "T", " ")
    sev = CSV_SEVERITIES[rng.choice(len(CSV_SEVERITIES), size=n_rows,
                                    p=CSV_SEV_P)]
    alt = rng.random(n_rows) < 0.5
    user_on = rng.random(n_rows) < 0.7
    status_on = rng.random(n_rows) < 0.6
    users = JSON_USERS[rng.integers(0, len(JSON_USERS), size=n_rows)]
    status = rng.choice([200, 404, 500, 301], size=n_rows)
    lat = rng.integers(1, 5000, size=n_rows)
    msgs = np.char.add("request completed route r",
                       rng.integers(0, 25, size=n_rows).astype(str))
    for f, (lo, cnt) in enumerate(shard_bounds(n_rows, n_files)):
        out = []
        for i in range(lo, lo + cnt):
            d: dict = {}
            if alt[i]:
                d["msg"] = str(msgs[i])
                d["severity"] = str(sev[i])
                d["timestamp"] = str(ts[i])
            else:
                d["message"] = str(msgs[i])
                d["level"] = str(sev[i])
                d["time"] = str(ts[i])
            if user_on[i]:
                d["user"] = str(users[i])
            if status_on[i]:
                d["status"] = int(status[i])
            d["latency_ms"] = int(lat[i])
            out.append(_json.dumps(d))
        path = os.path.join(out_dir, f"logs-{f:03d}.json")
        with open(path + ".tmp", "w") as fh:
            fh.write("\n".join(out) + "\n")
        os.replace(path + ".tmp", path)


def write_rawlogs_syslog(out_dir: str, n_rows: int, seed: int = SEED,
                         n_files: int = 4) -> None:
    """RFC3164-style lines: <pri>Mon DD HH:MM:SS host prog[pid]: msg,
    ~10% without [pid], ~5% malformed (no <pri> header → syslog_ok
    false). Days 10–28 keep strptime padding trivial on both engines."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed + 303)
    months = np.array(["Jan", "Feb", "Mar", "Apr"])
    mon = months[rng.integers(0, len(months), size=n_rows)]
    day = rng.integers(10, 29, size=n_rows)
    hh = rng.integers(0, 24, size=n_rows)
    mm = rng.integers(0, 60, size=n_rows)
    ss = rng.integers(0, 60, size=n_rows)
    host = SYSLOG_HOSTS[rng.integers(0, len(SYSLOG_HOSTS), size=n_rows)]
    prog = SYSLOG_PROGS[rng.integers(0, len(SYSLOG_PROGS), size=n_rows)]
    pid = rng.integers(100, 32768, size=n_rows)
    pid_on = rng.random(n_rows) < 0.9
    malformed = rng.random(n_rows) < 0.05
    # facility 0-23, severity 0-7 → pri = fac*8 + sev
    fac = rng.integers(0, 24, size=n_rows)
    sev = rng.integers(0, 8, size=n_rows)
    pri = fac * 8 + sev
    msgn = rng.integers(0, 1000, size=n_rows)
    for f, (lo, cnt) in enumerate(shard_bounds(n_rows, n_files)):
        lines = []
        for i in range(lo, lo + cnt):
            stamp = f"{mon[i]} {day[i]:02d} {hh[i]:02d}:{mm[i]:02d}:{ss[i]:02d}"
            p = f"[{pid[i]}]" if pid_on[i] else ""
            if malformed[i]:
                lines.append(f"bare unparseable line number {msgn[i]}")
            else:
                lines.append(f"<{pri[i]}>{stamp} {host[i]} {prog[i]}{p}: "
                             f"event {msgn[i]} occurred")
        path = os.path.join(out_dir, f"logs-{f:03d}.log")
        with open(path + ".tmp", "w") as fh:
            fh.write("\n".join(lines) + "\n")
        os.replace(path + ".tmp", path)


def write_rawlogs_mlpages(out_dir: str, n_pages: int, seed: int = SEED) -> None:
    """Pages whose text embeds continuation lines (indented
    stack-trace style + trailing-backslash wraps) for the S4
    logical-line joiner oracle. No trailing whitespace anywhere."""
    rng = np.random.default_rng(seed + 404)
    os.makedirs(out_dir, exist_ok=True)
    urls, texts = [], []
    for p in range(n_pages):
        n_lines = int(rng.integers(4, 12))
        lines = []
        for li in range(n_lines):
            kind = rng.random()
            base = f"event {p}-{li} code {int(rng.integers(0, 500))}"
            if kind < 0.25 and lines:
                lines.append(f"    at frame_{int(rng.integers(0, 99))}(file.c)")
            elif kind < 0.35:
                lines.append(base + " \\")
                lines.append(f"continued tail {int(rng.integers(0, 99))}")
            else:
                lines.append(base)
        urls.append(f"https://mlog.example.com/p{p}")
        texts.append("\n".join(lines))
    t = pa.table({"url": pa.array(urls, type=pa.string()),
                  "text": pa.array(texts, type=pa.string())})
    path = os.path.join(out_dir, "pages.parquet")
    pq.write_table(t, path + ".tmp", compression="zstd")
    os.replace(path + ".tmp", path)


def write_rawlogs_gz(out_dir: str, n_rows: int, seed: int = SEED,
                     n_files: int = 4) -> None:
    """Gzip-compressed plain-text logs: "LEVEL component request N".
    Proves the extension-dispatched decompression path end-to-end
    (reference src/file_data_loader.cpp:93-116); DuckDB reads the same
    .gz files natively for the oracle."""
    import gzip

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed + 404)
    levels = np.array(["INFO", "WARN", "ERROR", "DEBUG"])
    comps = np.array(["auth", "billing", "cache", "api", "worker"])
    lv = levels[rng.integers(0, len(levels), size=n_rows)]
    cp = comps[rng.integers(0, len(comps), size=n_rows)]
    msgn = rng.integers(0, 100000, size=n_rows)
    for f, (lo, cnt) in enumerate(shard_bounds(n_rows, n_files)):
        lines = [f"{lv[i]} {cp[i]} request {msgn[i]}"
                 for i in range(lo, lo + cnt)]
        path = os.path.join(out_dir, f"logs-{f:03d}.log.gz")
        with open(path + ".tmp", "wb") as raw:
            # mtime=0 keeps the .gz bytes deterministic across runs
            with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as gz:
                gz.write(("\n".join(lines) + "\n").encode())
        os.replace(path + ".tmp", path)


def ensure_rawlogs(out_dir: str, n_rows: int, seed: int = SEED) -> str:
    """Idempotently materialize the raw-log corpora under
    out_dir/{csv,jsonl,syslog,mlog,gz}; returns out_dir."""
    marker = os.path.join(out_dir, "_COMPLETE")
    expect = f"{n_rows} {seed}\n"
    have = None
    if os.path.exists(marker):
        with open(marker) as f:
            have = f.read()
    # compare the marker CONTENT — a cache built with different
    # (n_rows, seed) must rebuild, not be silently served (round-4
    # review: the params were written but never read back)
    if have != expect:
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        write_rawlogs_csv(os.path.join(out_dir, "csv"), n_rows, seed)
        write_rawlogs_jsonl(os.path.join(out_dir, "jsonl"), n_rows, seed)
        write_rawlogs_syslog(os.path.join(out_dir, "syslog"), n_rows, seed)
        write_rawlogs_mlpages(os.path.join(out_dir, "mlog"),
                              max(n_rows // 10, 50), seed)
        with open(marker, "w") as f:
            f.write(expect)
    # gz corpus added in round 3: generate independently so cached
    # pre-round-3 corpora pick it up without a full regeneration
    gz_dir = os.path.join(out_dir, "gz")
    if not (os.path.isdir(gz_dir)
            and any(f.endswith(".log.gz") for f in os.listdir(gz_dir))):
        write_rawlogs_gz(gz_dir, n_rows, seed)
    return out_dir
