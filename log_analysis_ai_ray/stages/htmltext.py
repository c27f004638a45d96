"""HTML → text extraction over the pages table's ``html`` binary column.

This is the input-contract invariant for the whole engine: for every
``url``, the text extracted from ``html`` must be byte-identical to the
page's stored ``text`` column (the reference pipeline's extracted-text
parity; BASELINE.json ``input_hint``). The flagship therefore reads the
pre-extracted ``text`` column when present and this stage exists for
inputs that carry only raw ``html``.

Scale shape: a stateless ``map_batches`` task stage, fully vectorized —
every pass is an Arrow RE2 kernel (``pc.replace_substring_regex``)
over the whole column, no Python per-row loop. RE2 has no
backreferences, so container elements (script/style/head/...) are
removed one tag at a time; each is a single non-greedy dot-all pass.

Deliberate semantics (documented, test-pinned):
- script/style/head/noscript/template/svg subtrees are dropped with
  their content; HTML comments are dropped.
- remaining tags are stripped in place — NO whitespace is inserted,
  so documents whose visible text already carries its own newlines
  (the Common-Crawl-style corpus here) round-trip byte-identically.
  Pass ``block_newlines=True`` to get trafilatura-style behavior where
  closing block tags (p/div/br/li/tr/h1..h6) become ``\n`` instead.
- the five XML named entities plus ``&nbsp;``/``&#39;``/``&#x27;`` are
  decoded vectorized; any row still containing ``&#`` after that takes
  a per-row ``html.unescape`` fallback (rare path, counted).
"""

from __future__ import annotations

import html as _htmllib

import pyarrow as pa
import pyarrow.compute as pc

# Elements whose entire subtree is non-content.
_CONTAINER_TAGS = ("script", "style", "head", "noscript", "template", "svg")

# Block-level tags whose close (or self-close, for br/hr) implies a
# line break when block_newlines=True.
_BLOCK_CLOSE_RE = (
    r"(?i)(</(?:p|div|li|tr|h[1-6]|section|article|blockquote|pre|"
    r"table|ul|ol)>|<(?:br|hr)\s*/?>)"
)

# Vectorized entity decode: (entity, replacement). &amp; LAST so that
# e.g. '&amp;lt;' decodes to '&lt;' (literal), not '<'.
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&#x27;", "'"),
    ("&nbsp;", "\xa0"),
    ("&amp;", "&"),
]


def extract_text_array(html_col, *, block_newlines: bool = False,
                       normalize_whitespace: bool = False) -> pa.Array:
    """Vectorized extraction over a binary/string Arrow column."""
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    s = html_col
    if pa.types.is_binary(s.type) or pa.types.is_large_binary(s.type):
        s = s.cast(pa.string())  # validates utf-8
    # 1. drop non-content subtrees + comments (one RE2 pass per tag;
    #    RE2 lacks backreferences so the tags can't share one pattern).
    for tag in _CONTAINER_TAGS:
        s = pc.replace_substring_regex(
            s, pattern=rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>",
            replacement="")
    s = pc.replace_substring_regex(s, pattern=r"(?s)<!--.*?-->",
                                   replacement="")
    # 2. tags → '' (or '\n' for block closers first).
    if block_newlines:
        s = pc.replace_substring_regex(s, pattern=_BLOCK_CLOSE_RE,
                                       replacement="\n")
    s = pc.replace_substring_regex(s, pattern=r"(?s)<[^>]*>",
                                   replacement="")
    # 3. entities, vectorized; numeric-entity rows take the slow path
    # FROM THE PRE-DECODE ORIGINAL — running unescape after the
    # vectorized &amp; pass double-decoded escaped entity text like
    # '&amp;#39;' (round-4 review finding)
    pre = s
    for ent, repl in _ENTITIES:
        s = pc.replace_substring(s, pattern=ent, replacement=repl)
    leftover = pc.match_substring_regex(s, r"&#\d|&#[xX][0-9a-fA-F]")
    if pc.any(leftover).as_py():
        py = s.to_pylist()
        orig = pre.to_pylist()
        mask = leftover.to_pylist()
        for i, flag in enumerate(mask):
            if flag and py[i] is not None:
                py[i] = _htmllib.unescape(orig[i])
        s = pa.array(py, type=pa.string())
    if normalize_whitespace:
        s = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(s, pattern=r"[ \t\r\f\v]+",
                                       replacement=" "))
        s = pc.replace_substring_regex(s, pattern=r"\n{3,}",
                                       replacement="\n\n")
    return s


class ExtractHtmlText:
    """map_batches stage: ``html`` (binary) → ``out_col`` (string).

    Stateless — run as a task-based stage (``map_batches(instance)``),
    not an actor pool; the regex programs live in Arrow's per-worker
    RE2 cache.
    """

    def __init__(self, html_col: str = "html", out_col: str = "text",
                 block_newlines: bool = False,
                 normalize_whitespace: bool = False,
                 drop_html: bool = True):
        self.html_col = html_col
        self.out_col = out_col
        self.block_newlines = block_newlines
        self.normalize_whitespace = normalize_whitespace
        self.drop_html = drop_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = extract_text_array(
            batch.column(self.html_col),
            block_newlines=self.block_newlines,
            normalize_whitespace=self.normalize_whitespace)
        if self.out_col in batch.column_names:
            batch = batch.drop_columns([self.out_col])
        batch = batch.append_column(self.out_col, text)
        if self.drop_html and self.html_col != self.out_col:
            batch = batch.drop_columns([self.html_col])
        return batch
