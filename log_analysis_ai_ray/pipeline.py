"""Config-driven pipeline composition — the public API surface.

The reference exposes parser selection by format string + config-driven
preprocessing (SURVEY.md §2.10; /root/reference/src/file_data_loader.cpp:351-363,
src/data_loader_config.h). The equivalent here: a ``PipelineConfig``
(JSON-serializable dict) names a source format, parser, preprocess
chain, enrichment dicts, routing and aggregate set; ``Pipeline.run``
composes the Dataset plan. UDF extension = any callable appended via
``extra_stages`` (plain ``map_batches`` functions).

Example::

    cfg = PipelineConfig(
        source={"format": "pages", "path": "/data/pages"},
        parser={"kind": "drain"},
        route={"out_dir": "/out", "num_sinks": 16},
    )
    result = Pipeline(cfg).run()
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field


@dataclass
class PipelineConfig:
    source: dict = field(default_factory=dict)   # format: pages|csv|json|text; path
    parser: dict = field(default_factory=dict)   # kind: drain|regex|syslog|line; options
    preprocess: dict = field(default_factory=dict)  # PreprocessorConfig fields
    enrich: dict = field(default_factory=dict)   # domain_tiers / lang_names overrides
    route: dict = field(default_factory=dict)    # out_dir, num_sinks
    aggregates: list = field(default_factory=lambda: ["registry", "levels",
                                                      "rollup"])
    # JSON-nameable per-batch transforms (kind + options), applied in
    # order after the parser — the config-file path to the text-
    # analysis / fingerprint stage family
    transforms: list = field(default_factory=list)
    extra_stages: list = field(default_factory=list)  # callables (UDFs)

    def to_json(self) -> str:
        d = asdict(self)
        d.pop("extra_stages")
        return json.dumps(d, indent=1, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "PipelineConfig":
        return cls(**json.loads(s))


class Pipeline:
    def __init__(self, config: PipelineConfig):
        self.config = config

    # -- source -----------------------------------------------------------

    def _source(self):
        from .sources import readers
        from .pipelines import flagship

        src = self.config.source
        fmt = src.get("format", "pages")
        path = src["path"]
        if fmt == "pages":
            return flagship.build_lines(path)
        if fmt == "text":
            return readers.read_text_lines(path)
        if fmt == "csv":
            return readers.read_csv_logs(
                path, dimensions=src.get("dimensions"),
                timestamp_format=src.get("timestamp_format"))
        if fmt == "json":
            return readers.read_json_logs(path)
        if fmt == "parquet":
            import ray.data

            return ray.data.read_parquet(path,
                                         columns=src.get("columns"))
        raise ValueError(f"unknown source format: {fmt}")

    # -- named transforms --------------------------------------------------

    @staticmethod
    def _transform_fn(spec: dict):
        """Resolve a JSON transform spec to a per-batch callable."""
        from .stages import textstats

        kind = spec.get("kind")
        text_col = spec.get("text_col", "text")
        table = {
            "langid": textstats.langid_features,
            "quality": textstats.quality_features,
            "subtokens": textstats.subtoken_counts,
            "fingerprints": textstats.fingerprints,
        }
        if kind in table:
            fn = table[kind]

            # APPEND the computed feature columns — the raw feature
            # fns project to (ids + features), which broke "applied
            # in order" chaining after the first transform and
            # silently discarded parsed columns (round-4 review)
            def _appending(t, fn=fn):
                feats = fn(t, text_col=text_col)
                out = t
                for cname in feats.column_names:
                    if cname not in out.column_names:
                        out = out.append_column(cname,
                                                feats.column(cname))
                return out

            return _appending
        if kind == "normalize":
            from .stages.dedup import normalize_text

            def _norm(t):
                return t.append_column("normalized",
                                       normalize_text(t.column(text_col)))
            return _norm
        if kind == "chunk":
            id_col = spec.get("id_col", "doc_id")
            width = int(spec.get("width", 32))
            stride = int(spec.get("stride", 24))
            return lambda t: textstats.token_chunks(
                t, text_col=text_col, id_col=id_col,
                width=width, stride=stride)
        if kind == "pii_redact":
            import pyarrow as pa
            import pyarrow.compute as pc

            pat = spec.get("pattern",
                           r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}")
            tag = spec.get("tag", "<IP>")

            def _redact(t):
                col = t.column(text_col)
                red = pc.replace_substring_regex(col, pattern=pat,
                                                 replacement=tag)
                n = pc.count_substring_regex(col, pattern=pat)                     .cast(pa.int64())
                t = t.set_column(t.schema.get_field_index(text_col),
                                 text_col, red)
                return t.append_column("n_redactions", n)
            return _redact
        raise ValueError(f"unknown transform kind: {kind}")

    # -- parser -----------------------------------------------------------

    def _apply_parser(self, ds):
        from .stages import parse as parse_mod
        from .stages import syslog as syslog_mod

        p = self.config.parser
        kind = p.get("kind", "drain")
        if kind == "line":
            return ds
        if kind == "syslog":
            return ds.map_batches(syslog_mod.parse_syslog,
                                  batch_format="pyarrow")
        if kind == "regex":
            patterns = p.get("patterns", {})
            return ds.map_batches(
                parse_mod.extract_attributes, batch_format="pyarrow",
                fn_kwargs={"patterns": patterns})
        if kind == "drain":
            # drain needs the two-pass template fit, which only the
            # pages flagship path wires up; silently passing raw rows
            # through looked like a successful parse (round-4 review)
            raise ValueError(
                "parser kind 'drain' is only supported with the "
                "'pages' source (the flagship path); use "
                "line/regex/syslog for raw-log sources")
        raise ValueError(f"unknown parser kind: {kind}")

    # -- run --------------------------------------------------------------

    def run(self) -> dict:
        from .pipelines import flagship
        from .stages import preprocess as prep

        cfg = self.config
        src_fmt = cfg.source.get("format", "pages")
        parser_kind = cfg.parser.get("kind", "drain")

        if src_fmt == "pages" and parser_kind == "drain":
            # the flagship path: full parse→enrich→route→aggregate
            if cfg.preprocess or cfg.transforms or cfg.extra_stages:
                # these only wire into the generic source path; a
                # silent drop here shipped unredacted data while the
                # config claimed a redaction ran (round-4 review)
                raise ValueError(
                    "preprocess/transforms/extra_stages are not "
                    "applied on the pages+drain flagship path; run "
                    "them over the routed output or use a "
                    "line/csv/json source")
            if "out_dir" not in cfg.route:
                raise ValueError("route.out_dir is required")
            fcfg = flagship.FlagshipConfig()
            if "num_sinks" in cfg.route:
                fcfg.num_sinks = cfg.route["num_sinks"]
            if "domain_tiers" in cfg.enrich:
                fcfg.domain_tiers = cfg.enrich["domain_tiers"]
            if "lang_names" in cfg.enrich:
                fcfg.lang_names = cfg.enrich["lang_names"]
            res = flagship.run(cfg.source["path"],
                               cfg.route["out_dir"], fcfg)
            # honor the aggregates selection (previously dead config)
            keep = set(cfg.aggregates) | {"manifest", "metrics",
                                          "mapping"}
            alias = {"registry": "registry", "levels": "levels",
                     "rollup": "rollup"}
            return {k: v for k, v in res.items()
                    if k in keep or alias.get(k, k) in keep}

        ds = self._source()
        if cfg.preprocess:
            pc_cfg = prep.PreprocessorConfig(**cfg.preprocess)
            ds = ds.map_batches(prep.Preprocessor(pc_cfg),
                                batch_format="pyarrow")
        ds = self._apply_parser(ds)
        for spec in cfg.transforms:
            ds = ds.map_batches(self._transform_fn(spec),
                                batch_format="pyarrow")
        for stage in cfg.extra_stages:
            ds = ds.map_batches(stage, batch_format="pyarrow")

        out: dict = {"dataset": ds}
        if cfg.route.get("out_dir"):
            ds.write_parquet(cfg.route["out_dir"])
        return out
