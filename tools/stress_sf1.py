"""sf1 streaming stress (round-4 judge item #1): run the flagship,
hash dedup, MinHash near-dup pairing, and the curation job at 10x
bench scale (1M pages -> 10.5M log lines; 1M documents) inside the
single-node sandbox, recording wall time plus PEAK DRIVER RSS and
peak object-store usage — the cheapest falsifier of hidden
driver-side materializations in a design that claims to stream.

Inputs are synthesized deterministically under /tmp (idempotent,
seeded): pages via the repo's shard-seeded generator; documents by
tiling the sf0.1 table 200x with per-(doc,tile) mutation classes —
2% exact cross-tile copies (flood path: star/bucket caps), 3% light
prefix perturbations (true near-dups), 95% heavy doc-unique word
substitutions (2 of every 3 words replaced by per-(doc,tile) hex
tokens: cross-tile char-shingle Jaccard ~0.08, far below the LSH
collision regime, so heavy docs are GENUINELY unique — a first
attempt that kept 50% of words made every 200-member cross-tile
family collide in ~12% of bands and exploded candidates to ~12M
noise pairs) — a realistic dedup mix at 1M docs.

Usage: python tools/stress_sf1.py [--jobs flagship,dedup,minhash,curation]
Writes BENCH_SF1_r4.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import threading
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1_DIR = "/tmp/testdata/sf1"
SF1B_DIR = "/tmp/testdata/sf1_boilerplate"
TILES = 200            # 5,000 docs x 200 = 1M docs
FILES = 8
N_PAGES = 1_000_000    # ~10.5M non-empty lines


def build_sf1_documents(corpus: str = "mixed") -> str:
    """corpus="mixed": the realistic 2/3/95 class mix.
    corpus="boilerplate": the ADVERSARIAL shape — heavy docs share
    per-tile mutation tokens, so every doc overlaps ~30% of its
    shingles with 5,000 tile-mates (template boilerplate at crawl
    scale); LSH floods buckets with sub-threshold noise. The engine
    must stay bounded (star/bucket caps + the partitioned sweep)."""
    out_dir = SF1_DIR if corpus == "mixed" else SF1B_DIR
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_DONE_DOCS")
    expect = f"tiles={TILES} files={FILES} corpus={corpus} v3\n"
    if os.path.exists(marker) and open(marker).read() == expect:
        return out_dir
    base = pq.read_table(os.path.join(SF01, "documents.parquet"))
    n = base.num_rows
    ids = np.asarray(base.column("doc_id"), dtype=np.int64)
    texts = base.column("text").to_pylist()
    langs = base.column("lang")
    srcs = base.column("source")
    # documents.parquet is a DIRECTORY of part files: every reader in
    # the repo resolves {sf_dir}/documents.parquet via ray/pyarrow
    # dataset reads, which accept directories
    doc_dir = os.path.join(out_dir, "documents.parquet")
    os.makedirs(doc_dir, exist_ok=True)
    tiles_per_file = TILES // FILES
    for f_idx in range(FILES):
        path = os.path.join(doc_dir, f"part-{f_idx:03d}.parquet")
        writer = None
        for k in range(f_idx * tiles_per_file,
                       (f_idx + 1) * tiles_per_file):
            if k == 0:
                new_texts = texts
            else:
                new_texts = []
                for i, t in enumerate(texts):
                    h = (int(ids[i]) * 31 + k * 7) % 100
                    if h < 2:          # exact cross-tile copy
                        new_texts.append(t)
                    elif h < 5:        # light perturb -> near-dup
                        new_texts.append(f"tile{k} near " + t)
                    elif corpus == "boilerplate":
                        # tile-shared tokens: all 5,000 tile-mates
                        # overlap ~30% of shingles
                        ws = t.split(" ")
                        for j in range(0, len(ws), 5):
                            ws[j] = f"w{k}m{j}"
                        new_texts.append(" ".join(ws))
                    else:              # heavy mutation -> unique
                        ws = t.split(" ")
                        u = (k * 5000 + i) * 977
                        for j in range(len(ws)):
                            if j % 3:
                                ws[j] = f"{(u + j * 131):x}"
                        new_texts.append(" ".join(ws))
            ta = pa.array(new_texts, pa.string())
            tile = pa.table({
                "doc_id": pa.array(ids + k * n),
                "text": ta,
                "lang": langs,
                "source": srcs,
                "n_chars": pa.compute.cast(
                    pa.compute.utf8_length(ta), pa.int64()),
            })
            if writer is None:
                writer = pq.ParquetWriter(path, tile.schema)
            writer.write_table(tile)
        writer.close()
    with open(marker, "w") as f:
        f.write(expect)
    return out_dir


def _vm_rss_bytes() -> int:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 0


class MemSampler(threading.Thread):
    """0.25s sampler: object-store usage (cluster minus available),
    node MemAvailable, and the driver's CURRENT VmRSS — sampled, not
    ru_maxrss, because ru_maxrss is a monotonic lifetime peak that
    would misattribute an earlier job's high-water mark to every
    later job in the same process."""

    def __init__(self):
        super().__init__(daemon=True)
        self.stop_evt = threading.Event()
        self.peak_obj = 0
        self.min_avail = 1 << 62
        self.peak_rss = _vm_rss_bytes()

    def run(self):
        import ray
        total = ray.cluster_resources().get("object_store_memory", 0)
        while not self.stop_evt.is_set():
            avail = ray.available_resources() \
                .get("object_store_memory", total)
            self.peak_obj = max(self.peak_obj, int(total - avail))
            self.peak_rss = max(self.peak_rss, _vm_rss_bytes())
            try:
                with open("/proc/meminfo") as f:
                    for line in f:
                        if line.startswith("MemAvailable:"):
                            kb = int(line.split()[1])
                            self.min_avail = min(self.min_avail,
                                                 kb * 1024)
                            break
            except OSError:
                pass
            self.stop_evt.wait(0.25)


def run_job(name: str, fn) -> dict:
    sampler = MemSampler()
    rss0 = _vm_rss_bytes()
    sampler.start()
    t0 = time.time()
    result = fn()
    wall = time.time() - t0
    sampler.stop_evt.set()
    sampler.join()
    final = max(sampler.peak_rss, _vm_rss_bytes())
    lifetime = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    return {
        "wall_sec": round(wall, 2),
        "result": result,
        "driver_peak_rss_gb": round(final / (1 << 30), 3),
        "driver_rss_growth_gb": round((final - rss0) / (1 << 30), 3),
        "driver_lifetime_maxrss_gb": round(lifetime / (1 << 20), 3),
        "peak_object_store_gb": round(sampler.peak_obj / (1 << 30),
                                      3),
        "min_node_avail_gb": round(sampler.min_avail / (1 << 30), 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs",
                    default="flagship,dedup,minhash,curation")
    ap.add_argument("--corpus", default="mixed",
                    choices=("mixed", "boilerplate"))
    args = ap.parse_args()
    jobs = args.jobs.split(",")

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from log_analysis_ai_ray import synth
    from log_analysis_ai_ray.pipelines import curation, flagship
    from log_analysis_ai_ray.pipelines.queries import QUERIES

    sf_dir = build_sf1_documents(args.corpus)
    out = {"sf": 1.0, "n_docs": TILES * 5000, "n_pages": N_PAGES,
           "corpus": args.corpus,
           "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
           "jobs": {}}

    if "flagship" in jobs:
        pages = synth.ensure_pages("/tmp/graft_pages/sf1", N_PAGES,
                                   n_files=32)

        def job_flagship():
            m = flagship.run(pages, "/tmp/sf1_flagship_out")["metrics"]
            return {"rows": m["rows_routed"],
                    "n_templates": m["n_templates"],
                    "rows_per_sec": round(
                        m["rows_routed"] / m["total_sec"], 1)}

        out["jobs"]["flagship"] = run_job("flagship", job_flagship)

    if "dedup" in jobs:
        def job_dedup():
            t = QUERIES["doc_dedup_hash"][0](sf_dir)
            return {"unique_texts": t.num_rows}

        out["jobs"]["doc_dedup_hash"] = run_job("dedup", job_dedup)

    if "minhash" in jobs:
        def job_minhash():
            t = QUERIES["doc_minhash_pairs"][0](sf_dir)
            n = (t.num_rows if isinstance(t, pa.Table)
                 else t.count())  # spilled Dataset on saturation
            return {"candidate_pairs": int(n),
                    "spilled": not isinstance(t, pa.Table)}

        out["jobs"]["doc_minhash_pairs"] = run_job("minhash",
                                                   job_minhash)

    if "curation" in jobs:
        def job_curation():
            m = curation.run_curation(
                os.path.join(sf_dir, "documents.parquet"),
                "/tmp/sf1_curation_out")
            return {k: m[k] for k in sorted(m)
                    if isinstance(m[k], (int, float, str))}

        out["jobs"]["curation"] = run_job("curation", job_curation)

    print(json.dumps(out))
    tag = "" if args.corpus == "mixed" else "_boilerplate"
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), f"BENCH_SF1_r4{tag}.json"),
            "w") as f:
        json.dump(out, f, indent=1)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
