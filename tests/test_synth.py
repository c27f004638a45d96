import pyarrow as pa
import pyarrow.compute as pc

from log_analysis_ai_ray import synth
from log_analysis_ai_ray.schema import PAGES_SCHEMA


def test_schema_matches_input_hint():
    t = synth.generate_shard(0, 0, 100)
    assert t.schema.equals(PAGES_SCHEMA)


def test_deterministic():
    a = synth.generate_shard(3, 1000, 500)
    b = synth.generate_shard(3, 1000, 500)
    assert a.equals(b)


def test_shards_independent_of_total():
    # Shard i's content depends only on (seed, i, start, n) — not on how
    # many other shards exist; that's what makes generation resumable.
    a = synth.generate_shard(1, 200, 100)
    b = synth.generate_shard(1, 200, 100, seed=42)
    assert a.equals(b)
    c = synth.generate_shard(1, 200, 100, seed=7)
    assert not a.equals(c)


def test_urls_unique_across_shards():
    t1 = synth.generate_shard(0, 0, 300)
    t2 = synth.generate_shard(1, 300, 300)
    urls = pa.concat_arrays([t1["url"].combine_chunks(),
                             t2["url"].combine_chunks()])
    assert len(pc.unique(urls)) == 600


def test_text_embedded_in_html():
    t = synth.generate_shard(0, 0, 50)
    for i in range(10):
        text = t["text"][i].as_py().encode()
        html = t["html"][i].as_py()
        assert text in html
        assert html.startswith(b"<html>")


def test_line_count_bounds():
    t = synth.generate_shard(0, 0, 500)
    lens = pc.list_value_length(pc.split_pattern(t["text"], "\n"))
    assert pc.min(lens).as_py() >= 1
    assert pc.max(lens).as_py() <= 20


def test_hot_template_skew():
    # Template 0 must be the hot key (~30% of lines) for skew testing.
    assert synth.TEMPLATE_P[0] > 0.25
    assert synth.TEMPLATE_P[0] == max(synth.TEMPLATE_P)
