import pyarrow as pa

from log_analysis_ai_ray import synth
from log_analysis_ai_ray.functions.timestamps import parse_timestamp_cascade
from log_analysis_ai_ray.stages import explode, parse


def test_level_extraction():
    t = pa.table({"line": [
        "[x] INFO hello", "[x] ERROR bad", "GET /a 200 1ms", "plain text",
    ]})
    out = parse.parse_lines(t)
    assert out["level"].to_pylist() == ["INFO", "ERROR", "", ""]
    assert out["parse_ok"].to_pylist() == [True, True, True, False]


def test_timestamp_cascade_formats():
    arr = pa.array([
        "2025-01-02 03:04:05",
        "2025-01-02T03:04:05",
        "2025/01/02 03:04:05",
        "02/Jan/2025:03:04:05",
        "not a time",
    ])
    out = parse_timestamp_cascade(arr).to_pylist()
    assert [x is not None for x in out] == [True, True, True, True, False]
    assert all(x is None or (x.hour, x.minute, x.second) == (3, 4, 5)
               for x in out)


def test_line_ts_parsed_from_header():
    pages = synth.generate_shard(0, 0, 100)
    lines = parse.parse_lines(explode.explode_lines(pages))
    headered = lines.filter(
        pa.compute.match_substring_regex(lines["line"], r"^\["))
    assert headered["line_ts"].null_count == 0
    assert lines["parse_ok"].to_pylist().count(False) == 0


def test_extract_attributes_first_group():
    t = pa.table({"line": ["user=alice id=7", "id=9", "none"]})
    out = parse.extract_attributes(
        t, {"user": r"user=(\w+)", "rid": r"id=(\d+)"})
    assert out["user"].to_pylist() == ["alice", "", ""]
    assert out["rid"].to_pylist() == ["7", "9", ""]


def test_edge_corpus_no_exceptions():
    pages = synth.make_edge_pages()
    lines = explode.explode_lines(pages)
    out = parse.parse_lines(lines)
    # empty page contributed no line; nothing raised; flags present
    assert out.num_rows >= 6
    assert "parse_ok" in out.column_names


def test_join_logical_lines():
    from log_analysis_ai_ray.stages.explode import join_logical_lines
    lines = [
        "ERROR something broke",
        "  at foo.bar(Baz.java:10)",
        "  at qux.quux(Corge.java:20)",
        "INFO next entry \\",
        "continued here",
        "INFO standalone",
    ]
    out = join_logical_lines(lines)
    assert out == [
        "ERROR something broke at foo.bar(Baz.java:10) at qux.quux(Corge.java:20)",
        "INFO next entry continued here",
        "INFO standalone",
    ]


def test_explode_lines_joined():
    import pyarrow as pa
    from log_analysis_ai_ray.stages.explode import explode_lines_joined
    t = pa.table({
        "url": ["u1"], "warc_ts": pa.array([None], pa.timestamp("us")),
        "lang": ["en"],
        "text": ["A\n  cont\nB"],
    })
    out = explode_lines_joined(t)
    assert out["line"].to_pylist() == ["A cont", "B"]


def test_max_line_len_drop():
    import pyarrow as pa
    from log_analysis_ai_ray.stages.explode import explode_lines
    t = pa.table({
        "url": ["u"], "warc_ts": pa.array([None], pa.timestamp("us")),
        "lang": ["en"],
        "text": ["short\n" + "x" * 100],
    })
    out = explode_lines(t, max_line_len=50)
    assert out["line"].to_pylist() == ["short"]
    # default keeps everything (byte-identity invariant)
    out2 = explode_lines(t)
    assert len(out2) == 2
