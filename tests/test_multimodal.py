import numpy as np
import pyarrow as pa
import pytest

from log_analysis_ai_ray.stages import multimodal as mm


def test_pgm_roundtrip():
    px = np.arange(48, dtype=np.uint8).reshape(6, 8)
    data = mm.make_pgm(8, 6, px)
    out = mm.parse_pgm(data)
    np.testing.assert_array_equal(out, px)


def test_wav_roundtrip():
    s = np.array([0, 1000, -1000, 32000], dtype=np.int16)
    data = mm.make_wav(s, rate=8000)
    out, rate = mm.parse_wav(data)
    np.testing.assert_array_equal(out, s)
    assert rate == 8000


def test_unknown_formats_raise():
    with pytest.raises(NotImplementedError):
        mm.parse_pgm(b"\x89PNG....")
    with pytest.raises(NotImplementedError):
        mm.parse_wav(b"fLaC....")


def test_feature_stage_golden():
    t = mm.synth_media(9)
    out = mm.MediaFeatureStage()(t)
    rows = {r["media_id"]: r for r in out.to_pylist()}
    # image rows: features equal direct numpy on the decoded pixels
    img = t.filter(pa.compute.equal(t["kind"], "image"))
    for r in img.to_pylist():
        px = mm.parse_pgm(r["payload"])
        got = rows[r["media_id"]]
        assert abs(got["px_mean"] - px.mean()) < 1e-9
        assert abs(got["px_std"] - px.std()) < 1e-9
        assert got["rms"] is None
    aud = t.filter(pa.compute.equal(t["kind"], "audio"))
    for r in aud.to_pylist():
        s, _ = mm.parse_wav(r["payload"])
        got = rows[r["media_id"]]
        expect_rms = float(np.sqrt((s.astype(np.float64) ** 2).mean()))
        assert abs(got["rms"] - expect_rms) < 1e-9
        assert got["px_mean"] is None
    vid = t.filter(pa.compute.equal(t["kind"], "video"))
    for r in vid.to_pylist():
        got = rows[r["media_id"]]
        assert got["frames_sampled"] == len(range(0, r["n_frames"], 2))


def test_resize_stage():
    t = mm.synth_media(6)
    out = mm.ImageResizeStage(side=4)(t)
    for r in out.to_pylist():
        if r["kind"] == "image":
            assert (r["width"], r["height"]) == (4, 4)
            px = mm.parse_pgm(r["payload"])
            assert px.shape == (4, 4)


def test_media_features_via_ray(ray_session):
    import ray.data

    ds = ray.data.from_arrow(mm.synth_media(30)).repartition(3)
    out = mm.media_features(ds, batch_size=8)
    rows = out.take_all()
    assert len(rows) == 30
    # deterministic across block structures
    ds2 = ray.data.from_arrow(mm.synth_media(30)).repartition(7)
    rows2 = mm.media_features(ds2, batch_size=8).take_all()
    key = lambda r: r["media_id"]
    assert sorted(rows, key=key) == sorted(rows2, key=key)
