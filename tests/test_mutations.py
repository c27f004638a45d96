"""Versioned-store mutations (targeted delete, CDC upsert): bucket
pruning, idempotent reruns, order independence, audit chain."""

import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _run(name):
    from log_analysis_ai_ray.pipelines.queries import QUERIES

    return QUERIES[name][0](SF)


def test_mutations_order_independent_and_idempotent(ray_session,
                                                    tmp_path,
                                                    monkeypatch):
    """Each mutation derives from the base version, so results are
    identical whatever order the ops run in, and reruns publish no
    new versions."""
    import log_analysis_ai_ray.pipelines.queries as q
    from log_analysis_ai_ray.state import versioned

    monkeypatch.setattr(q, "_EVSTORE_ROOT", str(tmp_path / "store"))

    up1 = _run("upsert_corrections")
    del1 = _run("targeted_delete")
    up2 = _run("upsert_corrections")          # rerun AFTER the delete
    del2 = _run("targeted_delete")
    assert up1.equals(up2)
    assert del1.equals(del2)

    root = f"{tmp_path}/store/sf0.001"
    assert versioned.latest_version(root) == 3   # create + one each
    ops = [versioned.read_manifest(root, v)["op"] for v in (1, 2, 3)]
    assert ops[0] == "create"
    assert sorted(ops[1:]) == ["targeted_delete", "upsert_corrections"]
    # every mutation's lineage parent is the base version
    for v in (2, 3):
        assert versioned.read_manifest(root, v)["parent"] == 1


def test_upsert_rewrites_only_affected_buckets(ray_session, tmp_path,
                                               monkeypatch):
    import log_analysis_ai_ray.pipelines.queries as q
    from log_analysis_ai_ray.state import versioned

    monkeypatch.setattr(q, "_EVSTORE_ROOT", str(tmp_path / "store"))
    _run("upsert_corrections")
    root = f"{tmp_path}/store/sf0.001"
    m = versioned.read_manifest(root, 2)
    assert m["op"] == "upsert_corrections"
    rewritten = set(m["extra"]["rewritten_buckets"])
    # copy-on-write: files outside the rewritten buckets are the
    # base version's files, referenced verbatim
    base = set(versioned.read_manifest(root, 1)["files"])
    for f in m["files"]:
        b = int(f.split("ubucket=")[1].split("/")[0])
        if b not in rewritten:
            assert f in base
        else:
            assert f not in base
    # at sf0.001 only 1 of 1000 event ids corrects: strictly fewer
    # buckets rewritten than exist
    assert 0 < len(rewritten) < q._DELETE_NB


def test_upsert_changes_exactly_the_corrected_rows(ray_session,
                                                   tmp_path,
                                                   monkeypatch):
    import pyarrow.parquet as pq

    import log_analysis_ai_ray.pipelines.queries as q

    monkeypatch.setattr(q, "_EVSTORE_ROOT", str(tmp_path / "store"))
    after = _run("upsert_corrections")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "event_type", "value"])
    import numpy as np

    e = np.asarray(ev.column("event_id"), dtype=np.int64)
    v = np.asarray(ev.column("value"), dtype=np.float64)
    hit = (e % q._UPSERT_MOD) == q._UPSERT_RESIDUE
    assert hit.sum() >= 1
    cents = np.where(hit, np.round((v + q._UPSERT_ADD) * 100),
                     np.round(v * 100)).astype(np.int64)
    et = np.asarray(ev.column("event_type").to_pylist())
    want = {}
    for ty in np.unique(et):
        m = et == ty
        want[str(ty)] = (int(m.sum()), int(cents[m].sum()))
    got = {r["event_type"]: (r["n"], r["cents_sum"])
           for r in after.to_pylist()}
    assert got == want
