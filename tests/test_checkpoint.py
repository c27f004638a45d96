import json
import os

from log_analysis_ai_ray.pipelines import flagship
from log_analysis_ai_ray.state import checkpoint as ckpt


def test_plan_groups():
    groups = ckpt.plan_groups([f"f{i}" for i in range(10)], 4)
    assert [len(g) for g in groups] == [4, 4, 2]


def test_checkpointed_run_and_resume(ray_session, pages_small, tmp_path):
    out = str(tmp_path / "ck")
    res1 = flagship.run_checkpointed(pages_small, out, files_per_group=2)
    assert res1["groups_skipped"] == []
    assert len(res1["groups_ran"]) == 2  # 4 files / 2 per group
    total1 = res1["total_rows"]
    assert total1 > 0

    # resume: everything done → all skipped, totals unchanged
    res2 = flagship.run_checkpointed(pages_small, out, files_per_group=2)
    assert res2["groups_ran"] == []
    assert res2["groups_skipped"] == [0, 1]
    assert res2["total_rows"] == total1

    # drop one marker → only that group reruns; totals unchanged
    os.remove(os.path.join(out, "_done", "group-00001.json"))
    res3 = flagship.run_checkpointed(pages_small, out, files_per_group=2)
    assert res3["groups_ran"] == [1]
    assert res3["groups_skipped"] == [0]
    assert res3["total_rows"] == total1

    # manifest entries carry lineage: input files + row counts
    with open(os.path.join(out, "_done", "group-00000.json")) as f:
        m = json.load(f)
    assert len(m["input_files"]) == 2
    assert m["rows_out"] > 0
