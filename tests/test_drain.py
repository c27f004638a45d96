"""Drain miner unit tests — behavior pinned to the reference semantics
(similarity merge, tree descent, max_children fallback, numeric
pre-wildcard; /root/reference/src/drain_parser.cpp:278-494) and to the
closed-form expected templates of the synthetic corpus."""

import pyarrow.compute as pc

from log_analysis_ai_ray import synth
from log_analysis_ai_ray.stages import drain, explode, masking
from log_analysis_ai_ray.stages.drain import DrainConfig, DrainMiner


def test_similar_lines_merge():
    m = DrainMiner()
    m.add("INFO User alice logged in")
    m.add("INFO User bob logged in")
    assert len(m.clusters) == 1
    assert m.clusters[0].template == "INFO User <*> logged in"


def test_dissimilar_same_length_split():
    m = DrainMiner()
    # same token count, same first two tokens, similarity < 0.5
    m.add("INFO User alice spoke loudly")
    m.add("INFO User mumble grumble jumble")
    assert len(m.clusters) == 2


def test_different_token_count_never_merge():
    m = DrainMiner()
    m.add("a b c")
    m.add("a b c d")
    assert len(m.clusters) == 2


def test_numeric_token_tree_wildcard():
    # tokens with digits share the wildcard tree branch (reference
    # drain_parser.cpp:312) — both land in one leaf and merge
    m = DrainMiner()
    m.add("code5 is fine today ok")
    m.add("code7 is fine today ok")
    assert len(m.clusters) == 1
    assert m.clusters[0].template == "<*> is fine today ok"


def test_max_children_wildcard_fallback():
    cfg = DrainConfig(max_children=3)
    m = DrainMiner(cfg)
    for i in range(6):
        m.add(f"tok{chr(97 + i)}x y z w")  # distinct non-numeric first tokens
    # first 3 get their own branch; the rest share the <*> branch
    n_root_children = len(m.root[4])  # 4 tokens per line
    assert n_root_children <= 4  # 3 named + 1 wildcard


def test_wildcard_counts_as_match():
    # same leaf (token2 is wildcardish in both); cluster wildcards count
    # as matching positions in the similarity, so these merge
    m = DrainMiner()
    m.add("GET <*> <*> <*>ms")
    m.add("GET <*> ok <*>ms")
    assert len(m.clusters) == 1
    assert m.clusters[0].template == "GET <*> <*> <*>ms"


def test_mine_mapping_covers_all_inputs():
    distinct = ["INFO a b", "INFO a c", "WARN x y"]
    mapping = drain.mine_mapping(distinct)
    assert sorted(mapping["masked"].to_pylist()) == sorted(distinct)
    # members get the FINAL template, even ones added before a merge
    got = dict(zip(mapping["masked"].to_pylist(),
                   mapping["template"].to_pylist()))
    assert got["INFO a b"] == "INFO a <*>"
    assert got["INFO a c"] == "INFO a <*>"


def test_converges_to_closed_form_templates():
    pages = synth.generate_shard(0, 0, 2000)
    lines = masking.add_masked(explode.explode_lines(pages))
    distinct = pc.unique(lines["masked"].combine_chunks()).to_pylist()
    mapping = drain.mine_mapping(distinct)
    mined = sorted(set(mapping["template"].to_pylist()))
    expected = sorted({t.expected_template for t in synth.TEMPLATES})
    assert mined == expected


def test_mining_order_invariance():
    pages = synth.generate_shard(0, 0, 1000)
    lines = masking.add_masked(explode.explode_lines(pages))
    distinct = pc.unique(lines["masked"].combine_chunks()).to_pylist()
    a = drain.mine_mapping(distinct)
    b = drain.mine_mapping(list(reversed(distinct)))
    ma = dict(zip(a["masked"].to_pylist(), a["template"].to_pylist()))
    mb = dict(zip(b["masked"].to_pylist(), b["template"].to_pylist()))
    assert ma == mb  # mine_mapping sorts internally → order-free


def test_tail_fallback():
    """Masked values outside the mined mapping are matched against the
    registry templates by the assigner's Drain matcher (scale path)."""
    mapping = drain.mine_mapping([
        "INFO User alice logged in", "INFO User bob logged in"])
    assigner = drain.TemplateAssigner(mapping)
    tmpl, h, wpos = assigner._lookup_tail("INFO User carol logged in")
    assert tmpl == "INFO User <*> logged in"
    assert wpos == [2]


def test_online_miner_registry(ray_session):
    """The online per-actor miner (reference path-B semantics) covers
    all lines; its registry merged by template string reconciles
    per-actor divergence — and illustrates why the deterministic
    distinct-driven path is the default (it may emit splinter
    templates mined before a later merge)."""
    import ray.data

    from log_analysis_ai_ray import synth
    from log_analysis_ai_ray.pipelines.flagship import pages_to_lines
    from log_analysis_ai_ray.stages.drain import online_registry

    pages = synth.generate_shard(0, 0, 500)
    lines = ray.data.from_arrow(pages).repartition(4).map_batches(
        pages_to_lines, batch_format="pyarrow")
    reg = online_registry(lines, concurrency=2)
    total = sum(reg["cnt"].to_pylist())
    expect_lines = pages_to_lines(pages).num_rows
    assert total == expect_lines
    mined = set(reg["template"].to_pylist())
    expected = {t.expected_template for t in synth.TEMPLATES}
    # converged templates must appear; splinters (supersets) allowed
    assert len(expected & mined) >= 20


def test_descend_convention_paper_vs_reference():
    """ADVICE r1: the engine's default tree walks depth-2 prefix tokens
    (paper convention); descend='reference' walks min(depth, len) like
    drain_parser.cpp:308-312 and can keep clusters separate that the
    paper tree merges on similarity."""
    a = "alpha beta gamma delta x"
    b = "alpha beta omega delta x"
    paper = drain.mine_mapping([a, b], drain.DrainConfig(descend="paper"))
    ref = drain.mine_mapping([a, b], drain.DrainConfig(descend="reference"))
    # paper: same leaf (2 shared prefix tokens), sim 4/5 ≥ 0.5 → merged
    assert set(paper["template"].to_pylist()) == {"alpha beta <*> delta x"}
    # reference: token 3 splits the tree at level 3 → never compared
    assert set(ref["template"].to_pylist()) == {a, b}
