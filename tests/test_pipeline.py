"""End-to-end KG build: P/R == 1.0 vs the oracle, idempotent re-run,
checkpoint resume, FK integrity, lineage metrics."""

from __future__ import annotations

import math

import pytest

from ckg_spark.corpus.pages import config_from_vocab
from ckg_spark.corpus.vocab import VocabConfig, generate_vocab
from ckg_spark.oracle import precision_recall, run_oracle
from ckg_spark.pipeline import KGPipeline


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    wh_root = str(tmp_path_factory.mktemp("warehouse"))
    vocab_cfg = VocabConfig(seed=7, terms_per_type=30)
    vocab = generate_vocab(vocab_cfg)
    pages_cfg = config_from_vocab(vocab, n_docs=200, seed=42, partitions=8)
    pipe = KGPipeline(spark, wh_root, vocab_cfg=vocab_cfg, pages_cfg=pages_cfg)
    stats = pipe.run()
    oracle = run_oracle(vocab, pages_cfg)
    return pipe, stats, oracle


def test_triples_match_oracle_exactly(spark, built):
    pipe, stats, oracle = built
    edges = pipe.wh.table("edges").read(spark)
    got = {(r["subj"], r["pred"], r["obj"]): r["score"] for r in edges.collect()}
    p, r = precision_recall(set(got), oracle.triples)
    assert (p, r) == (1.0, 1.0), (
        f"P={p:.4f} R={r:.4f}; "
        f"spurious={sorted(set(got) - oracle.triples)[:5]} "
        f"missing={sorted(oracle.triples - set(got))[:5]}"
    )
    # scores are deterministic and match the oracle bit-for-bit
    for key, score in got.items():
        assert math.isclose(score, oracle.scores[key], abs_tol=1e-9), (key, score, oracle.scores[key])


def test_nodes_match_oracle(spark, built):
    pipe, stats, oracle = built
    nodes = pipe.wh.table("nodes").read(spark).filter("label <> 'Publication'")
    got = {r["id"]: (r["label"], r["name"], list(r["synonyms"])) for r in nodes.collect()}
    exp = {
        nid: (n["label"], n["name"], n["synonyms"]) for nid, n in oracle.nodes.items()
    }
    assert got == exp


def test_fk_integrity_no_orphans(spark, built):
    pipe, stats, _ = built
    assert stats["orphan_edges"] == 0
    edges = pipe.wh.table("edges").read(spark)
    node_ids = pipe.wh.table("nodes").read(spark).select("id")
    dangling_subj = edges.join(node_ids.withColumnRenamed("id", "subj"), "subj", "left_anti")
    dangling_obj = edges.join(node_ids.withColumnRenamed("id", "obj"), "obj", "left_anti")
    assert dangling_subj.count() == 0 and dangling_obj.count() == 0


def test_rerun_is_idempotent_and_resumes(spark, built):
    pipe, _, oracle = built
    n_before = pipe.wh.table("edges").read(spark).count()
    snap_before = pipe.wh.table("edges").current_snapshot()
    stats2 = pipe.run()
    # all stages skipped via checkpoint fingerprints
    assert set(stats2["skipped"]) >= {"pages", "tag", "canon", "link"}
    assert pipe.wh.table("edges").read(spark).count() == n_before
    assert pipe.wh.table("edges").current_snapshot() == snap_before


def test_merge_into_existing_graph_is_noop(spark, built):
    """Force a re-materialize: MERGE keyed on (subj,pred,obj) inserts nothing."""
    pipe, _, _ = built
    edges_t = pipe.wh.table("edges")
    triples = pipe.wh.table("triples").read(spark)
    snap = edges_t.merge_insert_absent(spark, triples, ["subj", "pred", "obj"], partition_by=["pred"])
    last = edges_t.snapshots()[-1]
    assert last.rows_written == 0
    assert edges_t.read(spark).count() == triples.select("subj", "pred", "obj").distinct().count()


def test_lineage_metrics_recorded(built):
    pipe, _, _ = built
    stages = {m["stage"] for m in pipe.wh.metrics()}
    assert {"pages", "tag", "canon", "link", "materialize"} <= stages
    # per-file row counts present in snapshot manifests
    snaps = pipe.wh.table("triples").snapshots()
    assert snaps and all(f["rows"] is not None for f in snaps[-1].files)


def test_time_travel(spark, built):
    pipe, _, _ = built
    t = pipe.wh.table("edges")
    first = t.snapshots()[0].id
    df_then = t.read(spark, first)
    df_now = t.read(spark)
    assert df_then.count() <= df_now.count()


def test_materialized_text_path_identical(spark, built, tmp_path):
    """materialize_text=True (staged extract) emits exactly the same edges
    as the fused default, plus a pages_text snapshot and extract lineage."""
    pipe, _, _ = built
    wh2 = str(tmp_path / "wh_mat")
    pipe2 = KGPipeline(
        spark,
        wh2,
        vocab_cfg=VocabConfig(seed=7, terms_per_type=30),
        pages_cfg=pipe.pages_cfg,
        materialize_text=True,
    )
    pipe2.run()
    fused = {
        tuple(r) for r in pipe.wh.table("edges").read(spark)
        .select("subj", "pred", "obj").collect()
    }
    staged = {
        tuple(r) for r in pipe2.wh.table("edges").read(spark)
        .select("subj", "pred", "obj").collect()
    }
    assert fused == staged
    assert pipe2.wh.table("pages_text").exists()
    assert "extract" in {m["stage"] for m in pipe2.wh.metrics()}


def test_crash_mid_pipeline_resumes_from_last_snapshot(spark, tmp_path, monkeypatch):
    """Kill the job after the tag stage commits (canon raises); the restart
    must skip pages+tag (their snapshots are committed) and produce the
    same graph as an uninterrupted run."""
    import ckg_spark.pipeline as pl

    vocab_cfg = VocabConfig(seed=7, terms_per_type=20)
    vocab = generate_vocab(vocab_cfg)
    pages_cfg = config_from_vocab(vocab, n_docs=120, seed=42, partitions=4)

    wh_crash = str(tmp_path / "wh_crash")
    boom = RuntimeError("simulated executor loss")

    def exploding_canon(*a, **kw):
        raise boom

    monkeypatch.setattr(pl, "build_canonical_map", exploding_canon)
    pipe = pl.KGPipeline(spark, wh_crash, vocab_cfg=vocab_cfg, pages_cfg=pages_cfg)
    with pytest.raises(RuntimeError, match="simulated"):
        pipe.run()
    monkeypatch.undo()

    # tag snapshot committed before the crash; canon/link/materialize absent
    from ckg_spark.lakehouse import Warehouse

    wh = Warehouse(wh_crash)
    assert wh.table("mentions").exists()
    assert not wh.table("edges").exists()

    # restart: pages + tag skip, the rest runs
    pipe2 = pl.KGPipeline(spark, wh_crash, vocab_cfg=vocab_cfg, pages_cfg=pages_cfg)
    stats = pipe2.run()
    assert {"pages", "tag"} <= set(stats["skipped"])
    assert "canon" not in stats["skipped"]

    # identical output to an uninterrupted build
    wh_clean = str(tmp_path / "wh_clean")
    pl.KGPipeline(spark, wh_clean, vocab_cfg=vocab_cfg, pages_cfg=pages_cfg).run()
    got = sorted(
        tuple(r) for r in wh.table("edges").read(spark).select("subj", "pred", "obj").collect()
    )
    exp = sorted(
        tuple(r)
        for r in Warehouse(wh_clean).table("edges").read(spark).select("subj", "pred", "obj").collect()
    )
    assert got == exp


def test_comention_min_score_threshold(spark, built, tmp_path):
    """comention_min_score=2 keeps exactly the ASSOCIATED_WITH pairs with
    score >= 2 (the reference's association cutoff semantics) and leaves
    the other edge families untouched."""
    pipe, _, _ = built
    wh3 = str(tmp_path / "wh_thresh")
    pipe3 = KGPipeline(
        spark,
        wh3,
        vocab_cfg=VocabConfig(seed=7, terms_per_type=30),
        pages_cfg=pipe.pages_cfg,
        comention_min_score=2.0,
    )
    pipe3.run()
    base = pipe.wh.table("edges").read(spark)
    got = pipe3.wh.table("edges").read(spark)
    base_assoc = {
        (r["subj"], r["obj"]): r["score"]
        for r in base.filter("pred = 'ASSOCIATED_WITH'").collect()
    }
    got_assoc = {
        (r["subj"], r["obj"]): r["score"]
        for r in got.filter("pred = 'ASSOCIATED_WITH'").collect()
    }
    assert got_assoc == {k: v for k, v in base_assoc.items() if v >= 2.0}
    assert len(got_assoc) < len(base_assoc)
    for pred in ("MENTIONED_IN_PUBLICATION", "HAS_PARENT"):
        assert (
            got.filter(f"pred = '{pred}'").count()
            == base.filter(f"pred = '{pred}'").count()
        )
