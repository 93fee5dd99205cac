"""End-to-end pipeline: recall vs plant plan, invariant, resumability.

Analog of the reference's ``TestAnalyzeIntegration`` + scenario suite
(tests/test_cloud_duplicate_analyzer.py:171-243, tests/test_unique_folder_visibility.py)
and of BASELINE.json's acceptance gates: dup-pair recall ≥ 0.99, per-row
content_sha256 invariant, checkpoint resumability.
"""

from __future__ import annotations

import shutil

import pytest

from cloud_dedup_spark import run_pipeline
from cloud_dedup_spark.plans.pipeline import invariant_violations
from tests.conftest import cluster_pairs


@pytest.fixture(scope="module")
def result(spark, corpus):
    files, truth = corpus
    res = run_pipeline(spark, files)
    res["assignments"] = res["assignments"].cache()
    res["assignments"].count()
    return res, truth


def _got_clusters(assignments):
    got = {}
    for r in assignments.collect():
        got.setdefault(r["cluster_id"], set()).add((r["repo"], r["path"]))
    return [m for m in got.values() if len(m) >= 2]


def test_recall_at_least_099(result):
    res, truth = result
    got = cluster_pairs(_got_clusters(res["assignments"]))
    expected = truth.expected_positive_pairs()
    recall = len(got & expected) / len(expected)
    assert recall >= 0.99, f"recall {recall:.4f}"


def test_no_false_positive_pairs(result):
    res, truth = result
    got = cluster_pairs(_got_clusters(res["assignments"]))
    expected = truth.expected_positive_pairs()
    assert got - expected == set()


def test_negatives_not_clustered(result):
    """Borderline rewrites and phantom analogs (same path+length, different
    content — the reference's 'most dangerous case', :223-224) stay apart."""
    res, truth = result
    got = cluster_pairs(_got_clusters(res["assignments"]))
    for a, b in truth.negative_pairs:
        assert frozenset((a, b)) not in got


def test_sha256_invariant_holds(result, corpus):
    files, _ = corpus
    res, _ = result
    assert invariant_violations(res["identity"], files).count() == 0


def test_every_file_assigned_exactly_once(result, corpus):
    files, _ = corpus
    res, _ = result
    asg = res["assignments"]
    assert asg.count() == files.count()
    assert asg.select("file_id").distinct().count() == files.count()


def test_no_quarantined_files_in_clean_corpus(result):
    """The id-collision quarantine (128-bit composite check) must be a no-op
    on a collision-free corpus: flag column present, zero rows flagged."""
    res, _ = result
    asg = res["assignments"]
    assert "quarantined" in asg.columns
    assert asg.filter("quarantined").count() == 0


def test_report_summary_fields(result, corpus):
    """build_report over a real pipeline result: totals line up, the
    drill-down detail is populated on the planted corpus, and the quarantine
    counter is zero on a collision-free corpus (ROADMAP observability item)."""
    from cloud_dedup_spark.report import build_report

    files, _ = corpus
    res, _ = result
    rep = build_report(res)
    assert rep["total_files"] == files.count()
    assert rep["n_quarantined_id_collisions"] == 0
    assert rep["n_clusters"] >= 1
    assert len(rep["duplicate_group_details"]) >= 1
    first = rep["duplicate_group_details"][0]
    assert first["n_files"] >= 2 and len(first["members"]) == first["n_files"]
    assert rep["folder_comparisons"] and rep["folder_files"]


def test_metrics_lineage_recorded(result):
    res, _ = result
    stages = [s.name for s in res["metrics"].stages]
    for expected in ("identity", "exact", "signatures", "candidate_edges",
                     "substring_edges", "cluster_labels"):
        assert expected in stages


def test_checkpoint_resumability(spark, corpus, tmp_path_factory):
    """Kill-and-rerun: a second run over an existing checkpoint dir reuses
    every stage table and reproduces identical cluster labels (north_rule:
    'any stage is resumable')."""
    files, _ = corpus
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    res1 = run_pipeline(spark, files, checkpoint_dir=ckpt)
    labels1 = {(r["repo"], r["path"]): r["cluster_id"]
               for r in res1["assignments"].collect()}
    # simulate a failure after the signature stage: later stage tables lost
    shutil.rmtree(f"{ckpt}/candidate_edges", ignore_errors=True)
    shutil.rmtree(f"{ckpt}/cluster_labels", ignore_errors=True)
    res2 = run_pipeline(spark, files, checkpoint_dir=ckpt)
    labels2 = {(r["repo"], r["path"]): r["cluster_id"]
               for r in res2["assignments"].collect()}
    assert labels1 == labels2
    # and a fully-warm third run must also agree
    res3 = run_pipeline(spark, files, checkpoint_dir=ckpt)
    labels3 = {(r["repo"], r["path"]): r["cluster_id"]
               for r in res3["assignments"].collect()}
    assert labels1 == labels3


def test_checkpoint_refuses_config_mix(spark, corpus, tmp_path_factory):
    """Round-4 review: stage skip is keyed by name alone, so resuming with a
    DIFFERENT DedupConfig would silently apply new thresholds to old
    signatures.  The store's config marker makes that a hard error."""
    from cloud_dedup_spark.config import DedupConfig

    files, _ = corpus
    ckpt = str(tmp_path_factory.mktemp("ckpt_cfg"))
    run_pipeline(spark, files, checkpoint_dir=ckpt)
    with pytest.raises(ValueError, match="different DedupConfig"):
        run_pipeline(
            spark, files, cfg=DedupConfig(jaccard_threshold=0.9),
            checkpoint_dir=ckpt,
        )
