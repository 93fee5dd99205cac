"""Cross-system recall: run the actual reference tool (black-box subprocess)
on a materialized copy of the corpus and require our cluster assignments to
cover ≥ 0.99 of ITS duplicate pairs — the literal BASELINE.json metric
("dup-pair recall >= 0.99 vs reference cluster assignments").

The reference blocks on (lowercased name, size) and confirms with MD5
(src/cloud_duplicate_analyzer.py:310-327, :257-265), so every pair it reports
is byte-identical content — a strict subset of what the content-keyed exact
channel finds.  The reference binary is executed, never imported or copied.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

from cloud_dedup_spark import run_pipeline
from cloud_dedup_spark.corpus import REPOS, generate_corpus

REFERENCE = "/root/reference/src/cloud_duplicate_analyzer.py"
N_FILES = 300


@pytest.fixture(scope="module")
def materialized(tmp_path_factory):
    """Write the corpus to real per-repo directories for the reference CLI."""
    root = tmp_path_factory.mktemp("ref_corpus")
    rows, truth = generate_corpus(N_FILES, seed=42)
    for r in rows:
        p = root / r["repo"] / r["path"]
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(r["content"], encoding="utf-8")
    return root, rows, truth


@pytest.fixture(scope="module")
def reference_pairs(materialized, tmp_path_factory):
    root, rows, _ = materialized
    out = tmp_path_factory.mktemp("ref_out") / "report.html"
    args = [sys.executable, REFERENCE] + [
        f"{repo}:{root / repo}" for repo in REPOS
    ] + ["-o", str(out)]
    res = subprocess.run(args, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    report = json.loads(out.with_suffix(".json").read_text())
    pairs: set[frozenset] = set()
    for group in report["duplicate_groups"]:
        if group["content_match"] != "identical":
            continue
        members = [
            (label, rec["rel_path"].replace("\\", "/"))
            for label, rec in group["matches"].items()
        ]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add(frozenset((members[i], members[j])))
    return pairs


def test_reference_finds_duplicates(reference_pairs):
    # sanity: the planted corpus must actually exercise the reference
    assert len(reference_pairs) >= 5


def test_recall_vs_reference_clusters(spark, materialized, reference_pairs):
    _, rows, _ = materialized
    files = spark.createDataFrame(rows)
    res = run_pipeline(spark, files)
    ours: dict = {}
    for r in res["assignments"].collect():
        ours.setdefault(r["cluster_id"], set()).add((r["repo"], r["path"]))
    our_pairs: set[frozenset] = set()
    for members in ours.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                our_pairs.add(frozenset((ms[i], ms[j])))
    covered = len(reference_pairs & our_pairs)
    recall = covered / len(reference_pairs)
    assert recall >= 0.99, (
        f"recall {recall:.4f}: missed {reference_pairs - our_pairs}"
    )
