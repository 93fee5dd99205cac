"""Scan-warnings side channel — reference parity for the warnings list the
reference collects during scan_directory (src/cloud_duplicate_analyzer.py:
131-143, :188-191) and surfaces as an HTML banner (:859-872) and stdout block
(:1490-1496).

The Spark engine's ingest analogs: an empty source, a repo expected by the
run but absent from the table, and rows with NULL content (unreadable blobs
upstream).  Warnings ride the report dict; render_html shows the banner.
"""

from __future__ import annotations

from cloud_dedup_spark.html_report import render_html
from cloud_dedup_spark.sources.files_source import scan_warnings

SCHEMA = "repo string, path string, commit string, lang string, content string"


def test_empty_source_warns(spark):
    df = spark.createDataFrame([], SCHEMA)
    ws = scan_warnings(df)
    assert any("0 files" in w for w in ws)


def test_missing_expected_repo_warns(spark):
    df = spark.createDataFrame(
        [("repo_a", "x.py", "c", "py", "body")], SCHEMA
    )
    ws = scan_warnings(df, expected_repos=["repo_a", "repo_b"])
    assert any("repo_b" in w for w in ws)
    assert not any("repo_a" in w for w in ws)


def test_null_content_warns(spark):
    df = spark.createDataFrame(
        [("r", "x.py", "c", "py", "body"), ("r", "y.py", "c", "py", None)],
        SCHEMA,
    )
    ws = scan_warnings(df)
    assert any("NULL content" in w for w in ws)


def test_clean_source_no_warnings(spark):
    df = spark.createDataFrame(
        [("repo_a", "x.py", "c", "py", "body")], SCHEMA
    )
    assert scan_warnings(df, expected_repos=["repo_a"]) == []


def test_html_warning_banner():
    report = {
        "total_files": 1,
        "n_clusters": 0,
        "per_repo_files": {"a": 1},
        "pairwise_duplicate_clusters": {},
        "folder_relationship_histogram": {},
        "cluster_size_histogram": {},
        "edge_kinds": {},
        "unique_files_per_repo": {},
        "safe_dedup_roots": [],
        "scan_warnings": ["repo_b: 0 files found — source may be empty"],
        "stages": {"stages": []},
    }
    page = render_html(report)
    assert "Scan warnings" in page and "repo_b" in page
    # banner absent when the list is empty
    report["scan_warnings"] = []
    assert "Scan warnings" not in render_html(report)
