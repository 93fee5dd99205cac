"""Pair-stats pivot (A11) + HTML renderer (S4) + human_size (F2) parity."""

from __future__ import annotations

import pytest

from cloud_dedup_spark.html_report import human_size, render_html
from cloud_dedup_spark.operators.metadata import pair_stats_pivot

SCHEMA = (
    "service string, rel_path string, name string, name_orig string, "
    "size long, mtime double, is_symlink boolean, symlink_target string, "
    "content_md5 string"
)


def test_pair_stats_pivot(spark):
    rows = [
        ("a", "d/x.txt", "x.txt", "X", 10, 1.0, False, None, "m1"),
        ("b", "d/x.txt", "x.txt", "X", 10, 1.0, False, None, "m1"),  # identical
        ("a", "d/y.txt", "y.txt", "Y", 20, 1.0, False, None, "m2"),
        ("b", "d/y.txt", "y.txt", "Y", 20, 1.0, False, None, "m3"),  # different
        ("a", "d/z.txt", "z.txt", "Z", 30, 1.0, False, None, ""),
        ("b", "d/z.txt", "z.txt", "Z", 30, 1.0, False, None, "m4"),  # unverified
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = pair_stats_pivot(df).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["service_a"], r["service_b"]) == ("a", "b")
    assert r["identical"] == 1 and r["different"] == 1 and r["unverified"] == 1
    assert r["symlink"] == 0 and r["mixed_type"] == 0 and r["n_pairs"] == 3


def test_human_size_ladder():
    """Reference human_size ladder incl. the PB branch
    (tests/test_coverage_gaps.py pins the same cells)."""
    assert human_size(512) == "512 B"
    assert human_size(2048) == "2.0 KB"
    assert human_size(5 * 1024**2) == "5.0 MB"
    assert human_size(3 * 1024**3) == "3.0 GB"
    assert human_size(2 * 1024**4) == "2.0 TB"
    assert human_size(7 * 1024**5) == "7.0 PB"


def test_render_html_sections():
    report = {
        "total_files": 10,
        "n_clusters": 2,
        "per_repo_files": {"repo_a": 6, "repo_b": 4},
        "pairwise_duplicate_clusters": {"repo_a+repo_b": 2},
        "folder_relationship_histogram": {"identical": 1, "unique": 3},
        "cluster_size_histogram": {2: 2},
        "edge_kinds": {"exact": 1, "near": 1},
        "unique_files_per_repo": {"repo_a": 4},
        "safe_dedup_roots": ["vendor/libx"],
        "stages": {"stages": []},
    }
    page = render_html(report)
    for expected in ("<h2>1. Overview", "<h2>2. Pairwise", "<h2>3. Edges",
                     "<h2>4. Folder", "<h2>5. Safe dedup",
                     "vendor/libx", "60.0%", "<b>10</b>"):
        assert expected in page
    # escaping: no raw folder path should break out of tags
    report["safe_dedup_roots"] = ["<script>x</script>"]
    assert "<script>" not in render_html(report).split("Safe dedup")[1]
