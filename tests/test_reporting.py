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
                     "<h2>4. Duplicate groups", "<h2>5. Folder",
                     "<h2>6. Safe dedup",
                     "vendor/libx", "60.0%", "<b>10</b>"):
        assert expected in page
    # escaping: no raw folder path should break out of tags
    report["safe_dedup_roots"] = ["<script>x</script>"]
    assert "<script>" not in render_html(report).split("Safe dedup")[1]


def _detail_report():
    return {
        "total_files": 6,
        "n_clusters": 1,
        "per_repo_files": {"a": 3, "b": 3},
        "pairwise_duplicate_clusters": {"a+b": 1},
        "folder_relationship_histogram": {"identical": 1},
        "cluster_size_histogram": {3: 1},
        "edge_kinds": {"exact": 1, "near": 1},
        "unique_files_per_repo": {"a": 1},
        "safe_dedup_roots": [],
        "duplicate_group_details": [
            {
                "cluster_id": 7,
                "n_files": 3,
                "n_repos": 2,
                "members": [
                    {"repo": "a", "path": "src/x.py", "kind": "exact"},
                    {"repo": "b", "path": "src/x.py", "kind": "exact"},
                    {"repo": "b", "path": "lib/x2.py", "kind": "near"},
                ],
            }
        ],
        "folder_comparisons": [
            {"folder": "src", "relationship": "identical", "n_repos": 2},
            {"folder": "src/deep", "relationship": "subset", "n_repos": 2},
            {"folder": "lib", "relationship": "unique", "n_repos": 1},
        ],
        "folder_files": {
            "src": [
                {"name": "x.py", "n_repos": 2, "kind": "exact"},
                {"name": "y.py", "n_repos": 2, "kind": None},
                {"name": "z.py", "n_repos": 1, "kind": None},
            ],
            "src/deep": [{"name": "d.py", "n_repos": 2, "kind": "substring"}],
        },
        "stages": {"stages": []},
    }


def test_group_detail_rows_and_symbols():
    """Reference sections-4/5 drill-down parity (:900-1040): every member of
    a detailed group renders with its classification symbol."""
    page = render_html(_detail_report())
    sec = page.split("<h2>4. Duplicate groups")[1].split("<h2>5.")[0]
    assert "cluster 7" in sec
    assert "a:src/x.py" in sec and "b:lib/x2.py" in sec
    assert "★" in sec and "✓" in sec  # exact + near symbols
    assert "legend" in sec  # symbol legend rendered


def test_folder_tree_nesting_and_file_symbols():
    """Reference nested-tree parity (:1041-1124): child folders render inside
    the parent's <details>, files carry symbols incl. ⚠ (shared name, no dup
    edge) and ◆ (unique)."""
    page = render_html(_detail_report())
    sec = page.split("<h3>Folder tree</h3>")[1]
    # 'src/deep' nests inside 'src': deep's summary appears before src's
    # closing </details> and after src's summary
    src_pos = sec.find("<b>src</b>")
    deep_pos = sec.find("<b>deep</b>")
    assert 0 <= src_pos < deep_pos
    src_block = sec[src_pos:]
    assert src_block.index("<b>deep</b>") < src_block.index("</details></div>")
    # symbols: exact ★, substring ↪, shared-name conflict ⚠, unique ◆
    for sym in ("★", "↪", "⚠", "◆"):
        assert sym in sec, f"missing {sym}"
    # relationship label + file-count badge on the summary line
    assert "identical" in sec and "class='badge'" in sec


def test_file_sym_ladder():
    from cloud_dedup_spark.html_report import file_sym

    assert file_sym("exact")[0] == "★"
    assert file_sym("near")[0] == "✓"
    assert file_sym("substring")[0] == "↪"
    assert file_sym(None, n_repos=2)[0] == "⚠"
    assert file_sym(None, n_repos=1)[0] == "◆"
