"""Self-contained HTML summary — the reference's HTML sink analog (S4).

The reference renders a five-section HTML report from its result dict
(``render_html``, src/cloud_duplicate_analyzer.py:823-1386).  The graft keeps
the same discipline: rendering is DRIVER-side presentation over the small
collected report dict (report.py) — never a Spark operator, never shipped to
executors (SURVEY.md §2.1 S4: "keep out of executors").

Sections mirror the reference's: 1 overview totals, 2 pairwise stats,
3 edge-kind/conflict summary, 4 folder relationships, 5 safe dedup roots.
"""

from __future__ import annotations

import html


def human_size(n: float) -> str:
    """B/KB/MB/GB/TB/PB ladder — reference ``human_size`` (:92-97) parity."""
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(n) < 1024.0:
            return f"{n:.1f} {unit}" if unit != "B" else f"{int(n)} B"
        n /= 1024.0
    return f"{n:.1f} PB"


def _table(headers: list[str], rows: list[list]) -> str:
    head = "".join(f"<th>{html.escape(str(h))}</th>" for h in headers)
    body = "".join(
        "<tr>" + "".join(f"<td>{html.escape(str(c))}</td>" for c in r) + "</tr>"
        for r in rows
    )
    return f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"


def render_html(report: dict) -> str:
    """Render the collected report dict (report.build_report) to one page."""
    total = report["total_files"]
    per_repo_rows = [
        [repo, n, f"{100.0 * n / total:.1f}%"]  # A10: per-repo percentage
        for repo, n in sorted(report["per_repo_files"].items())
    ]
    pairwise_rows = [[k, v] for k, v in sorted(
        report["pairwise_duplicate_clusters"].items())]
    hist_rows = [[k, v] for k, v in sorted(
        report["folder_relationship_histogram"].items())]
    cluster_rows = [[size, n] for size, n in sorted(
        report["cluster_size_histogram"].items(), key=lambda kv: int(kv[0]))]
    edge_rows = [[k, v] for k, v in sorted(report["edge_kinds"].items())]
    unique_rows = [[k, v] for k, v in sorted(
        report["unique_files_per_repo"].items())]
    roots = report["safe_dedup_roots"]

    sections = [
        "<h2>1. Overview</h2>"
        + f"<p>Total files: <b>{total}</b> · clusters (≥2 members): "
        + f"<b>{report['n_clusters']}</b></p>"
        + _table(["repo", "files", "share"], per_repo_rows),
        "<h2>2. Pairwise duplicate clusters</h2>"
        + _table(["repo pair", "clusters"], pairwise_rows),
        "<h2>3. Edges and uniques</h2>"
        + _table(["edge kind", "count"], edge_rows)
        + _table(["repo", "unique files"], unique_rows)
        + _table(["cluster size", "count"], cluster_rows),
        "<h2>4. Folder relationships</h2>"
        + _table(["relationship", "folders"], hist_rows),
        "<h2>5. Safe dedup roots</h2>"
        + (
            "<ul>" + "".join(f"<li><code>{html.escape(r)}</code></li>"
                             for r in roots) + "</ul>"
            if roots else "<p>none</p>"
        ),
    ]
    style = (
        "body{font-family:sans-serif;margin:2em;max-width:60em}"
        "table{border-collapse:collapse;margin:1em 0}"
        "td,th{border:1px solid #999;padding:.25em .6em;text-align:left}"
        "h2{margin-top:1.4em}"
    )
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>cloud-dedup-spark report</title><style>{style}</style></head>"
        "<body><h1>cloud-dedup-spark report</h1>"
        + "".join(sections)
        + "</body></html>"
    )


def write_html_report(report: dict, path: str) -> str:
    out = render_html(report)
    with open(path, "w") as f:
        f.write(out)
    return out
