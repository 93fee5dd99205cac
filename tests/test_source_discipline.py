"""Source-level discipline pins (round-3 verdict item 4).

The engine's rule (BASELINE.json input_hint): vectorized pandas/Arrow UDFs
only — no per-row Python anywhere in a dataflow path.  Plan-level tests pin
the hot paths; this grep-style pass pins the whole package so a row-at-a-time
construct cannot slip into a cold path unnoticed (the round-3 finding was a
pandas ``.apply(tuple, axis=1)`` inside the stateful operator — small, but
against the rule).
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "cloud_dedup_spark"


def _sources() -> dict[str, str]:
    return {str(p): p.read_text() for p in sorted(PKG.rglob("*.py"))}


def test_no_row_at_a_time_pandas_apply():
    """pandas .apply(..., axis=1) / .iterrows() / .itertuples() iterate rows in
    Python — every per-key computation must use vectorized column ops."""
    bad = re.compile(r"\.apply\s*\([^)]*axis\s*=\s*1|\.iterrows\s*\(|\.itertuples\s*\(")
    hits = [
        f"{path}: {m.group(0)}"
        for path, src in _sources().items()
        for m in bad.finditer(src)
    ]
    assert not hits, f"row-at-a-time pandas constructs found: {hits}"


def test_no_row_at_a_time_spark_udf():
    """Row-at-a-time Spark UDFs (F.udf / @udf) are banned — only built-in
    Column expressions and Arrow-batched pandas UDFs are allowed."""
    bad = re.compile(r"\bF\.udf\s*\(|^\s*@udf\b|functions\.udf\s*\(", re.M)
    hits = [
        f"{path}: {m.group(0).strip()}"
        for path, src in _sources().items()
        for m in bad.finditer(src)
    ]
    assert not hits, f"row-at-a-time Spark UDFs found: {hits}"


def test_no_rdd_map_in_dataflow():
    """RDD row maps (rdd.map/flatMap/collect) would leave the DataFrame/Arrow
    path; the only sanctioned .rdd use is getNumPartitions (a metadata probe)."""
    bad = re.compile(r"\.rdd\.(?!getNumPartitions)")
    hits = [
        f"{path}: {m.group(0)}"
        for path, src in _sources().items()
        for m in bad.finditer(src)
    ]
    assert not hits, f"RDD row-level operations found: {hits}"
