"""LSH candidate generation: recall of planted pairs + hot-bucket skew capping
(the graft of the reference's first-hit-per-key cap, src/cloud_duplicate_analyzer.py:323-325)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cloud_dedup_spark.config import DedupConfig
from cloud_dedup_spark.functions.normalize import with_identity
from cloud_dedup_spark.operators.candidates import explode_bands, lsh_candidate_pairs
from cloud_dedup_spark.operators.cluster import connected_components
from cloud_dedup_spark.operators.signatures import compute_signatures

CFG = DedupConfig()


@pytest.fixture(scope="module")
def sigs_and_ids(spark, corpus):
    files, truth = corpus
    ident = with_identity(files).cache()
    sigs = compute_signatures(ident, CFG).cache()
    idmap = {
        (r["repo"], r["path"]): r["file_id"]
        for r in ident.select("repo", "path", "file_id").collect()
    }
    return sigs, idmap, truth


def test_near_pairs_become_candidates(sigs_and_ids):
    sigs, idmap, truth = sigs_and_ids
    pairs = {
        (r["src"], r["dst"])
        for r in lsh_candidate_pairs(sigs, CFG).collect()
    }
    for group in truth.near_groups:
        a, b = sorted(idmap[k] for k in group[:2])
        assert (a, b) in pairs, f"near pair {group} missed by LSH"


def test_pairs_are_canonical_and_distinct(sigs_and_ids):
    sigs, _, _ = sigs_and_ids
    pairs = lsh_candidate_pairs(sigs, CFG)
    assert pairs.filter(F.col("src") >= F.col("dst")).count() == 0
    assert pairs.count() == pairs.distinct().count()


def test_hot_bucket_edges_stay_linear(spark):
    """A bucket of n identical-signature files must produce O(n) edges (salted
    chains), not O(n²) — while staying fully connected for clustering."""
    n = 400  # >> band_bucket_cap (64)
    body = "def hot(): return " + " + ".join(f"tok_{i}" for i in range(200))
    rows = [("r", f"p/{i}.py", f"c{i}", "py", body + f"\n# tail_{i} " + f"x_{i} = {i}")
            for i in range(n)]
    # NB: contents differ slightly so the exact channel can't collapse them,
    # but all 32 bands collide for most pairs → maximal LSH pressure
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")
    cfg = DedupConfig(band_bucket_cap=16)
    sigs = compute_signatures(with_identity(df), cfg).cache()
    bands = explode_bands(sigs)
    max_bucket = (
        bands.groupBy("band_key").count().agg(F.max("count")).first()[0]
    )
    assert max_bucket > cfg.band_bucket_cap  # the plant really is hot
    pairs = lsh_candidate_pairs(sigs, cfg).cache()
    n_pairs = pairs.count()
    # all-pairs would be ~ nb * n²/2 ≈ 2.5M; salted chaining stays linear-ish
    assert n_pairs < 20 * n
    # connectivity preserved: every file reachable from the first
    labels = connected_components(pairs.select("src", "dst"))
    assert labels.select("cluster_id").distinct().count() == 1
