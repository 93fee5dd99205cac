"""Corpus generator: determinism + invariant column + plant-plan sanity."""

from __future__ import annotations

import hashlib

from cloud_dedup_spark.corpus import generate_corpus


def test_deterministic_across_calls():
    rows_a, truth_a = generate_corpus(300, seed=42)
    rows_b, truth_b = generate_corpus(300, seed=42)
    assert rows_a == rows_b
    assert truth_a.exact_groups == truth_b.exact_groups
    assert truth_a.near_groups == truth_b.near_groups


def test_seed_changes_content():
    rows_a, _ = generate_corpus(100, seed=1)
    rows_b, _ = generate_corpus(100, seed=2)
    assert rows_a != rows_b


def test_sha_invariant_column():
    rows, _ = generate_corpus(100, seed=42)
    for r in rows:
        assert r["content_sha256"] == hashlib.sha256(
            r["content"].encode()).hexdigest()


def test_plant_plan_shapes():
    rows, truth = generate_corpus(400, seed=42)
    assert len(rows) == 400
    keys = {(r["repo"], r["path"]) for r in rows}
    assert len(keys) == 400  # (repo, path) unique
    # every truth key exists in the corpus
    for g in truth.exact_groups + truth.near_groups:
        assert all(k in keys for k in g) and len(g) >= 2
    for a, b in truth.substring_pairs + truth.negative_pairs:
        assert a in keys and b in keys
    assert len(truth.empty_group) == 3
    # exact groups are byte-identical; near groups are not
    by_key = {(r["repo"], r["path"]): r["content"] for r in rows}
    for g in truth.exact_groups:
        assert len({by_key[k] for k in g}) == 1
    for g in truth.near_groups:
        assert len({by_key[k] for k in g}) == len(g)
    # substring plants truly contain the needle
    for a, b in truth.substring_pairs:
        assert by_key[a] in by_key[b]


def test_bench_corpus_distributed_generation(spark):
    """bench_corpus_df: exact row count, unique (repo, path) keys, sha
    invariant column correct, and fully deterministic across evaluations
    (block b of seed s yields identical rows at any parallelism)."""
    import pyspark.sql.functions as F

    from cloud_dedup_spark.corpus import bench_corpus_df

    df = bench_corpus_df(spark, 9_500, seed=7, files_per_block=2_000)
    assert df.count() == 9_500
    assert df.select("repo", "path").distinct().count() == 9_500
    # invariant column matches content
    bad = df.filter(F.col("content_sha256") != F.sha2("content", 256)).count()
    assert bad == 0
    agg = lambda d: d.agg(  # noqa: E731
        F.expr("sum(cast(xxhash64(repo,path,content) as decimal(38,0)))")
    ).first()[0]
    again = bench_corpus_df(spark, 9_500, seed=7, files_per_block=2_000)
    assert agg(df) == agg(again)


def test_bench_corpus_exact_rowcount_with_tiny_tail(spark):
    """Round-4 review: generate_corpus has a ~28-row planted floor, so a
    1-row tail block overshot the exact row-count contract (8001 → 8027);
    small tails now fold into the previous block."""
    from cloud_dedup_spark.corpus import bench_corpus_df

    df = bench_corpus_df(spark, 8_001, seed=7, files_per_block=4_000)
    assert df.count() == 8_001
