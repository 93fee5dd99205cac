"""Incremental dedup updates: delta batch folded into checkpointed state must
equal a full recompute over the union (the equivalence that makes
incremental ingest trustworthy)."""

from __future__ import annotations

import pytest

from cloud_dedup_spark import run_pipeline
from cloud_dedup_spark.corpus import _Gen, _near_edit, generate_corpus
from cloud_dedup_spark.streaming.incremental import incremental_dedup_update

SCHEMA = "repo string, path string, commit string, lang string, content string"
BASE_N = 250


def _clusters(assignments) -> set[frozenset]:
    got: dict = {}
    for r in assignments.collect():
        got.setdefault(r["cluster_id"], set()).add((r["repo"], r["path"]))
    return {frozenset(v) for v in got.values() if len(v) >= 2}


@pytest.fixture(scope="module")
def state(spark, tmp_path_factory):
    rows, _ = generate_corpus(BASE_N, seed=11)
    base = spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"])
         for r in rows], SCHEMA)
    ckpt = str(tmp_path_factory.mktemp("inc_ckpt"))
    run_pipeline(spark, base, checkpoint_dir=ckpt)

    # delta exercising every cross-(prior, delta) channel
    gen = _Gen(99)
    old_a = rows[0]["content"]          # exact-dup target
    old_b = rows[1]["content"]          # near-edit target
    old_c = rows[2]["content"]          # old needle → new haystack
    new_short = gen.body(25)            # new needle → new+old haystacks
    new_pair = gen.body(70)             # delta-internal exact pair
    delta_rows = [
        ("repo_c", "inc/exact_of_old.py", "d1", "py", old_a),
        ("repo_c", "inc/near_of_old.py", "d2", "py", _near_edit(old_b, gen.rng)),
        ("repo_c", "inc/hay_with_old.py", "d3", "py",
         gen.body(60) + "\n\n" + old_c + "\n\n" + gen.body(60)),
        ("repo_a", "inc/new_short.py", "d4", "py", new_short),
        ("repo_b", "inc/new_hay.py", "d5", "py",
         gen.body(50) + "\n\n" + new_short + "\n\n" + gen.body(50)),
        ("repo_a", "inc/pair1.py", "d6", "py", new_pair),
        ("repo_b", "inc/pair2.py", "d7", "py", new_pair),
        ("repo_c", "inc/unique.py", "d8", "py", gen.body(40)),
    ]
    delta = spark.createDataFrame(delta_rows, SCHEMA)
    inc = incremental_dedup_update(spark, delta, ckpt)
    return base, delta, ckpt, inc


def test_incremental_equals_full_recompute(spark, state):
    base, delta, ckpt, inc = state
    inc_clusters = _clusters(inc["assignments"])

    full = run_pipeline(spark, base.unionByName(delta))
    full_clusters = _clusters(full["assignments"])
    assert inc_clusters == full_clusters


def test_delta_channels_all_fired(spark, state):
    base, delta, ckpt, inc = state
    asg = spark.read.parquet(f"{ckpt}/cluster_labels")
    clusters = _clusters(asg)

    def cluster_of(key):
        for c in clusters:
            if key in c:
                return c
        return None

    base_keys = {(r["repo"], r["path"]) for r in base.collect()}
    # exact-of-old joined an existing file's cluster
    c = cluster_of(("repo_c", "inc/exact_of_old.py"))
    assert c and any(k in base_keys for k in c)
    # near-of-old joined its source's cluster
    c = cluster_of(("repo_c", "inc/near_of_old.py"))
    assert c and any(k in base_keys for k in c)
    # old needle (base rows[2]) merged with the new haystack
    c = cluster_of(("repo_c", "inc/hay_with_old.py"))
    assert c is not None
    # new needle links to the new haystack that embeds it
    c = cluster_of(("repo_a", "inc/new_short.py"))
    assert c and ("repo_b", "inc/new_hay.py") in c
    # delta-internal exact pair clustered
    c = cluster_of(("repo_a", "inc/pair1.py"))
    assert c and ("repo_b", "inc/pair2.py") in c
    # unique stays unclustered
    assert cluster_of(("repo_c", "inc/unique.py")) is None


def test_state_tables_grew(spark, state):
    base, delta, ckpt, inc = state
    n_total = base.count() + delta.count()
    assert spark.read.parquet(f"{ckpt}/identity").count() == n_total
    assert spark.read.parquet(f"{ckpt}/cluster_labels").count() == n_total


def test_partial_write_replay_reconverges(spark, tmp_path):
    """Crash-safety of the fold's persist sequence: simulate a micro-batch
    that committed EVERY write except the identity commit point (the
    worst-case window — under the old identity-first ordering this exact
    scenario silently lost the delta's edges forever), then replay the same
    delta.  The replay must reconverge bit-for-bit: no duplicated rows in
    any append table, clusters identical to a clean single run."""
    import shutil

    from pyspark.sql import functions as F

    rows, _ = generate_corpus(150, seed=21)
    base = spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"])
         for r in rows], SCHEMA)
    ckpt_a = str(tmp_path / "a")
    ckpt_b = str(tmp_path / "b")
    run_pipeline(spark, base, checkpoint_dir=ckpt_a)
    shutil.copytree(ckpt_a, ckpt_b)

    gen = _Gen(67)
    pair = gen.body(55)
    delta = spark.createDataFrame(
        [
            ("repo_x", "p/exact_of_old.py", "z1", "py", rows[0]["content"]),
            ("repo_x", "p/pair1.py", "z2", "py", pair),
            ("repo_y", "p/pair2.py", "z3", "py", pair),
        ],
        SCHEMA,
    )
    incremental_dedup_update(spark, delta, ckpt_a)  # the clean run

    # B "crashed" with everything EXCEPT identity committed: copy A's
    # post-update derived + append tables, keep B's pre-update identity
    for t in ("edges", "cluster_labels", "signatures", "norm", "bands",
              "shingle_index"):
        shutil.rmtree(f"{ckpt_b}/{t}", ignore_errors=True)
        shutil.copytree(f"{ckpt_a}/{t}", f"{ckpt_b}/{t}")

    incremental_dedup_update(spark, delta, ckpt_b)  # the replay

    for t in ("identity", "signatures", "norm", "bands", "shingle_index"):
        na = spark.read.parquet(f"{ckpt_a}/{t}").count()
        nb = spark.read.parquet(f"{ckpt_b}/{t}").count()
        assert nb == na, f"{t}: replay changed row count {na} -> {nb}"
    # append tables hold no duplicated keys after the replay
    sigs_b = spark.read.parquet(f"{ckpt_b}/signatures")
    assert sigs_b.count() == sigs_b.select("file_id").distinct().count()
    idx_b = spark.read.parquet(f"{ckpt_b}/shingle_index")
    per_dst = idx_b.groupBy("dst").count()
    sigs_n = sigs_b.select("file_id", "n_shingles").withColumnRenamed(
        "file_id", "dst")
    assert (
        per_dst.join(sigs_n, "dst")
        .filter(F.col("count") != F.col("n_shingles"))
        .count()
        == 0
    )
    assert _clusters(spark.read.parquet(f"{ckpt_b}/cluster_labels")) == \
        _clusters(spark.read.parquet(f"{ckpt_a}/cluster_labels"))


def test_substring_index_is_persistent_and_append_only(spark, state, tmp_path):
    """ROADMAP 5: the substring haystack inverted index is a persisted stage
    table.  After an update it covers exactly the union signatures (sum of
    n_shingles), and a second update grows it by ONLY the new delta's
    exploded rows — proof the union's signature rows are never re-exploded
    per delta."""
    import pyspark.sql.functions as F

    base, delta, ckpt, inc = state
    idx = spark.read.parquet(f"{ckpt}/shingle_index")
    sigs = spark.read.parquet(f"{ckpt}/signatures")
    expected = sigs.filter("n_shingles > 0").agg(F.sum("n_shingles")).first()[0]
    n_before = idx.count()
    assert n_before == expected

    gen = _Gen(123)
    delta2 = spark.createDataFrame(
        [("repo_a", "inc2/fresh.py", "e1", "py", gen.body(45))], SCHEMA)
    inc2 = incremental_dedup_update(spark, delta2, ckpt)
    n_after = spark.read.parquet(f"{ckpt}/shingle_index").count()
    delta2_shingles = (
        inc2["delta_signatures"].agg(F.sum("n_shingles")).first()[0] or 0
    )
    assert n_after == n_before + delta2_shingles
    assert delta2_shingles > 0  # the probe actually appended something
