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


def _new_shuffle_read(spark, fn):
    """Run fn(); return total shuffle-read bytes of stages it created."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway

    def stage_ids_and_bytes():
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        store = spark._jsc.sc().statusStore()
        darr = gw.new_array(jvm.double, 0)
        out = {}
        sl = store.stageList(
            jvm.java.util.ArrayList(), False, False, darr,
            jvm.java.util.ArrayList(),
        )
        it = sl.iterator()
        while it.hasNext():
            s = it.next()
            out[s.stageId()] = s.shuffleReadBytes()
        return out

    before = stage_ids_and_bytes()
    res = fn()
    after = stage_ids_and_bytes()
    return sum(b for sid, b in after.items() if sid not in before), res


def _distinct_body(rng, n):
    """Content from a token space disjoint from generate_corpus, so delta
    needles are corpus-rare (the df-capped template-needle fan-out is a
    separate, cap-bounded term — this test pins the fold MACHINERY)."""
    return "\n".join(
        f"def zq{rng.randrange(10**9)}_{i}(a, b): return a * "
        f"{rng.randrange(10**6)} + b"
        for i in range(n)
    )


def test_fold_shuffle_stays_flat_as_corpus_grows(spark, tmp_path):
    """THE O(delta) pin (round-3 verdict item 1): folding the same delta into
    a 10x larger prior corpus must not grow the fold's shuffle — corpus-sized
    state is only ever scanned (broadcast semi-joins), never shuffled.
    Measured 73 KB at both sizes when this landed; the 1.5x bound leaves room
    for plan jitter while failing loudly on any O(corpus) regression (the
    pre-fix ratio was 3-4x)."""
    import random

    def fold_bytes(n_base, seed):
        rows, _ = generate_corpus(n_base, seed=seed)
        base = spark.createDataFrame(
            [(r["repo"], r["path"], r["commit"], r["lang"], r["content"])
             for r in rows], SCHEMA)
        ckpt = str(tmp_path / f"flat_{n_base}")
        run_pipeline(spark, base, checkpoint_dir=ckpt)
        rng = random.Random(99)
        pair = _distinct_body(rng, 60)
        short = _distinct_body(rng, 25)
        delta = spark.createDataFrame(
            [
                ("repo_z", "d/exact_of_old.py", "x1", "py",
                 rows[0]["content"]),
                ("repo_z", "d/pair1.py", "x2", "py", pair),
                ("repo_y", "d/pair2.py", "x3", "py", pair),
                ("repo_z", "d/short.py", "x4", "py", short),
                ("repo_y", "d/hay.py", "x5", "py",
                 _distinct_body(rng, 40) + "\n\n" + short + "\n\n"
                 + _distinct_body(rng, 40)),
                ("repo_z", "d/unique.py", "x6", "py", _distinct_body(rng, 35)),
            ],
            SCHEMA,
        )
        sh, inc = _new_shuffle_read(
            spark, lambda: incremental_dedup_update(spark, delta, ckpt)
        )
        assert inc["n_delta"] == 6
        return sh

    small = fold_bytes(120, seed=31)
    big = fold_bytes(1200, seed=31)
    assert big < max(small, 1) * 1.5 + 65536, (small, big)


def test_fold_lsh_hot_bucket_is_capped(spark, tmp_path):
    """Round-4 verdict item 1: a delta member of an over-cap band bucket
    (a near-identical — NOT byte-identical, so exact pre-collapse can't
    remove it — boilerplate family) pairs only with its ~cap-sized salt
    group per band.  The fold's LSH verify input must be O(bands × cap),
    never O(bucket), and the delta member must still join the family's
    cluster (connectivity through its salt group + exact verification)."""
    from cloud_dedup_spark.config import DedupConfig

    # few bands + small cap so the O(bands × cap) bound sits far below the
    # bucket size; the family members differ only in a comment line, which
    # normalization strips — identical shingle sets (bucket size == family)
    # but distinct raw bytes (no exact-channel collapse)
    cfg = DedupConfig(
        num_hashes=16, num_bands=4, rows_per_band=4, band_bucket_cap=16
    )
    fam = 400
    body = "\n".join(
        f"def hotfam_{i}(a, b):\n    return a * {i} + b" for i in range(40)
    )
    base_rows = [
        ("repo_a", f"fam/m{j}.py", "c", "py", f"{body}\n# member {j}\n")
        for j in range(fam)
    ]
    base = spark.createDataFrame(base_rows, SCHEMA)
    ckpt = str(tmp_path / "hot_ckpt")
    run_pipeline(spark, base, cfg=cfg, checkpoint_dir=ckpt)

    delta = spark.createDataFrame(
        [("repo_z", "fam/delta.py", "d", "py", f"{body}\n# member delta\n")],
        SCHEMA,
    )
    inc = incremental_dedup_update(spark, delta, ckpt, cfg=cfg)
    assert inc["n_delta"] == 1

    # O(cap) bound: ≤ bands × ~2·cap distinct partners (salt-group sizes vary
    # around cap), with slack — and strictly below the bucket size, which is
    # what the uncapped join emitted (≥ fam distinct pairs)
    assert inc["n_lsh_pairs"] <= cfg.num_bands * 3 * cfg.band_bucket_cap, (
        inc["n_lsh_pairs"]
    )
    assert inc["n_lsh_pairs"] < fam

    # connectivity survives the cap: the delta file landed in the family's
    # cluster (its salt-group edges verify at jaccard 1.0)
    labels = spark.read.parquet(f"{ckpt}/cluster_labels")
    by_file = {(r["repo"], r["path"]): r["cluster_id"] for r in labels.collect()}
    delta_label = by_file[("repo_z", "fam/delta.py")]
    fam_labels = {by_file[("repo_a", f"fam/m{j}.py")] for j in range(0, fam, 37)}
    assert fam_labels == {delta_label}


def test_incremental_cc_runs_on_touched_components_only(spark, tmp_path):
    """Incremental connected components (round-3 verdict item 2): a fold's CC
    pass runs over the touched components' members + the delta only, not the
    corpus, and untouched components keep their prior labels verbatim."""
    rows, _ = generate_corpus(200, seed=47)
    base = spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"], r["content"])
         for r in rows], SCHEMA)
    ckpt = str(tmp_path / "cc_ckpt")
    run_pipeline(spark, base, checkpoint_dir=ckpt)
    prior = spark.read.parquet(f"{ckpt}/cluster_labels")
    n_prior = prior.count()
    prior_by_file = {
        (r["repo"], r["path"]): r["cluster_id"] for r in prior.collect()
    }

    # delta: one exact dup of a prior file (touches exactly that file's
    # component) + one distinctive singleton (touches nothing prior)
    import random

    rng = random.Random(5)
    delta = spark.createDataFrame(
        [
            ("repo_z", "cc/exact_of_old.py", "c1", "py", rows[0]["content"]),
            ("repo_z", "cc/lonely.py", "c2", "py", _distinct_body(rng, 30)),
        ],
        SCHEMA,
    )
    inc = incremental_dedup_update(spark, delta, ckpt)
    stats = inc["cc_stats"]

    # the touched component is the one containing rows[0]'s file: CC saw its
    # members plus the 2 delta files, nowhere near the 200-file corpus
    touched_label = prior_by_file[(rows[0]["repo"], rows[0]["path"])]
    touched_size = sum(
        1 for v in prior_by_file.values() if v == touched_label
    )
    assert stats["n_touched_clusters"] >= 1
    assert stats["n_vertices"] <= touched_size + 2 + 5  # small slack for
    # other components the delta's edges may legitimately touch
    assert stats["n_vertices"] < n_prior / 4

    # untouched components keep their labels verbatim
    after = spark.read.parquet(f"{ckpt}/cluster_labels")
    after_by_file = {
        (r["repo"], r["path"]): r["cluster_id"] for r in after.collect()
    }
    for key, lbl in prior_by_file.items():
        if lbl != touched_label:
            assert after_by_file[key] == lbl, key
