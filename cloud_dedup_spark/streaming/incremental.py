"""Incremental ingest: Structured Streaming front-end for the batch pipeline.

The reference is strictly batch (one analyze() pass, SURVEY.md §2.9 — no
streaming anywhere), and the scaled engine keeps batch semantics: the
north_rule's resumability comes from checkpointed stage tables, not streaming
state.  What a corpus lake *does* need is incremental ingest — new files
appearing in the source location should update the exact-duplicate index
without recomputing the world.  That is a natural fit for
``readStream`` + ``foreachBatch``: each micro-batch runs the same
deterministic batch operators over the delta and MERGEs into the stage
tables (append-only parquet here; Iceberg MERGE INTO on a cluster).

Full near-dup incrementality is ``incremental_dedup_update``: only the delta
pays the Python signature cost; prior stage tables (identity, signatures,
edges) are *scanned*, never recomputed.  New candidate pairs come from three
delta-anchored channels — exact (delta sha ⋈ union sha groups), LSH (delta
bands ⋈ union bands), substring (delta needles ⋈ union index AND union
needles ⋈ delta index — a new haystack can contain an old needle) — and
clusters are re-resolved over prior ∪ new edges (connected components is
cheap relative to signature computation).  The result is provably identical
to a full recompute over the union: every cross-(prior, delta) and
delta-delta edge channel is covered, prior-prior edges persist, and labels
are min-file_id either way (pinned by
tests/test_incremental.py::test_incremental_equals_full_recompute).

Batch operators are reused verbatim throughout: streaming/incremental is an
ingestion mode, not a second engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_dedup_spark.config import DedupConfig
from cloud_dedup_spark.functions.normalize import with_identity
from cloud_dedup_spark.sources.files_source import FILES_SCHEMA


def stream_files(spark: SparkSession, location: str) -> DataFrame:
    """readStream over the files location (new parquet files = new rows)."""
    return (
        spark.readStream.schema(FILES_SCHEMA)
        .format("parquet")
        .load(location)
    )


def incremental_dedup_update(
    spark: SparkSession,
    new_files: DataFrame,
    checkpoint_dir: str,
    cfg: DedupConfig | None = None,
    table_format: str = "parquet",
) -> dict:
    """Fold a batch of new files into existing dedup state (delta-anchored).

    Requires a prior ``run_pipeline(..., checkpoint_dir=...)`` run (stage
    tables: identity, signatures, edges).  Only the delta runs the Python
    signature stage; prior tables are scanned.  Appends delta rows to
    identity/signatures, rewrites edges/cluster_labels, and returns
    {assignments, edges, delta_signatures}.
    """
    from cloud_dedup_spark.functions.normalize import with_identity
    from cloud_dedup_spark.operators.candidates import explode_bands
    from cloud_dedup_spark.operators.signatures import compute_signatures
    from cloud_dedup_spark.operators.substring import (
        substring_edge_list,
        substring_edges,
    )
    from cloud_dedup_spark.operators.verify import accepted_edges, verify_pairs
    from cloud_dedup_spark.operators.cluster import cluster_assignments
    from pyspark.sql import Window

    cfg = cfg or DedupConfig()
    loc = checkpoint_dir.rstrip("/")
    load = lambda name: spark.read.format(table_format).load(f"{loc}/{name}")  # noqa: E731

    prior_identity = load("identity")  # metadata-only (pipeline contract)
    prior_sigs = load("signatures")
    prior_norm = load("norm")
    prior_bands = load("bands")
    prior_edges = load("edges")

    par = spark.sparkContext.defaultParallelism
    delta_identity_raw = with_identity(new_files)
    # batch fingerprint from the RAW delivered batch, BEFORE the idempotency
    # guard: a replayed micro-batch recomputes the identical key no matter
    # how much of the batch a crashed attempt managed to commit (a key
    # derived from the post-guard delta would drift after a partial identity
    # append, splitting one batch's index rows across two partitions)
    bfp = delta_identity_raw.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor: order-independent and overflow-free (ANSI mode makes a
        # long sum of hashes throw on overflow)
        F.expr("bit_xor(xxhash64(file_id, file_id2))").alias("h"),
    ).first()
    n_raw = bfp["n"]
    batch_key = f"b_{n_raw}_{(bfp['h'] or 0) & 0xFFFFFFFFFFFFFFFF:x}"

    # idempotency guard on the FULL 128-bit composite (file_id, file_id2): a
    # re-delivered file (same repo/path/commit) matches both hashes and is
    # dropped; a brand-new file whose 64-bit file_id merely collides with a
    # prior file's (different natural key → different file_id2) survives the
    # guard and is routed into quarantine below, exactly as the batch path
    # quarantines it — anti-joining on file_id alone silently swallowed that
    # event class.
    delta_identity = delta_identity_raw.join(
        prior_identity.select("file_id", "file_id2"),
        ["file_id", "file_id2"],
        "left_anti",
    )
    if delta_identity.rdd.getNumPartitions() < par:
        delta_identity = delta_identity.repartition(par * 2)
    delta_identity = delta_identity.localCheckpoint()
    n_delta = delta_identity.count()
    # False only when a crashed attempt committed part of this batch's
    # identity append — the recovery-only path for the index write below
    clean_first_attempt = n_delta == n_raw

    # quarantine FIRST, as the batch path does (pipeline.py): the union
    # identity decides which file_ids are collision-quarantined this run
    # (a delta file can newly quarantine a prior file and vice versa), and
    # every edge channel below runs on the clean subset only.
    from cloud_dedup_spark.plans.pipeline import quarantine_id_collisions

    meta_cols = [c for c in prior_identity.columns]
    union_identity = prior_identity.unionByName(delta_identity.select(*meta_cols))
    clean_union, quarantined_u = quarantine_id_collisions(union_identity)
    clean_union = clean_union.localCheckpoint()
    quarantined_ids = quarantined_u.select("file_id").distinct().localCheckpoint()
    delta_clean = delta_identity.join(
        F.broadcast(quarantined_ids), "file_id", "left_anti"
    )

    # --- exact channel: star edges within sha groups touched by the delta
    # OR by a quarantined prior member.  The second clause is the repair
    # path: when a collision quarantines a prior group's rep, that group's
    # surviving members lost their star edges with the rep — a full
    # recompute re-stars them around the new min-id clean member, so the
    # fold must too (quarantined shas are by construction a tiny set, so
    # re-deriving their stars every fold is cheap and idempotent).
    id_cols = ["content_sha256", "file_id"]
    union_sha = clean_union.select(*id_cols)
    delta_shas = delta_clean.select("content_sha256").distinct()
    # the overwhelmingly common case is zero quarantined ids; the repair
    # machinery below joins full prior tables, so gate it entirely (the
    # frame is localCheckpoint-materialized — this count is metadata-cheap)
    has_quarantine = quarantined_ids.limit(1).count() > 0
    if has_quarantine:
        prior_q_shas = (
            prior_identity.join(
                F.broadcast(quarantined_ids), "file_id", "left_semi"
            )
            .select("content_sha256")
            .distinct()
        )
        touched_shas = delta_shas.unionByName(prior_q_shas).distinct()
    else:
        touched_shas = delta_shas
    touched = union_sha.join(
        F.broadcast(touched_shas), "content_sha256", "left_semi"
    )
    w = Window.partitionBy("content_sha256")
    exact_new = (
        touched.withColumn("rep", F.min("file_id").over(w))
        .filter(F.col("file_id") != F.col("rep"))
        .select(
            F.least("rep", "file_id").alias("src"),
            F.greatest("rep", "file_id").alias("dst"),
            F.lit("exact").alias("edge_kind"),
            F.lit(1.0).alias("score"),
        )
    )

    # --- similarity channels: only brand-new content computes signatures ---
    # prior side restricted to clean rows: in a full recompute a delta file
    # whose content matches only a quarantined prior file still computes its
    # own signatures (the quarantined file never entered the exact channel)
    prior_clean_shas = clean_union.join(
        delta_clean.select("file_id", "file_id2").distinct(),
        ["file_id", "file_id2"],
        "left_anti",
    ).select("content_sha256")
    new_content = delta_clean.join(prior_clean_shas, "content_sha256", "left_anti")
    delta_reps = (
        new_content.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("content_sha256").orderBy("file_id")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    from cloud_dedup_spark.operators.signatures import SIG_TABLE_COLUMNS

    delta_sigs_base = compute_signatures(delta_reps, cfg).select(
        *SIG_TABLE_COLUMNS
    )
    delta_norm_base = delta_reps.select("file_id", "content_norm")
    if has_quarantine:
        # --- rep inheritance (quarantine repair, similarity side): a
        # collision can quarantine the one member that carried a sha group's
        # signature and norm rows (the exact-rep).  Prior content is not in
        # state (never checkpointed), but no recompute is needed: same sha ⇒
        # byte-identical content, so the group's new min-id clean rep
        # inherits RELABELED copies of a donor's rows, then flows through
        # every delta channel below (LSH bands, substring needles+index,
        # persisted appends) exactly like brand-new content.
        #
        # Donor validity: a sig row's file_id can be AMBIGUOUS — both
        # members of a collision pair share it, and only one of them wrote
        # the row.  A donor is used only when every prior identity row with
        # that file_id has one sha (then the row provably carries that
        # sha's content); ambiguous carriers are skipped — bounded recall
        # loss in an astronomically rare corner, never wrong signatures.
        # Exactly ONE donor is picked per sha (successive repairs can leave
        # several carriers).  Repair triggers only for groups with NO clean
        # sig-carrier left — if any clean member still carries signatures,
        # the group's similarity channels are intact and inheritance would
        # only grow the tables.  Idempotent: a repaired rep is itself a
        # clean carrier on the next fold.
        new_reps = (
            clean_union.join(
                F.broadcast(touched_shas), "content_sha256", "left_semi"
            )
            .groupBy("content_sha256")
            .agg(F.min("file_id").alias("file_id"))
        )
        clean_carrier_shas = (
            prior_identity.join(
                F.broadcast(quarantined_ids), "file_id", "left_anti"
            )
            .join(prior_sigs.select("file_id"), "file_id", "left_semi")
            .select("content_sha256")
            .distinct()
        )
        reps_missing = new_reps.join(
            clean_carrier_shas, "content_sha256", "left_anti"
        ).join(delta_reps.select("file_id"), "file_id", "left_anti")
        unambiguous = (
            prior_identity.groupBy("file_id")
            .agg(
                F.countDistinct("content_sha256").alias("_n"),
                F.min("content_sha256").alias("content_sha256"),
            )
            .filter(F.col("_n") == 1)
            .select("content_sha256", F.col("file_id").alias("donor_id"))
        )
        donor_pick = (
            unambiguous.join(
                prior_sigs.select(F.col("file_id").alias("donor_id")),
                "donor_id",
                "left_semi",
            )
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("content_sha256").orderBy("donor_id")
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        repair_map = reps_missing.select("content_sha256", "file_id").join(
            donor_pick, "content_sha256"
        )
        sig_payload = [c for c in SIG_TABLE_COLUMNS if c != "file_id"]
        inherited_sigs = repair_map.join(
            prior_sigs.withColumnRenamed("file_id", "donor_id"), "donor_id"
        ).select("file_id", *sig_payload)
        inherited_norm = repair_map.join(
            prior_norm.withColumnRenamed("file_id", "donor_id"), "donor_id"
        ).select("file_id", "content_norm")
        delta_sigs_base = delta_sigs_base.unionByName(inherited_sigs)
        delta_norm_base = delta_norm_base.unionByName(inherited_norm)

    delta_sigs = delta_sigs_base.localCheckpoint()
    delta_norm = delta_norm_base.localCheckpoint()
    union_sigs = prior_sigs.unionByName(delta_sigs)
    union_norm = prior_norm.unionByName(delta_norm)

    # LSH: delta bands against the union — covers delta↔delta and delta↔prior
    delta_bands = explode_bands(delta_sigs)
    union_bands = prior_bands.unionByName(delta_bands)
    lsh_pairs = (
        delta_bands.join(
            union_bands.withColumnRenamed("file_id", "other_id"), "band_key"
        )
        .filter(F.col("file_id") != F.col("other_id"))
        .select(
            F.least("file_id", "other_id").alias("src"),
            F.greatest("file_id", "other_id").alias("dst"),
        )
        .distinct()
    )
    near_new = accepted_edges(verify_pairs(lsh_pairs, union_sigs, cfg)).select(
        "src", "dst", "edge_kind", "score"
    )

    # substring: both delta-anchored directions (new needle in old haystack,
    # old needle in new haystack; delta↔delta covered by the first).
    # The haystack inverted index is PERSISTED state, grown one
    # batch-partition per delta: built once from the prior signatures if
    # absent, extended with only the delta's exploded rows each update, and
    # scanned by the delta-needles call — so no update ever re-explodes the
    # union's signature rows (ROADMAP 5; the delta-haystacks call explodes
    # just the delta, which is already delta-sized).
    from cloud_dedup_spark.operators.substring import shingle_inverted_index
    from cloud_dedup_spark.plans.pipeline import CheckpointStore

    store = CheckpointStore(spark, loc, table_format)
    index_path = f"{loc}/shingle_index"
    if not store.exists("shingle_index"):
        # first incremental run: base partition from the prior signatures
        shingle_inverted_index(prior_sigs).withColumn(
            "ingest_batch", F.lit("base")
        ).write.mode("overwrite").partitionBy("ingest_batch").format(
            table_format
        ).save(index_path)
    elif "ingest_batch" not in spark.read.format(table_format).load(
        index_path
    ).columns:
        # one-time migration of a checkpoint written before the index was
        # batch-partitioned: rewrite it as the base partition via a tmp-dir
        # swap (reading and overwriting the same path in one job loses data)
        from cloud_dedup_spark.plans.maintenance import _fs

        tmp_path = f"{index_path}.migrate.tmp"
        spark.read.format(table_format).load(index_path).withColumn(
            "ingest_batch", F.lit("base")
        ).write.mode("overwrite").partitionBy("ingest_batch").format(
            table_format
        ).save(tmp_path)
        fs, hpath, jvm = _fs(spark, index_path)
        P = jvm.org.apache.hadoop.fs.Path
        if not fs.delete(hpath, True) or not fs.rename(P(tmp_path), hpath):
            raise IOError(f"shingle_index migration failed for {index_path}")

    # The index is the LARGEST stage table (one row per corpus token), so
    # its append idempotency must not cost a per-delta scan of the table
    # (an insert-if-absent distinct over `dst` is O(corpus tokens) per
    # micro-batch).  Instead each delta writes its exploded rows into its
    # OWN partition, keyed by `batch_key` (derived from the RAW batch, so
    # replays recompute it identically): a replayed micro-batch
    # dynamic-overwrites exactly that partition — idempotent at O(delta).
    # The recovery path for a batch whose identity append was PARTIAL is
    # below at the persist step.
    delta_index = shingle_inverted_index(delta_sigs).localCheckpoint()
    # union for THIS fold's reads: stored partitions except a half-written
    # copy of this very batch (crash window: index written, identity not —
    # in that window the crashed attempt already committed this batch's
    # edges, which the fold unions in via prior_edges, so excluding its
    # index partition here loses nothing), plus the in-memory delta rows
    union_index = (
        spark.read.format(table_format)
        .load(index_path)
        .filter(F.col("ingest_batch") != batch_key)
        .select("dst", "hay_tokens", "sh")
        .unionByName(delta_index)
    )

    delta_ids = delta_sigs.select("file_id")
    sub_new = substring_edge_list(
        substring_edges(
            union_norm, union_sigs, cfg, needle_ids=delta_ids,
            inverted=union_index,
        )
        .unionByName(
            substring_edges(
                union_norm, union_sigs, cfg, haystack_ids=delta_ids
            )
        )
        .distinct()
    )

    # edges never touch a quarantined id (batch builds all channels from the
    # clean identity, so a full recompute has no such edge; prior_edges can
    # carry one when THIS delta newly quarantines a prior file — left
    # unfiltered it could even bridge two clean files through the quarantined
    # node in connected components)
    all_edges = (
        prior_edges.unionByName(exact_new)
        .unionByName(near_new)
        .unionByName(sub_new)
        .join(
            F.broadcast(quarantined_ids.withColumnRenamed("file_id", "src")),
            "src",
            "left_anti",
        )
        .join(
            F.broadcast(quarantined_ids.withColumnRenamed("file_id", "dst")),
            "dst",
            "left_anti",
        )
        .select("src", "dst", "edge_kind", "score")
        .dropDuplicates(["src", "dst"])
        .localCheckpoint()  # materialize BEFORE overwriting the table it reads
    )
    assignments = (
        cluster_assignments(clean_union, all_edges)
        .withColumn("quarantined", F.lit(False))
        .unionByName(
            quarantined_u.select(
                "file_id", "repo", "path",
                F.col("file_id2").alias("cluster_id"),
                F.lit(True).alias("quarantined"),
            )
        )
        .localCheckpoint()
    )

    # persist — crash-safe under foreachBatch replay at ANY point:
    #   1. derived tables (edges, cluster_labels) are overwritten FIRST;
    #      their frames are localCheckpoint-materialized above, so
    #      overwriting the tables they were read from is safe, and a crash
    #      right after leaves derived state ahead of base state — the replay
    #      recomputes the same edges deterministically and overwrites again;
    #   2. every append is insert-if-absent (anti-join on file_id against
    #      the live table), so a replay after a partial append never
    #      duplicates rows;
    #   3. identity goes LAST: it is the table the top-of-fold idempotency
    #      guard keys on, i.e. the commit point.  A crash anywhere before it
    #      leaves the delta "not yet ingested" — the replay redoes the fold
    #      and reconverges; a crash after it means every other write already
    #      committed.  (The earlier ordering appended identity first: a
    #      crash between that append and the edges overwrite silently
    #      dropped the delta's edges forever, because the replay saw the
    #      delta as already delivered.  Pinned by
    #      tests/test_incremental.py::test_partial_write_replay_reconverges.)
    all_edges.write.mode("overwrite").format(table_format).save(f"{loc}/edges")
    assignments.write.mode("overwrite").format(table_format).save(
        f"{loc}/cluster_labels"
    )

    # index rows land in this batch's own partition (see batch_key above);
    # dynamic overwrite touches only partitions present in the data, so an
    # empty replay delta writes nothing and a crashed half-write is replaced
    # wholesale on the next replay.  The partition path is only valid when
    # this fold's delta covers the WHOLE raw batch — after a crash mid-way
    # through the identity append, the replay's delta shrinks to the
    # not-yet-committed rows, and overwriting the partition with just those
    # would drop the committed rows' index entries.  On that recovery-only
    # path fall back to a dst-guarded append (the crashed attempt wrote the
    # index before identity, so the guard almost always appends nothing; an
    # O(index) scan is acceptable for crash recovery, not per fold).
    if clean_first_attempt:
        (
            delta_index.withColumn("ingest_batch", F.lit(batch_key))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .format(table_format)
            .save(index_path)
        )
    else:
        existing_dst = (
            spark.read.format(table_format)
            .load(index_path)
            .select("dst")
            .distinct()
        )
        (
            delta_index.join(existing_dst, "dst", "left_anti")
            .withColumn("ingest_batch", F.lit(batch_key + "_r"))
            .write.mode("append")
            .partitionBy("ingest_batch")
            .format(table_format)
            .save(index_path)
        )

    def _append_absent(df: DataFrame, name: str, keys: list[str]) -> None:
        existing = (
            spark.read.format(table_format)
            .load(f"{loc}/{name}")
            .select(*keys)
            .distinct()
        )
        df.join(existing, keys, "left_anti").write.mode("append").format(
            table_format
        ).save(f"{loc}/{name}")

    # sigs/norm/bands hold clean exact-representatives only, where file_id is
    # unique (a colliding delta file never reaches them — quarantined above),
    # so file_id alone is the right key; identity holds EVERY row incl.
    # quarantined collision pairs, so its key is the 128-bit composite —
    # a file_id-only guard would silently drop a new colliding file's row.
    _append_absent(delta_sigs, "signatures", ["file_id"])
    _append_absent(delta_norm, "norm", ["file_id"])
    _append_absent(delta_bands, "bands", ["file_id"])
    _append_absent(
        delta_identity.select(*meta_cols), "identity", ["file_id", "file_id2"]
    )
    return {
        "assignments": assignments,
        "edges": all_edges,
        "delta_signatures": delta_sigs,
    }


def incremental_dedup_stream(
    spark: SparkSession,
    source_location: str,
    checkpoint_dir: str,
    stream_checkpoint: str,
    cfg: DedupConfig | None = None,
    table_format: str = "parquet",
    trigger_available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Full near-dup incremental dedup as a Structured Streaming query.

    ``readStream`` over the files location; each micro-batch folds its delta
    into the checkpointed stage tables via :func:`incremental_dedup_update`
    (exact + LSH + substring channels, clusters re-resolved).  Requires a
    prior ``run_pipeline(..., checkpoint_dir=...)`` run, like the batch-delta
    entry point it wraps.

    Delivery semantics: ``foreachBatch`` is at-least-once — on recovery a
    micro-batch can be replayed after its fold already committed.  The fold
    is idempotent against exactly that: the (file_id, file_id2) composite
    anti-join drops every already-ingested row, so a replay appends nothing
    and rewrites derived tables to the same fixed point (pinned by
    tests/test_streaming.py::test_stream_replay_is_idempotent).

    ``max_files_per_trigger`` bounds micro-batch size (admission control for
    a backlogged source); ``trigger_available_now`` drains the current
    backlog then stops — the batch-friendly mode the tests and a nightly
    ingest job use; continuous tail-ingest jobs pass False.
    Returns the started StreamingQuery.
    """
    cfg = cfg or DedupConfig()

    def fold(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        incremental_dedup_update(
            spark, batch, checkpoint_dir, cfg, table_format
        )

    reader = spark.readStream.schema(FILES_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    writer = (
        reader.load(source_location)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", stream_checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_exact_index(
    spark: SparkSession,
    source_location: str,
    index_location: str,
    checkpoint_location: str,
    trigger_available_now: bool = True,
):
    """Maintain an append-only (content_sha256, file_id, repo, path) index.

    Each micro-batch computes identity columns for the delta only and appends
    to the index; exact-duplicate groups are then a groupBy over the index —
    the same computation as operators/exact.py, arriving incrementally.
    Returns the started StreamingQuery.
    """

    def upsert(batch: DataFrame, _batch_id: int) -> None:
        (
            with_identity(batch)
            .select("content_sha256", "file_id", "repo", "path")
            .write.mode("append")
            .parquet(index_location)
        )

    writer = (
        stream_files(spark, source_location)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_location)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
