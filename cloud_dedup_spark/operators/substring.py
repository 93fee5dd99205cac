"""Substring-containment pass: catches verbatim embeddings that shingle-LSH misses.

Reference analog: the mixed-type second channel
(src/cloud_duplicate_analyzer.py:435-482) — a second candidate-generation pass
over what the primary index missed (SURVEY.md §2.3 J4).  The LSH channel
misses short-inside-long containments because Jaccard(A, B) ≈ |A|/|B| falls
under the band threshold when B ≫ A.

Design — **anchor-shingle inverted-index join**, fully distributed, no
content grouping (a per-lang ``applyInPandas`` variant was rejected: it can't
see cross-lang containments and serializes each lang into one task):

  1. If normalized A appears verbatim in normalized B then every w-shingle of
     A is also a w-shingle of B (the tokenizer is context-free), so
     shingles(A) ⊆ shingles(B) — any single shingle of A can serve as a join
     anchor that B must contain.
  2. Anchor choice is the scale lever: the needle's **rarest** shingle by
     corpus document frequency.  (A min-hash anchor was tried first and is
     quadratic in disguise: with a skewed shingle distribution — boilerplate,
     small vocabularies — one common shingle value is simultaneously the min
     of many needles AND present in thousands of haystacks, so the anchor
     join fans out to needles × haystacks.  Rarest-shingle anchoring bounds
     each needle's fan-out by the DF of its most selective shingle: ~1 for
     unique docs, = the true copy count for genuinely embedded snippets.
     Measured on the 24k-file corpus: 107 s → seconds.)
  3. Candidates: anchors ⋈ exploded shingle inverted index (strictly longer
     docs only).
  4. Prefilter: shingle-subset test ``array_except(needle, haystack) = ∅`` —
     pure JVM, kills almost all false candidates.
  5. Verify: exact ``contains(haystack_norm, needle_norm)`` on the normalized
     content of surviving pairs — the pass claims *verbatim* substring
     duplicates (north_rule), so the final test is the string itself.

Scale notes: the exploded shingle index (|corpus tokens| rows) is only ever
scanned — the anchor frames stay K·|docs| rows and broadcast into it, so no
index-sized shuffle exists (measured: the shuffle variant was disk-bound and
parallelism-flat at 2·10^8 index rows).  The explicit broadcast() hints fit
comfortably to ~10^7 needles; beyond that drop the hints and the same plan
becomes plain shuffle hash joins, still linear (AQE picks broadcast back up
per-partition where sizes allow).  Exact-dup representatives only:
byte-identical copies were collapsed upstream, so one found needle covers its
whole exact family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_dedup_spark.config import DedupConfig


# Candidate anchors per needle: the K min-valued shingles.  Shingle hashes
# are uniform, so these are K random samples of the doc's shingle set — the
# rarest of them is corpus-rare for any doc with ANY distinctive content
# (P[all K common] = common_fraction^K).  K is a structural constant of the
# persisted anchors table (changing it means rebuilding the table), NOT a
# DedupConfig knob — the cfg-dependent filters (min_tokens, max_anchor_df)
# apply at read time so one table serves any config.
CAND_ANCHOR_K = 8


def candidate_anchors(sigs: DataFrame) -> DataFrame:
    """(src, needle_tokens, sh): the K min shingles per signature row.

    Factored out so the incremental path can PERSIST it as an append-only
    stage table (``anchors``): the reverse substring channel (old needle in
    NEW haystack) needs every corpus needle's candidate anchors each fold —
    re-exploding the union's signature rows per delta is an O(corpus) term,
    while scanning this narrow table and joining it against the delta's
    (broadcast) doc frequencies is scan-only (round-3 verdict item 1)."""
    return sigs.select("file_id", "shingles", "n_shingles", "n_tokens").filter(
        F.col("n_shingles") > 0
    ).select(
        F.col("file_id").alias("src"),
        F.col("n_tokens").alias("needle_tokens"),
        F.explode(F.slice(F.array_sort("shingles"), 1, CAND_ANCHOR_K)).alias("sh"),
    )


def shingle_inverted_index(sigs: DataFrame) -> DataFrame:
    """The exploded (dst, hay_tokens, sh) haystack index — the frame
    ``substring_edges`` scans twice (doc-frequency pass + candidate pass).

    Factored out so the incremental path can PERSIST it as an append-only
    stage table (streaming/incremental.py): each delta appends only its own
    exploded rows, and later deltas scan the narrow index parquet instead of
    re-exploding the whole union's fat signature rows on every update.
    """
    return sigs.select("file_id", "shingles", "n_shingles", "n_tokens").filter(
        F.col("n_shingles") > 0
    ).select(
        F.col("file_id").alias("dst"),
        F.col("n_tokens").alias("hay_tokens"),
        F.explode("shingles").alias("sh"),
    )


def substring_edges(
    reps: DataFrame,
    sigs: DataFrame,
    cfg: DedupConfig,
    needle_ids: DataFrame | None = None,
    haystack_ids: DataFrame | None = None,
    inverted: DataFrame | None = None,
    cand_anchors: DataFrame | None = None,
    df_index: DataFrame | None = None,
) -> DataFrame:
    """Containment edges, canonically ordered (src < dst); the ``needle``
    column carries the contained side's id (src is NOT always the needle
    after canonicalization) and ``needle_len`` its token length.

    ``reps``: identity frame of exact representatives (file_id, content_norm).
    ``sigs``: signature table (file_id, shingles, n_shingles, n_tokens).
    ``needle_ids`` / ``haystack_ids``: optional (file_id) frames restricting
    the respective side — the incremental path runs two delta-anchored calls
    (delta needles ⋈ all haystacks, all needles ⋈ delta haystacks) instead of
    recomputing the full cross of an unchanged corpus.
    ``inverted``: optional prebuilt ``shingle_inverted_index`` frame (e.g. the
    incremental path's persisted index table); must cover exactly the
    haystack rows of ``sigs``.  ``haystack_ids`` still applies to it.
    ``cand_anchors``: optional prebuilt :func:`candidate_anchors` frame (the
    persisted ``anchors`` stage table) replacing the needle-side explode.
    CONTRACT: only pass it together with a SMALL (delta-sized) haystack side.
    ``df_index``: optional FULL-corpus inverted index used only for anchor
    doc-frequencies.  Without it, frequencies come from ``inverted`` (the
    probe target) — correct for the batch path where the two coincide, but
    in the reverse incremental call ``inverted`` is the delta's index and
    delta-local df defeats the template cap: a boilerplate shingle looks
    rare in a 6-doc delta, every prior anchor carrying it survives, and the
    rarest-anchor argmin becomes an O(corpus) groupBy.  With ``df_index``
    the cap uses true corpus df (batch semantics) and prunes template
    anchors BEFORE the argmin, bounding it to |delta shingles| × cap rows.
    Output: src, dst, needle_len (tokens), where needle content appears
    verbatim inside haystack content.
    """
    assert not (cand_anchors is not None and needle_ids is not None), (
        "cand_anchors replaces the needle side; restrict needles by "
        "pre-filtering the anchors frame instead"
    )
    # delta mode: at least one side is delta-anchored, so every candidate
    # id-set below is small — semi-filter the corpus-sized frames through
    # explicit broadcasts so the plan is scan-only regardless of optimizer
    # size estimates (a mis-estimated sort-merge join here would shuffle the
    # corpus per micro-batch; pinned by the fold's shuffle-growth test)
    delta_mode = (
        needle_ids is not None
        or haystack_ids is not None
        or cand_anchors is not None
    )
    base = sigs.select("file_id", "shingles", "n_shingles", "n_tokens").filter(
        F.col("n_shingles") > 0
    )
    needle_base = base
    if needle_ids is not None:
        needle_base = base.join(
            F.broadcast(needle_ids.select("file_id")), "file_id", "left_semi"
        )

    if inverted is None:
        hay_base = base
        if haystack_ids is not None:
            hay_base = base.join(
                F.broadcast(haystack_ids.select("file_id")), "file_id", "left_semi"
            )
        # one owner of the index shape — the persisted incremental table and
        # this inline batch build must never drift (round-4 review)
        inverted = shingle_inverted_index(hay_base)
    elif haystack_ids is not None:
        inverted = inverted.join(
            F.broadcast(
                haystack_ids.select(F.col("file_id").alias("dst"))
            ),
            "dst",
            "left_semi",
        )

    # Candidate anchors: each needle's K min-valued shingles (see
    # candidate_anchors; keeping K small makes every frame below
    # broadcastable, so the 10^8-row exploded index is only ever SCANNED
    # (twice), never shuffled).
    if cand_anchors is None:
        # materialized once: consumed by both the anchor-value distinct and
        # the rarest-anchor argmin below — without the cut, each consumer
        # re-runs the array_sort+slice+explode over the wide signature rows
        cand_anchors = candidate_anchors(needle_base).filter(
            F.col("needle_tokens") >= cfg.substring_min_tokens
        ).localCheckpoint()

        # DF only for candidate-anchor values: broadcast-semi-filter the
        # index, then a map-side-combinable count — no full-index shuffle
        anchor_values = cand_anchors.select("sh").distinct()
        doc_freq = (
            inverted.join(F.broadcast(anchor_values), "sh", "left_semi")
            .groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
        )
    else:
        # prebuilt (persisted) anchors: frequencies must come from the FULL
        # index (df_index) when one is supplied — ``inverted`` here is the
        # delta's index and delta-local df defeats the template cap (see
        # the df_index contract above).  Only shingle values present in the
        # delta index matter (anchors on other values can never probe it),
        # so the corpus index is scanned through a broadcast semi-filter on
        # that tiny value set and the count is map-side combinable — no
        # corpus shuffle either way.
        cand_anchors = cand_anchors.filter(
            F.col("needle_tokens") >= cfg.substring_min_tokens
        )
        probe_sh = inverted.select("sh").distinct()
        freq_src = df_index if df_index is not None else inverted
        doc_freq = (
            freq_src.join(F.broadcast(probe_sh), "sh", "left_semi")
            .groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
        )

    # rarest candidate anchor per needle; needles whose rarest shingle is
    # still corpus-common are template-dominated — the near-dup channel owns
    # their duplicates, and keeping them would re-create quadratic fan-out.
    # The df cap is applied BEFORE the argmin: min(df) > cap ⟺ all df > cap,
    # so pre-filtering selects exactly the same needles and the same rarest
    # surviving anchor, while bounding the groupBy input to (distinct probe
    # shingles × cap) rows — without it, one boilerplate shingle carried by
    # every prior doc's anchor set turns the argmin into an O(corpus)
    # shuffle in the reverse incremental call (measured 3.5 MB/fold at a
    # 1.2k corpus, scaling linearly).
    # row_number, not min(struct(df, sh)): same (df, sh)-lexicographic pick,
    # but the exchange moves the compact joined rows — the SortAggregate
    # form's partial-agg records measured ~850 KB EACH on the shuffle wire
    # inside the incremental fold (buffer-bloated struct buffers), turning a
    # 4-row exchange into the fold's largest shuffle.
    from pyspark.sql import Window

    w_rarest = Window.partitionBy("src").orderBy("df", "sh")
    anchors = (
        cand_anchors.join(
            F.broadcast(
                doc_freq.filter(F.col("df") <= cfg.substring_max_anchor_df)
            ),
            "sh",
        )
        .withColumn("_rn", F.row_number().over(w_rarest))
        .filter(F.col("_rn") == 1)
        .select("src", "needle_tokens", "sh")
    )

    # candidates: broadcast the per-needle anchors into the index scan
    cand = (
        inverted.join(F.broadcast(anchors), "sh")
        .filter(F.col("hay_tokens") > F.col("needle_tokens"))
        .select("src", "dst", "needle_tokens")
    )
    needle_arrays = base.select(
        F.col("file_id").alias("src"), F.col("shingles").alias("needle_sh")
    )
    hay_sh = sigs.select(
        F.col("file_id").alias("dst"), F.col("shingles").alias("hay_sh")
    )
    a = reps.select(F.col("file_id").alias("src"), F.col("content_norm").alias("a_norm"))
    b = reps.select(F.col("file_id").alias("dst"), F.col("content_norm").alias("b_norm"))
    if delta_mode:
        # candidate pairs are delta-anchored (≤ |delta needles| × anchor-DF
        # cap, or delta haystacks × anchors hitting them) — materialize once
        # and force scan-only broadcast-semi lookups into the corpus frames,
        # so the only corpus-sized work below is column-pruned scans
        cand = cand.localCheckpoint()
        cand_src = cand.select(F.col("src").alias("file_id")).distinct()
        cand_dst = cand.select(F.col("dst").alias("file_id")).distinct()
        needle_arrays = needle_arrays.join(
            F.broadcast(cand_src.withColumnRenamed("file_id", "src")),
            "src", "left_semi",
        )
        hay_sh = hay_sh.join(
            F.broadcast(cand_dst.withColumnRenamed("file_id", "dst")),
            "dst", "left_semi",
        )
    cand = cand.join(needle_arrays, "src")

    # shingle-subset prefilter (JVM): all needle shingles present in haystack
    subset = (
        cand.join(hay_sh, "dst")
        .filter(F.size(F.array_except("needle_sh", "hay_sh")) == 0)
        .select("src", "dst", "needle_tokens")
    )

    if delta_mode:
        # content rows are the FAT rows — restrict them to pairs that
        # SURVIVED the shingle-subset prefilter, not to all candidates: one
        # template-dominated needle under the df cap can fan out to
        # cap-many haystacks (measured 851 content rows / 1.6 MiB on the
        # wire for a 6-file delta), almost all of which the subset filter
        # kills before verification ever needs their content
        subset = subset.localCheckpoint()
        a = a.join(
            F.broadcast(subset.select("src").distinct()), "src", "left_semi"
        )
        b = b.join(
            F.broadcast(subset.select("dst").distinct()), "dst", "left_semi"
        )

    # exact verbatim verification on normalized content
    verified = (
        subset.join(a, "src")
        .join(b, "dst")
        .filter(F.length("a_norm") >= cfg.substring_min_len)
        .filter(F.expr("contains(b_norm, a_norm)"))
        .select("src", "dst", F.col("needle_tokens").alias("needle_len"))
    )

    # canonical (src < dst) ordering for the edge graph; the containment
    # DIRECTION survives in the explicit `needle` column — after the swap,
    # src is no longer guaranteed to be the needle, and needle_len without
    # its owner id was wrong for half of all pairs (round-4 review).  Both
    # directions can never coexist for one pair (token-strict needle <
    # haystack inequality), so distinct() keeps one row per pair.
    return verified.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        F.col("src").alias("needle"),
        "needle_len",
    ).distinct()


def substring_edge_list(edges: DataFrame) -> DataFrame:
    """Edges in the common (src, dst, edge_kind, score) shape for clustering."""
    return edges.select(
        "src", "dst", F.lit("substring").alias("edge_kind"), F.lit(1.0).alias("score")
    )
