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
) -> DataFrame:
    """Containment edges (src=needle, dst=haystack, src<dst after normalize).

    ``reps``: identity frame of exact representatives (file_id, content_norm).
    ``sigs``: signature table (file_id, shingles, n_shingles, n_tokens).
    ``needle_ids`` / ``haystack_ids``: optional (file_id) frames restricting
    the respective side — the incremental path runs two delta-anchored calls
    (delta needles ⋈ all haystacks, all needles ⋈ delta haystacks) instead of
    recomputing the full cross of an unchanged corpus.
    ``inverted``: optional prebuilt ``shingle_inverted_index`` frame (e.g. the
    incremental path's persisted index table); must cover exactly the
    haystack rows of ``sigs``.  ``haystack_ids`` still applies to it.
    Output: src, dst, needle_len (tokens), where needle content appears
    verbatim inside haystack content.
    """
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
        inverted = hay_base.select(
            F.col("file_id").alias("dst"),
            F.col("n_tokens").alias("hay_tokens"),
            F.explode("shingles").alias("sh"),
        )
    elif haystack_ids is not None:
        inverted = inverted.join(
            F.broadcast(
                haystack_ids.select(F.col("file_id").alias("dst"))
            ),
            "dst",
            "left_semi",
        )

    # Candidate anchors: each needle's K min-valued shingles.  Shingle hashes
    # are uniform, so these are K random samples of the doc's shingle set —
    # the rarest of them is corpus-rare for any doc with ANY distinctive
    # content (P[all K common] = common_fraction^K).  Keeping K small makes
    # every frame below broadcastable, so the 10^8-row exploded index is only
    # ever SCANNED (twice), never shuffled.
    K = 8
    # materialized once: consumed by both the anchor-value distinct and the
    # rarest-anchor argmin below — without the cut, each consumer re-runs the
    # array_sort+slice+explode over the wide signature rows
    cand_anchors = needle_base.filter(
        F.col("n_tokens") >= cfg.substring_min_tokens
    ).select(
        F.col("file_id").alias("src"),
        F.col("n_tokens").alias("needle_tokens"),
        F.explode(F.slice(F.array_sort("shingles"), 1, K)).alias("sh"),
    ).localCheckpoint()

    # DF only for candidate-anchor values: broadcast-semi-filter the index,
    # then a map-side-combinable count — no full-index shuffle
    anchor_values = cand_anchors.select("sh").distinct()
    doc_freq = (
        inverted.join(F.broadcast(anchor_values), "sh", "left_semi")
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    # rarest candidate anchor per needle; needles whose rarest shingle is
    # still corpus-common are template-dominated — the near-dup channel owns
    # their duplicates, and keeping them would re-create quadratic fan-out
    anchors = (
        cand_anchors.join(F.broadcast(doc_freq), "sh")
        .groupBy("src", "needle_tokens")
        .agg(F.min(F.struct("df", "sh")).alias("m"))
        .filter(F.col("m.df") <= cfg.substring_max_anchor_df)
        .select("src", "needle_tokens", F.col("m.sh").alias("sh"))
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
    cand = cand.join(needle_arrays, "src")

    # shingle-subset prefilter (JVM): all needle shingles present in haystack
    hay_sh = sigs.select(
        F.col("file_id").alias("dst"), F.col("shingles").alias("hay_sh")
    )
    subset = (
        cand.join(hay_sh, "dst")
        .filter(F.size(F.array_except("needle_sh", "hay_sh")) == 0)
        .select("src", "dst", "needle_tokens")
    )

    # exact verbatim verification on normalized content
    a = reps.select(F.col("file_id").alias("src"), F.col("content_norm").alias("a_norm"))
    b = reps.select(F.col("file_id").alias("dst"), F.col("content_norm").alias("b_norm"))
    verified = (
        subset.join(a, "src")
        .join(b, "dst")
        .filter(F.length("a_norm") >= cfg.substring_min_len)
        .filter(F.expr("contains(b_norm, a_norm)"))
        .select("src", "dst", F.col("needle_tokens").alias("needle_len"))
    )

    return verified.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "needle_len",
    ).distinct()


def substring_edge_list(edges: DataFrame) -> DataFrame:
    """Edges in the common (src, dst, edge_kind, score) shape for clustering."""
    return edges.select(
        "src", "dst", F.lit("substring").alias("edge_kind"), F.lit(1.0).alias("score")
    )
