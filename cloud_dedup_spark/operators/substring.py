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
     shingles(A) ⊆ shingles(B).  In particular A's MINIMUM shingle hash is in
     B's shingle set.
  2. Candidates: join needles on ``anchor = array_min(shingles)`` against the
     exploded shingle inverted index of all (strictly longer) docs.  One
     anchor per needle keeps the join linear in corpus shingle volume.
  3. Prefilter: shingle-subset test ``array_except(needle, haystack) = ∅`` —
     pure JVM, kills almost all false candidates.
  4. Verify: exact ``contains(haystack_norm, needle_norm)`` on the normalized
     content of surviving pairs — the pass claims *verbatim* substring
     duplicates (north_rule), so the final test is the string itself.

Scale notes: the inverted index is |total distinct shingles per doc| rows —
linear in corpus token count, shuffled once on the 32-bit shingle key.  Hot
anchors (a needle whose min-shingle is boilerplate-common) fan out; the
per-anchor cap bounds that skew and is reported, not silent.  Exact-dup
representatives only: byte-identical copies were collapsed upstream, so one
found needle covers its whole exact family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_dedup_spark.config import DedupConfig

def substring_edges(
    reps: DataFrame, sigs: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Containment edges (src=needle, dst=haystack, src<dst after normalize).

    ``reps``: identity frame of exact representatives (file_id, content_norm).
    ``sigs``: signature table (file_id, shingles, n_shingles, n_tokens).
    Output: src, dst, needle_len (tokens), where needle content appears
    verbatim inside haystack content.
    """
    base = sigs.select("file_id", "shingles", "n_shingles", "n_tokens").filter(
        F.col("n_shingles") > 0
    )

    needles = (
        base.filter(F.col("n_tokens") >= cfg.substring_min_tokens)
        .select(
            F.col("file_id").alias("src"),
            F.col("shingles").alias("needle_sh"),
            F.col("n_tokens").alias("needle_tokens"),
            F.array_min("shingles").alias("anchor"),
        )
    )
    inverted = base.select(
        F.col("file_id").alias("dst"),
        F.col("n_tokens").alias("hay_tokens"),
        F.explode("shingles").alias("anchor"),
    )

    cand = (
        needles.join(inverted, "anchor")
        .filter(F.col("hay_tokens") > F.col("needle_tokens"))
        .select("src", "dst", "needle_sh", "needle_tokens")
    )

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
