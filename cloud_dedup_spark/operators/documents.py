"""Document-table dedup operators — the SQL-twinned curation surface.

These run over the driver's ``documents(doc_id, text, lang, source, n_chars)``
table and are deliberately relational (explode/join/agg, no UDFs) so each has
an exact DuckDB oracle twin in __spark_entry__.py.  The content pipeline
(plans/pipeline.py) is the scaled engine; these are the same semantics in
pure-SQL form, which also makes them the correctness anchors for the
MinHash/LSH channels (n-gram Jaccard here is the exact quantity MinHash
estimates).

Reference analogs: exact groups = MD5-equality channel (:257-265); source
overlap counts = pairwise duplicate counts A4 (:525-530); unique docs =
unique-file counts A5 (:533-546).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cloud_dedup_spark.functions.text import doc_fingerprint, quality_score


def exact_text_duplicates(docs: DataFrame) -> DataFrame:
    """Byte-identical (modulo whitespace) duplicate groups with ≥2 docs.

    Output: fingerprint, n_docs, n_sources, min_doc_id.  A representative
    id, NOT the member array: collect_list over a viral duplicate group
    (10^6 copies of one boilerplate page) is an unbounded single-executor
    aggregation buffer — the same fan-in shape the df_cap guards exist to
    prevent (round-4 review).  Members are retrievable by an equi-join on
    fingerprint when a caller actually needs them — a streamable scan, not
    a buffered array.  NULL-text docs are excluded: they are not
    byte-identical to each other, and NULL groups as equal in both engines.
    """
    return (
        docs.filter(F.col("text").isNotNull())
        .select(doc_fingerprint("text").alias("fingerprint"), "doc_id", "source")
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def _prefix_fp(k: int) -> F.Column:
    """First-k-token fingerprint — the near-dup blocking key shared by
    prefix_fingerprint_groups and select_keepers_quality."""
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    return F.md5(F.array_join(F.slice(toks, 1, k), " "))


def prefix_fingerprint_groups(docs: DataFrame, k: int = 10) -> DataFrame:
    """Blocking on the first-k-token fingerprint — the cheap rolling-hash
    style prefilter (reference cheap-before-expensive staging X3): docs whose
    openings are identical are near-dup candidates even when their tails
    diverge.  Output: prefix_fp, n_docs, n_sources, min_doc_id.
    """
    fp = _prefix_fp(k)
    return (
        docs.filter(F.col("text").isNotNull())
        .select(fp.alias("prefix_fp"), "doc_id", "source")
        .groupBy("prefix_fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def doc_ngrams(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-grams per doc: (doc_id, ng) — relational shingling.

    Tokens are whitespace-split lowercased words; the n-gram is the
    space-joined window.  Mirrors the signature stage's w-shingling in pure
    relational form.
    """
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("toks")
    ).filter(F.size("toks") >= n)
    ngram = F.expr(
        f"transform(sequence(1, size(toks) - {n - 1}), "
        f"i -> array_join(slice(toks, i, {n}), ' '))"
    )
    return (
        toks.select("doc_id", F.explode(ngram).alias("ng"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, df_cap: int | None = None
) -> DataFrame:
    """Doc pairs (a < b) with n-gram Jaccard ≥ threshold — exact, relational.

    |A ∩ B| via a self-join on shared n-grams (the blocking join: pairs with
    zero shared n-grams never materialize — same reason the reference blocks
    on (name,size) before comparing, X1); |A ∪ B| = |A| + |B| − |A ∩ B|.
    Output: doc_a, doc_b, jaccard (4dp).

    ``df_cap`` bounds join fan-out — the same guard the substring channel
    applies to its anchor index (substring.py): one boilerplate n-gram shared
    by f docs otherwise produces f² intermediate rows, the wrong shape at
    100× scale.  With a cap, the gram universe is restricted to n-grams whose
    document frequency ≤ cap BEFORE sizes and intersections are computed, so
    the result is the exact Jaccard over *discriminative* n-grams (a defined,
    oracle-reproducible semantics — not a lossy approximation of the uncapped
    one) and per-gram fan-out is ≤ cap².  Docs whose every n-gram is capped
    away leave the comparison (boilerplate-only bodies by definition).
    """
    grams = doc_ngrams(docs, n)
    if df_cap is not None:
        # document frequency as a window count over the gram shuffle itself —
        # one pass, no separate groupBy + semi-join back into the exploded
        # frame (which re-ran the tokenize+explode lineage; measured +50% on
        # the sf0.1 bench when the cap landed in round 2)
        w = Window.partitionBy("ng")
        grams = (
            grams.withColumn("_df", F.count(F.lit(1)).over(w))
            .filter(F.col("_df") <= df_cap)
            .drop("_df")
        )
    # materialized once (round-6): three consumers below (sizes, both join
    # sides) each re-ran the tokenize → explode → distinct → window lineage
    # — the narrow (doc_id, ng) rows are cheap to hold and the cut removes
    # two full recomputations per invocation
    grams = grams.localCheckpoint()
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ng"))
    a = grams.select(F.col("doc_id").alias("doc_a"), "ng")
    b = grams.select(F.col("doc_id").alias("doc_b"), "ng")
    inter = (
        a.join(b, "ng")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_ng").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_ng").alias("n_b"))
    # threshold on the RAW ratio; the 4dp rounding is presentation only —
    # filtering on the rounded value admitted pairs up to 5e-5 BELOW the
    # threshold (round(0.49995, 4) == 0.5), violating the ≥-threshold
    # contract (round-4 review).  IEEE double division is bit-identical in
    # the JVM and the oracle engine, so the boundary comparison is portable.
    raw = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(raw >= threshold)
        .select("doc_a", "doc_b", F.round(raw, 4).alias("jaccard"))
    )


def _distinct_source_fps(docs: DataFrame) -> DataFrame:
    """Distinct (fingerprint, source) pairs — the shared base of the overlap
    operators.  NULL-text docs carry no fingerprint and are excluded."""
    return (
        docs.filter(F.col("text").isNotNull())
        .select(doc_fingerprint("text").alias("fingerprint"), "source")
        .distinct()
    )


def _shared_fp_counts(fp: DataFrame) -> DataFrame:
    """Per source pair (a < b): count of fingerprints present in both.  One
    definition for both overlap operators (they had drifted into two copies,
    one with a needless countDistinct over already-distinct rows —
    round-4 review)."""
    a = fp.select("fingerprint", F.col("source").alias("source_a"))
    b = fp.select("fingerprint", F.col("source").alias("source_b"))
    return (
        a.join(b, "fingerprint")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def source_overlap_counts(docs: DataFrame) -> DataFrame:
    """Per source pair: number of fingerprints present in both (A4 analog)."""
    return _shared_fp_counts(_distinct_source_fps(docs))


def source_set_relationships(docs: DataFrame) -> DataFrame:
    """Per source pair: fingerprint-set sizes, overlap, and the E2 set
    relationship (reference classify, src/cloud_duplicate_analyzer.py:597-622,
    applied to document corpora instead of folder name sets — the same
    CASE ladder as ``rollup.folder_comparisons`` pair_rels).

    Output: source_a, source_b (a < b), n_a, n_b, n_shared, relationship in
    ('identical' | 'subset' | 'superset' | 'overlap').  Disjoint pairs never
    materialize (the fingerprint equi-join is the blocking join — same scale
    shape as ``source_overlap_counts``: fan-out per fingerprint is bounded
    by n_sources², and the per-source size frame is broadcast-tiny).
    """
    fp = _distinct_source_fps(docs)
    sizes = fp.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    shared = _shared_fp_counts(fp)
    sa = F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a")))
    sb = F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b")))
    return (
        shared.join(sa, "source_a")
        .join(sb, "source_b")
        .withColumn(
            "relationship",
            F.when(
                (F.col("n_shared") == F.col("n_a"))
                & (F.col("n_shared") == F.col("n_b")),
                F.lit("identical"),
            )
            .when(F.col("n_shared") == F.col("n_a"), F.lit("subset"))
            .when(F.col("n_shared") == F.col("n_b"), F.lit("superset"))
            .otherwise(F.lit("overlap")),
        )
        .select("source_a", "source_b", "n_a", "n_b", "n_shared", "relationship")
    )


def unique_docs_per_source(docs: DataFrame) -> DataFrame:
    """Docs whose fingerprint appears exactly once in the corpus, per source
    (A5 analog).

    Conditional count instead of the old anti-join-then-group: a source
    whose every document is duplicated must report ``n_unique_docs = 0``,
    not vanish from the output (a consumer could not tell a fully-duplicated
    source from a missing one — round-4 review).  Same single shuffle on
    fingerprint (window count) + one on source."""
    with_fp = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", "source", doc_fingerprint("text").alias("fingerprint")
    )
    cnt = F.count(F.lit(1)).over(Window.partitionBy("fingerprint"))
    return (
        with_fp.withColumn("_cnt", cnt)
        .groupBy("source")
        .agg(
            F.count(F.when(F.col("_cnt") == 1, F.lit(1))).alias("n_unique_docs")
        )
    )


def token_df_topk(docs: DataFrame, k: int = 100) -> DataFrame:
    """Top-``k`` vocabulary tokens by document frequency — the corpus
    vocabulary profile (what the df caps in ``ngram_jaccard_pairs`` and the
    substring anchor index are sized against, surfaced as a first-class
    query).  Output: token, df; ties broken by token ascending so the cut is
    deterministic on any engine.

    Scale shape: per-doc token dedup is LOCAL (``array_distinct`` inside the
    row, no shuffle), the document-frequency count is one map-side-combinable
    groupBy, and the global top-k is orderBy+limit — Spark plans that as
    TakeOrderedAndProject (per-partition heaps + a k-row driver merge), never
    a full sort shuffle.  Empty tokens (split artifacts of blank text) are
    dropped; NULL-text docs contribute nothing.
    """
    toks = docs.filter(F.col("text").isNotNull()).select(
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+"))
        ).alias("token")
    )
    return (
        toks.filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("token").asc())
        .limit(k)
    )


def documents_as_files(docs: DataFrame) -> DataFrame:
    """Adapt the documents table to the pipeline's files(repo,path,...) shape
    so the full MinHash/LSH/cluster engine runs on it unchanged.  NULL-text
    rows are dropped here — forwarded, they would NULL the content_sha256
    identity column (breaking the per-row invariant) and weld into one bogus
    exact group (round-4 review; same class as documents_as_media's guard)."""
    return docs.filter(F.col("text").isNotNull()).select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.lit("0").alias("commit"),
        F.coalesce(F.col("lang"), F.lit("txt")).alias("lang"),
        F.col("text").alias("content"),
    )


def select_keepers(docs: DataFrame) -> DataFrame:
    """Survivor selection — the step AFTER duplicate detection in a training-
    data pipeline: each exact-duplicate group keeps exactly one document and
    drops the rest.

    Policy (deterministic, total): keep the LONGEST raw text — duplicates
    here are whitespace-normalized-equal, so the longest member carries the
    most original formatting — breaking ties on min doc_id.  Singleton
    groups keep their only member (n_dropped = 0), so the output is the
    complete post-dedup corpus manifest: one row per surviving document.

    One window over the fingerprint partition (single shuffle); the same
    row_number-over-ordered-partition shape as the pipeline's exact-rep
    pick, in pure-SQL form for the DuckDB twin.

    Output: fingerprint, keeper_doc_id, n_docs, n_dropped.

    NULL-text docs are each their own singleton group: window PARTITION BY
    treats NULLs as equal, so partitioning on the bare fingerprint kept ONE
    of all NULL-text docs and silently deleted the rest from the manifest
    (round-4 review).  The surrogate key cannot collide with a real
    fingerprint (md5 hex never contains a NUL byte).
    """
    ranked = docs.select(
        doc_fingerprint("text").alias("fingerprint"),
        "doc_id",
        F.length("text").alias("_n"),
    )
    pkey = F.coalesce(
        F.col("fingerprint"),
        F.concat(F.lit("\x00null:"), F.col("doc_id").cast("string")),
    )
    w = Window.partitionBy(pkey).orderBy(
        F.col("_n").desc(), F.col("doc_id").asc()
    )
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .withColumn("n_docs", F.count(F.lit(1)).over(Window.partitionBy(pkey)))
        .filter(F.col("rn") == 1)
        .select(
            "fingerprint",
            F.col("doc_id").alias("keeper_doc_id"),
            "n_docs",
            (F.col("n_docs") - 1).alias("n_dropped"),
        )
    )


def select_keepers_quality(docs: DataFrame, k: int = 10) -> DataFrame:
    """Quality-AWARE survivor selection — the curation policy a training-data
    pipeline actually runs: within each near-dup block, keep the HIGHEST-
    QUALITY member, not merely the longest.

    The group key is the first-``k``-token prefix fingerprint (the blocking
    key of :func:`prefix_fingerprint_groups`) rather than the exact
    whitespace-normalized fingerprint: exact-dup group members are
    whitespace-variants of one text, so every quality signal (token counts,
    punct/stopword ratios) is constant within the group and the policy would
    degenerate to ``select_keepers``'s longest-text rule.  Prefix blocks
    group documents whose openings match but whose tails diverge — exactly
    where quality (a spam tail of punctuation soup vs a clean continuation)
    should pick the survivor.

    Policy (deterministic, total): max ``quality_score`` → tie: longest raw
    text → tie: min doc_id.  Singleton blocks keep their member, so the
    output is the complete post-curation manifest.  NULL-text docs are each
    their own singleton group (same surrogate-key discipline as
    :func:`select_keepers`; their quality is NULL, which the singleton
    partition makes irrelevant).

    One window over the block partition (single shuffle); pure Column
    quality arithmetic (functions/text.py) — SQL-expressible, so the DuckDB
    twin hash-checks the policy end-to-end.

    Output: prefix_fp, keeper_doc_id, quality, n_docs, n_dropped.
    """
    ranked = docs.select(
        _prefix_fp(k).alias("prefix_fp"),
        "doc_id",
        quality_score("text").alias("quality"),
        F.length("text").alias("_n"),
    )
    pkey = F.coalesce(
        F.col("prefix_fp"),
        F.concat(F.lit("\x00null:"), F.col("doc_id").cast("string")),
    )
    w = Window.partitionBy(pkey).orderBy(
        F.col("quality").desc(), F.col("_n").desc(), F.col("doc_id").asc()
    )
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .withColumn("n_docs", F.count(F.lit(1)).over(Window.partitionBy(pkey)))
        .filter(F.col("rn") == 1)
        .select(
            "prefix_fp",
            F.col("doc_id").alias("keeper_doc_id"),
            "quality",
            "n_docs",
            (F.col("n_docs") - 1).alias("n_dropped"),
        )
    )
