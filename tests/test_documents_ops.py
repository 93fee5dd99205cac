"""documents-table operators: set-relationship classification (E2 analog).

The driver gate (source_set_relationships oracle) exercises the classifier
on the synthetic corpus where only 'overlap' occurs; this pins all four
relationship classes with constructed fingerprint sets, the same discipline
as the reference's folder-visibility scenarios
(/root/reference/tests/test_unique_folder_visibility.py)."""

from __future__ import annotations

from cloud_dedup_spark.operators.documents import source_set_relationships

SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def _doc(i, text, source):
    return (i, text, "en", source, len(text))


def test_all_four_relationship_classes(spark):
    # identical: A == B; subset: C ⊂ D; superset comes out of (D, C) ordering
    # flipped by source name; overlap: E ∩ F partial both ways.
    rows = [
        _doc(1, "alpha text one", "a_src"),
        _doc(2, "alpha text two", "a_src"),
        _doc(3, "alpha text one", "b_src"),
        _doc(4, "alpha text two", "b_src"),
        # c_src ⊂ d_src
        _doc(5, "common doc x", "c_src"),
        _doc(6, "common doc x", "d_src"),
        _doc(7, "extra doc only d", "d_src"),
        # e_src / f_src partial overlap
        _doc(8, "shared ef", "e_src"),
        _doc(9, "only e", "e_src"),
        _doc(10, "shared ef", "f_src"),
        _doc(11, "only f", "f_src"),
        # g_src ⊃ h_src with g < h lexically → 'subset' seen from (g,h)?
        # no — g has more: n_shared == n_b → 'superset'
        _doc(12, "base gh", "g_src"),
        _doc(13, "g extra", "g_src"),
        _doc(14, "base gh", "h_src"),
    ]
    docs = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_a"], r["n_b"], r["n_shared"], r["relationship"]
        )
        for r in source_set_relationships(docs).collect()
    }
    assert got[("a_src", "b_src")] == (2, 2, 2, "identical")
    assert got[("c_src", "d_src")] == (1, 2, 1, "subset")
    assert got[("g_src", "h_src")] == (2, 1, 1, "superset")
    assert got[("e_src", "f_src")] == (2, 2, 1, "overlap")
    # disjoint pairs never materialize
    assert ("a_src", "c_src") not in got


def test_duplicate_texts_within_source_count_once(spark):
    rows = [
        _doc(1, "same body", "x_src"),
        _doc(2, "same body", "x_src"),  # dup within source: one fingerprint
        _doc(3, "same body", "y_src"),
    ]
    docs = spark.createDataFrame(rows, SCHEMA)
    out = source_set_relationships(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"], r["n_shared"]) == (1, 1, 1)
    assert r["relationship"] == "identical"


def test_select_keepers_policy_and_singletons(spark):
    from cloud_dedup_spark.operators.documents import select_keepers

    rows = [
        # one normalized group, three raw variants: doc 2 is LONGEST raw
        # (extra internal whitespace collapses in the fingerprint) → keeper
        _doc(1, "dup body here", "a"),
        (2, "dup  body   here", "en", "b", 16),
        _doc(3, "dup body here", "c"),
        # tie group: equal lengths → min doc_id keeps
        _doc(10, "tie text", "a"),
        _doc(11, "tie text", "b"),
        # singleton keeps itself with nothing dropped
        _doc(20, "unique text", "a"),
    ]
    docs = spark.createDataFrame(rows, SCHEMA)
    out = {r["keeper_doc_id"]: r for r in select_keepers(docs).collect()}
    assert set(out) == {2, 10, 20}
    assert (out[2]["n_docs"], out[2]["n_dropped"]) == (3, 2)
    assert (out[10]["n_docs"], out[10]["n_dropped"]) == (2, 1)
    assert (out[20]["n_docs"], out[20]["n_dropped"]) == (1, 0)


def test_select_keepers_quality_prefers_quality_over_length(spark):
    """Round-4 verdict item 5: the quality-aware policy must DIVERGE from the
    longest-text rule — within a prefix block the highest-quality member
    wins even when another member is (much) longer."""
    from cloud_dedup_spark.operators.documents import select_keepers_quality

    prefix = "the quick brown fox and the lazy dog ran to"
    # doc 1: clean English continuation — ≥50 tokens, stopwords in band,
    # near-zero punctuation → quality ≈ 0.97
    good = prefix + " " + " ".join(
        ["the town and it was a fine day to run in the sun with a friend"] * 4
    )
    # doc 2: LONGER, but the tail is punctuation soup → punct_ratio ≈ 1 on
    # the tail floor drags quality to ≈ 0.55
    bad = prefix + " " + " ".join(["!!!! ???? %%%% ####"] * 40)
    assert len(bad) > len(good)
    rows = [
        _doc(1, good, "a"),
        _doc(2, bad, "b"),
        # singleton block keeps itself
        _doc(20, "completely unrelated words describing another topic here",
             "a"),
        # NULL text: its own singleton group, never welded or dropped
        (30, None, "en", "c", 0),
    ]
    docs = spark.createDataFrame(rows, SCHEMA)
    out = {r["keeper_doc_id"]: r for r in select_keepers_quality(docs).collect()}
    assert set(out) == {1, 20, 30}
    assert (out[1]["n_docs"], out[1]["n_dropped"]) == (2, 1)
    assert out[1]["quality"] > 0.8
    assert (out[30]["n_docs"], out[30]["n_dropped"]) == (1, 0)


def test_null_text_semantics_across_document_operators(spark):
    """Round-4 review: NULL-text docs must never weld into one phantom
    'duplicate' group (PARTITION/GROUP BY treats NULLs as equal), must not
    be silently deleted by survivor selection, and must count toward no
    unique-doc tally."""
    from cloud_dedup_spark.operators.documents import (
        documents_as_files,
        exact_text_duplicates,
        prefix_fingerprint_groups,
        select_keepers,
        source_overlap_counts,
        unique_docs_per_source,
    )

    rows = [
        _doc(1, "same body", "s1"),
        _doc(2, "same body", "s2"),
        _doc(3, "only here", "s1"),
        (4, None, "en", "s1", 0),
        (5, None, "en", "s2", 0),
        (6, None, "en", "s3", 0),
    ]
    docs = spark.createDataFrame(rows, SCHEMA)
    # exact dupes: only the real pair; never a 3-member NULL group
    groups = exact_text_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2 and groups[0]["min_doc_id"] == 1
    assert prefix_fingerprint_groups(docs).count() == 1
    # keepers: NULL-text docs are singleton KEEPERS (manifest-complete),
    # not collateral of one welded group
    keepers = {r["keeper_doc_id"]: r for r in select_keepers(docs).collect()}
    assert set(keepers) == {1, 3, 4, 5, 6}
    assert keepers[4]["n_dropped"] == 0 and keepers[4]["n_docs"] == 1
    # unique counts: a fully-duplicated source (s2) reports 0 instead of
    # vanishing; a source with ONLY NULL-text docs (s3) contributes nothing
    # to the dedup corpus and is rightly absent
    uniq = {r["source"]: r["n_unique_docs"] for r in unique_docs_per_source(docs).collect()}
    assert uniq == {"s1": 1, "s2": 0}
    # overlap: NULL never a shared fingerprint
    assert source_overlap_counts(docs).collect()[0]["n_shared"] == 1
    # adapter: NULL text never reaches the pipeline's identity columns
    assert documents_as_files(docs).filter("content IS NULL").count() == 0
    assert documents_as_files(docs).count() == 3


def test_token_df_topk_dedup_ties_and_limit(spark):
    """Per-doc dedup is local (a token repeated inside one doc counts once),
    empty/NULL texts contribute nothing, and the top-k cut is deterministic
    (df desc, token asc) so ties at the boundary pick the same rows on any
    engine."""
    from cloud_dedup_spark.operators.documents import token_df_topk

    rows = [
        _doc(1, "apple apple banana", "s1"),
        _doc(2, "banana cherry", "s1"),
        _doc(3, "", "s1"),
        (4, None, "en", "s1", 0),
    ]
    docs = spark.createDataFrame(rows, SCHEMA)
    full = [(r["token"], r["df"]) for r in token_df_topk(docs, k=10).collect()]
    assert full == [("banana", 2), ("apple", 1), ("cherry", 1)]
    # tie at the k boundary: apple < cherry lexically wins the last slot
    top2 = [(r["token"], r["df"]) for r in token_df_topk(docs, k=2).collect()]
    assert top2 == [("banana", 2), ("apple", 1)]
