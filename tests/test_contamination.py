"""Benchmark decontamination (operators/contamination.py).

The driver oracle (contaminated_docs) hash-checks the happy path against a
naive DuckDB containment twin; these pin the semantics SQL cannot express —
the anchor-df cap's documented drop of template-dominated snippets — plus
the token-strict equality exclusion and the deterministic snippet synthesis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_dedup_spark.config import DedupConfig
from cloud_dedup_spark.operators.contamination import (
    benchmark_snippets,
    contaminated_docs,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"
BENCH_SCHEMA = "bench_id long, snippet string"

# 24 distinctive words: > substring_min_tokens sig tokens, > 64 normalized
# chars, and every shingle is corpus-rare unless deliberately replicated
SNIPPET = " ".join(f"zx{i}token" for i in range(24))


def _doc(i, text, source="src_a"):
    return (i, text, "en", source, len(text))


def _pairs(df):
    return {(r["bench_id"], r["doc_id"]) for r in df.collect()}


def test_embedded_snippet_detected_exact_match_excluded(spark):
    filler_front = " ".join(f"front{i}w" for i in range(10))
    filler_back = " ".join(f"back{i}w" for i in range(10))
    docs = spark.createDataFrame(
        [
            # embeds the snippet mid-document → contaminated
            _doc(1, f"{filler_front} {SNIPPET} {filler_back}"),
            # clean doc, enough tokens to be a haystack candidate
            _doc(2, " ".join(f"clean{i}word" for i in range(40))),
            # byte-identical to the snippet: equal token counts — the exact
            # channel's finding, NOT a containment (token-strict gate)
            _doc(3, SNIPPET),
        ],
        DOC_SCHEMA,
    )
    bench = spark.createDataFrame([(100, SNIPPET)], BENCH_SCHEMA)
    assert _pairs(contaminated_docs(docs, bench)) == {(100, 1)}


def test_template_dominated_snippet_dropped_by_anchor_cap(spark):
    # the snippet appears verbatim in MORE docs than the anchor-df cap, so
    # every candidate anchor is corpus-common and the needle is dropped —
    # the documented linearity guard (matches are near-dup-channel work).
    docs = spark.createDataFrame(
        [
            _doc(i, f"host{i}head {SNIPPET} host{i}tail extra{i} pad{i}")
            for i in range(1, 6)
        ],
        DOC_SCHEMA,
    )
    bench = spark.createDataFrame([(100, SNIPPET)], BENCH_SCHEMA)
    cfg = DedupConfig(substring_max_anchor_df=2)
    assert _pairs(contaminated_docs(docs, bench, cfg)) == set()
    # sanity: with the cap above the plant count the same input is found
    cfg_open = DedupConfig(substring_max_anchor_df=100)
    assert _pairs(contaminated_docs(docs, bench, cfg_open)) == {
        (100, i) for i in range(1, 6)
    }


def test_benchmark_snippets_deterministic_slice(spark):
    long_words = [f"w{i}" for i in range(40)]
    docs = spark.createDataFrame(
        [
            _doc(0, " ".join(long_words)),     # selected (0 % 29 == 0)
            _doc(1, " ".join(long_words)),     # wrong modulus
            _doc(29, "too short"),             # selected id, too few tokens
            (58, None, "en", "src_a", 0),      # NULL text skipped
        ],
        DOC_SCHEMA,
    )
    got = {r["bench_id"]: r["snippet"] for r in benchmark_snippets(docs).collect()}
    # tokens 5..28 of the lowercased whitespace split (1-based, 24 tokens)
    assert got == {0: " ".join(long_words[4:28])}


def test_corpus_index_scan_only_never_shuffled(spark):
    # the benchmark anchors must reach the exploded corpus shingle index
    # through a BROADCAST join (substring_edges delta-mode contract): a
    # sort-merge join keyed on `sh` would shuffle the corpus-sized index per
    # decontamination run.  Content-verification joins (keyed src/dst) may
    # merge-join — their inputs are broadcast-semi-filtered to the
    # subset-surviving pairs (delta-bounded; the fold's shuffle-growth test
    # pins that machinery) — so the assertion is key-specific.
    import re

    docs = spark.createDataFrame(
        [_doc(1, " ".join(f"scan{i}tok" for i in range(40)))], DOC_SCHEMA
    )
    bench = spark.createDataFrame([(9, SNIPPET)], BENCH_SCHEMA)
    result = contaminated_docs(docs, bench)
    plan = result._sc._jvm.PythonSQLUtils.explainString(
        result._jdf.queryExecution(), "formatted"
    )
    smj_keys = re.findall(
        r"SortMergeJoin[\s\S]{0,300}?Left keys \[\d+\]: \[(\w+)#", plan
    )
    assert "sh" not in smj_keys, smj_keys
    # the module's own mapping joins are hint-broadcast; nothing merge-joins
    # on the surrogate endpoints it introduces
    assert "doc_end" not in smj_keys and "needle" not in smj_keys
