"""Reference decision-table parity — one test per classify_pair cell
(reference tests/test_cloud_duplicate_analyzer.py:19-99 TestClassifyPair),
plus blocking-join / group-fold / second-pass behavior.

The expected values come from the decision table in docs/how-it-works.md:30-38
and code src/cloud_duplicate_analyzer.py:231-268 (re-derived, not ported)."""

from __future__ import annotations

import pytest

from cloud_dedup_spark.config import MetaConfig
from cloud_dedup_spark.operators.metadata import (
    candidate_pairs,
    duplicate_groups_meta,
    mixed_type_second_pass,
)

SCHEMA = (
    "service string, rel_path string, name string, name_orig string, "
    "size long, mtime double, is_symlink boolean, symlink_target string, "
    "content_md5 string"
)


def _rec(service, rel_path="dir/f.txt", size=100, mtime=1000.0,
         is_symlink=False, symlink_target=None, content_md5="aaaa"):
    name = rel_path.rsplit("/", 1)[-1].lower()
    return (service, rel_path, name, name.upper(), size, mtime,
            is_symlink, symlink_target, content_md5)


def _classify(spark, rec_a, rec_b, **cfg_kwargs):
    df = spark.createDataFrame([rec_a, rec_b], SCHEMA)
    rows = candidate_pairs(df, MetaConfig(**cfg_kwargs)).collect()
    assert len(rows) == 1, "pair did not block on (name, size)"
    return rows[0]["content_match"], rows[0]["version_status"]


# --- decision table cells (docs/how-it-works.md:30-38) ---

def test_identical_same(spark):
    assert _classify(spark, _rec("a"), _rec("b")) == ("identical", "same")


def test_identical_diverged(spark):
    got = _classify(spark, _rec("a", mtime=1000.0), _rec("b", mtime=99999.0))
    assert got == ("identical", "diverged")


def test_different_diverged(spark):
    got = _classify(spark, _rec("a", content_md5="aaaa", mtime=0.0),
                    _rec("b", content_md5="bbbb", mtime=99999.0))
    assert got == ("different", "diverged")


def test_different_phantom_same_mtime(spark):
    """Same size + same mtime + different bytes — 'the most dangerous case'
    (:223-224): only content hashing can reveal it."""
    got = _classify(spark, _rec("a", content_md5="aaaa"),
                    _rec("b", content_md5="bbbb"))
    assert got == ("different", "phantom")


def test_mtime_fuzz_boundary_inclusive(spark):
    got = _classify(spark, _rec("a", mtime=1000.0), _rec("b", mtime=1005.0))
    assert got == ("identical", "same")  # |Δ| == fuzz → within
    got = _classify(spark, _rec("a", mtime=1000.0), _rec("b", mtime=1005.001))
    assert got == ("identical", "diverged")


def test_empty_file_fast_path(spark):
    """size==0 → identical/same regardless of mtime AND of use_checksum
    (:250-252; reference tests :79-83, :94-99)."""
    a = _rec("a", size=0, mtime=0.0, content_md5="x")
    b = _rec("b", size=0, mtime=99999.0, content_md5="y")
    assert _classify(spark, a, b) == ("identical", "same")
    assert _classify(spark, a, b, use_checksum=False) == ("identical", "same")


def test_no_checksum_mode(spark):
    a, b = _rec("a"), _rec("b", content_md5="bbbb")
    assert _classify(spark, a, b, use_checksum=False) == ("unverified", "same")
    b2 = _rec("b", mtime=99999.0, content_md5="bbbb")
    assert _classify(spark, a, b2, use_checksum=False) == ("unverified", "diverged")


def test_hash_failure_fallback(spark):
    """Unreadable MD5 (empty string, :109-110) → unverified by mtime (:260-262)."""
    a = _rec("a", content_md5="")
    assert _classify(spark, a, _rec("b")) == ("unverified", "same")
    b = _rec("b", mtime=99999.0)
    assert _classify(spark, a, b) == ("unverified", "diverged")


def test_symlink_target_identical(spark):
    a = _rec("a", size=-1, is_symlink=True, symlink_target="/x")
    b = _rec("b", size=-1, is_symlink=True, symlink_target="/x")
    assert _classify(spark, a, b) == ("symlink", "target_identical")


def test_symlink_target_diverged(spark):
    a = _rec("a", size=-1, is_symlink=True, symlink_target="/x")
    b = _rec("b", size=-1, is_symlink=True, symlink_target="/y")
    assert _classify(spark, a, b) == ("symlink", "target_diverged")


def test_symlink_both_dangling_diverged(spark):
    """Both targets None → target_diverged, NOT identical (pinned by reference
    tests/test_cloud_duplicate_analyzer.py:358-371)."""
    a = _rec("a", size=-1, is_symlink=True, symlink_target=None)
    b = _rec("b", size=-1, is_symlink=True, symlink_target=None)
    assert _classify(spark, a, b) == ("symlink", "target_diverged")


def test_mixed_type_conflict(spark):
    a = _rec("a", size=-1, is_symlink=True, symlink_target="/x")
    b = _rec("b", size=-1, is_symlink=False)
    assert _classify(spark, a, b) == ("mixed_type", "conflict")


# --- blocking / filters / group fold ---

def test_blocking_requires_name_and_size(spark):
    df = spark.createDataFrame(
        [_rec("a", size=100), _rec("b", size=200)], SCHEMA)
    assert candidate_pairs(df).count() == 0


def test_hidden_and_dsstore_filtered(spark):
    df = spark.createDataFrame(
        [_rec("a", rel_path="d/.hidden"), _rec("b", rel_path="d/.hidden"),
         _rec("a", rel_path="d/.DS_Store"), _rec("b", rel_path="d/.DS_Store")],
        SCHEMA)
    assert candidate_pairs(df, MetaConfig(skip_hidden=True)).count() == 0


def test_first_hit_per_key(spark):
    """Two same-(name,size) files in ONE service: only the first (by rel_path)
    pairs with the other service (:323-325)."""
    df = spark.createDataFrame(
        [_rec("a", rel_path="z/f.txt"), _rec("a", rel_path="a/f.txt"),
         _rec("b", rel_path="x/f.txt")], SCHEMA)
    rows = candidate_pairs(df).collect()
    assert len(rows) == 1
    assert rows[0]["a"]["rel_path"] == "a/f.txt"  # lexicographically first


def test_group_worst_case_fold(spark):
    """3 services: a≡b identical, but c differs → group label 'different'
    (precedence different > unverified > identical, :334-394)."""
    df = spark.createDataFrame(
        [_rec("a"), _rec("b"), _rec("c", content_md5="cccc", mtime=99999.0)],
        SCHEMA)
    grp = duplicate_groups_meta(df).collect()
    assert len(grp) == 1
    row = grp[0]
    assert row["content_match"] == "different"
    assert row["version_status"] == "diverged"
    assert row["group_kind"] == "conflict"
    assert row["services"] == ["a", "b", "c"]
    assert row["newest_in"] == "c"
    assert row["age_difference_days"] == round((99999.0 - 1000.0) / 86400, 2)


def test_newest_in_null_when_same(spark):
    df = spark.createDataFrame([_rec("a"), _rec("b")], SCHEMA)
    row = duplicate_groups_meta(df).first()
    assert row["content_match"] == "identical" and row["newest_in"] is None


def test_mixed_type_second_pass(spark):
    """File vs symlink at the same rel_path: sizes (-1 vs 100) defeat the
    (name,size) block; the rel_path pass catches them (:435-482)."""
    f = _rec("a", rel_path="d/Link.txt", size=100)
    s = _rec("b", rel_path="d/link.txt", size=-1, is_symlink=True,
             symlink_target="/elsewhere")
    df = spark.createDataFrame([f, s], SCHEMA)
    assert candidate_pairs(df).count() == 0  # primary channel misses
    handled = spark.createDataFrame([], "rel_path string")
    rows = mixed_type_second_pass(df, handled).collect()
    assert len(rows) == 1
    assert rows[0]["content_match"] == "mixed_type"
    assert rows[0]["version_status"] == "conflict"


def test_mixed_type_pass_excludes_by_rel_path_not_name_size(spark):
    """Round-4 review (reference :439-450): exclusion is by handled
    REL_PATH.  s2's file shares a handled (name,size) key — grouped at a
    DIFFERENT rel_path — but its own rel_path is unhandled, so its conflict
    with s3's symlink there must still be emitted."""
    rows = [
        _rec("s1", rel_path="x/a.txt", size=5),
        _rec("s2", rel_path="y/a.txt", size=5),   # grouped with s1 at key (a.txt, 5)
        _rec("s3", rel_path="y/a.txt", size=-1, is_symlink=True,
             symlink_target="/t"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    # the (name,size) group's rel_path is its first record's (reference
    # g['rel_path']): x/a.txt — y/a.txt stays unhandled
    handled = spark.createDataFrame([("x/a.txt",)], "rel_path string")
    out = mixed_type_second_pass(df, handled).collect()
    assert len(out) == 1
    assert {out[0]["a"]["service"], out[0]["b"]["service"]} == {"s2", "s3"}


def test_unverified_groups_are_duplicates_not_conflicts(spark):
    """Reference :430-433: only 'different' routes to conflicts — with
    use_checksum=False every group is 'unverified' and must still be
    reported as a duplicate (round-4 review: routing them to conflict
    reported ZERO duplicates in no-checksum mode)."""
    from cloud_dedup_spark.config import MetaConfig

    df = spark.createDataFrame([_rec("a"), _rec("b")], SCHEMA)
    row = duplicate_groups_meta(df, MetaConfig(use_checksum=False)).first()
    assert row["content_match"] == "unverified"
    assert row["group_kind"] == "duplicate"


def test_symlink_group_worst_case_is_target_diverged(spark):
    """A 3-service symlink group with one diverged target must fold to
    'target_diverged' — the unranked alphabetical tiebreak picked
    'target_identical' (round-4 review)."""
    rows = [
        _rec("s1", size=-1, is_symlink=True, symlink_target="/x"),
        _rec("s2", size=-1, is_symlink=True, symlink_target="/y"),
        _rec("s3", size=-1, is_symlink=True, symlink_target="/y"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    row = duplicate_groups_meta(df).first()
    assert row["version_status"] == "target_diverged"
    assert row["group_kind"] == "symlink"


def test_ds_store_filter_is_case_sensitive(spark):
    """Reference :148-149 skips exactly '.DS_Store'; a file literally named
    '.ds_store' is kept (skip_hidden=False)."""
    from cloud_dedup_spark.config import MetaConfig

    def raw(service, rel_path, name_orig, size):
        return (service, rel_path, name_orig.lower(), name_orig, size, 1000.0,
                False, None, "aaaa")

    rows = [
        raw("a", "d/.ds_store", ".ds_store", 100),
        raw("b", "d/.ds_store", ".ds_store", 100),
        raw("a", "e/.DS_Store", ".DS_Store", 200),
        raw("b", "e/.DS_Store", ".DS_Store", 200),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    cfg = MetaConfig(skip_hidden=False)
    kept = candidate_pairs(df, cfg).collect()
    # the literal .ds_store pair survives; the true .DS_Store rows are skipped
    assert len(kept) == 1
    assert kept[0]["a"]["rel_path"] == "d/.ds_store"
