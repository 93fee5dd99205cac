"""Signature stage: determinism, identity, similarity monotonicity.

Analog of the reference's scalar-helper tests (tests/test_coverage_gaps.py:41-82
tests md5/human_size/fmt_ts directly) — we drive the UDF internals as plain
functions plus the Spark stage end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from cloud_dedup_spark.config import DedupConfig
from cloud_dedup_spark.functions.normalize import with_identity
from cloud_dedup_spark.operators.signatures import (
    _hash_params,
    _minhash,
    _oph_minhash,
    _shingle_hashes,
    _simhash,
    _TOKEN_RE,
    compute_signatures,
)

CFG = DedupConfig()


def _sig_of(text: str, mode: str = "universal") -> np.ndarray:
    tokens = _TOKEN_RE.findall(text.lower())
    sh = _shingle_hashes(tokens, CFG.shingle_size, {})
    if mode == "oph":
        return _oph_minhash(sh, CFG.num_hashes, CFG.minhash_seed)
    a, b = _hash_params(CFG)
    return _minhash(sh, a, b)


def test_minhash_deterministic():
    t = "def load_parse(a, b): return a + b"
    assert np.array_equal(_sig_of(t), _sig_of(t))


def test_minhash_identical_vs_disjoint():
    base = " ".join(f"tok{i} alpha beta gamma delta" for i in range(40))
    other = " ".join(f"zzz{i} omega psi chi phi" for i in range(40))
    sim_frac = (_sig_of(base) == _sig_of(base)).mean()
    dis_frac = (_sig_of(base) == _sig_of(other)).mean()
    assert sim_frac == 1.0
    assert dis_frac < 0.1


@pytest.mark.parametrize("mode", ["universal", "oph"])
def test_minhash_estimates_jaccard(mode):
    """MinHash agreement fraction ≈ true Jaccard — both estimator modes."""
    words = [f"w{i}" for i in range(300)]
    a_txt = " ".join(words)
    b_txt = " ".join(words[:240] + [f"x{i}" for i in range(60)])
    tokens_a = _TOKEN_RE.findall(a_txt)
    tokens_b = _TOKEN_RE.findall(b_txt)
    sh_a = set(_shingle_hashes(tokens_a, CFG.shingle_size, {}).tolist())
    sh_b = set(_shingle_hashes(tokens_b, CFG.shingle_size, {}).tolist())
    true_j = len(sh_a & sh_b) / len(sh_a | sh_b)
    est_j = (_sig_of(a_txt, mode) == _sig_of(b_txt, mode)).mean()
    assert abs(est_j - true_j) < 0.15  # 128 hashes → σ ≈ 0.044


def test_oph_deterministic_and_distinct():
    t = "def load_parse(a, b): return a + b"
    assert np.array_equal(_sig_of(t, "oph"), _sig_of(t, "oph"))
    other = "completely unrelated words forming different shingles entirely here"
    assert not np.array_equal(_sig_of(t, "oph"), _sig_of(other, "oph"))


def test_oph_densification_fills_all_bins():
    """Short docs leave most of the 128 bins empty; densification must fill
    every bin deterministically (identical short docs → identical sigs)."""
    sh = _shingle_hashes(["a", "b", "c", "d", "e", "f"], CFG.shingle_size, {})
    sig = _oph_minhash(sh, CFG.num_hashes, CFG.minhash_seed)
    assert len(sig) == CFG.num_hashes
    assert (sig != np.iinfo(np.int64).max).all()
    sig2 = _oph_minhash(sh.copy(), CFG.num_hashes, CFG.minhash_seed)
    assert np.array_equal(sig, sig2)


def test_simhash_hamming_small_for_near_edit():
    base = " ".join(f"ident_{i} value_{i}" for i in range(100))
    near = base.replace("ident_5", "renamed_5", 1)
    far = " ".join(f"other_{i} thing_{i}" for i in range(100))
    fp = _simhash(_TOKEN_RE.findall(base), {})
    fp_near = _simhash(_TOKEN_RE.findall(near), {})
    fp_far = _simhash(_TOKEN_RE.findall(far), {})
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")
    assert ham(fp, fp_near) <= 3
    assert ham(fp, fp_far) > 10


def test_empty_and_short_content():
    assert _shingle_hashes([], CFG.shingle_size, {}).size == 0
    # shorter than one shingle: ONE rolling hash, emitted as its two 32-bit
    # halves so short docs keep full 64-bit discrimination (a single folded
    # value collides two unrelated short docs at 2^-32 with an unrejectable
    # hashed-Jaccard of 1.0 — round-4 review)
    short = _shingle_hashes(["a", "b"], CFG.shingle_size, {})
    assert short.size == 2
    # identical short docs share both halves (J=1); different short docs
    # share neither
    short2 = _shingle_hashes(["a", "b"], CFG.shingle_size, {})
    other = _shingle_hashes(["a", "c"], CFG.shingle_size, {})
    assert (short == short2).all()
    assert len(np.intersect1d(short, other)) == 0
    assert _simhash([], {}) == 0


@pytest.fixture(scope="module")
def sigs(spark, corpus):
    files, _ = corpus
    out = compute_signatures(with_identity(files), CFG).cache()
    out.count()
    return out


def test_signature_stage_schema_and_counts(sigs, corpus):
    files, truth = corpus
    assert sigs.count() == files.count()
    row = sigs.filter(F.col("n_shingles") > 0).first()
    assert len(row["minhash"]) == CFG.num_hashes
    assert len(row["band_hashes"]) == CFG.num_bands
    # empty files: no shingles, no bands
    empty = sigs.filter(F.col("n_tokens") == 0)
    assert empty.count() == len(truth.empty_group)
    assert all(len(r["band_hashes"]) == 0 for r in empty.collect())


def test_exact_dup_files_get_identical_signatures(sigs, corpus):
    _, truth = corpus
    repo, path = truth.exact_groups[0][0]
    other_repo, other_path = truth.exact_groups[0][1]
    a = sigs.filter((F.col("repo") == repo) & (F.col("path") == path)).first()
    b = sigs.filter(
        (F.col("repo") == other_repo) & (F.col("path") == other_path)
    ).first()
    assert a["minhash"] == b["minhash"]
    assert a["simhash"] == b["simhash"]
    assert a["band_hashes"] == b["band_hashes"]


def test_shingle_only_signatures_match_full(spark, sigs, corpus):
    """The shingle-only UDF (round-6: the substring channel's lean input —
    skips MinHash/band/SimHash work an opaque UDF would otherwise always
    pay) must emit exactly the full builder's n_tokens/n_shingles/shingles
    for every file."""
    from cloud_dedup_spark.operators.signatures import (
        compute_shingle_signatures,
    )

    files, _ = corpus
    lean = compute_shingle_signatures(with_identity(files), CFG)
    cols = ["repo", "path", "n_tokens", "n_shingles", "shingles"]
    full_rows = {
        (r["repo"], r["path"]): (r["n_tokens"], r["n_shingles"], r["shingles"])
        for r in sigs.select(*cols).collect()
    }
    lean_rows = {
        (r["repo"], r["path"]): (r["n_tokens"], r["n_shingles"], r["shingles"])
        for r in lean.select(*cols).collect()
    }
    assert lean_rows == full_rows


def test_minhash_chunking_is_bit_identical():
    """The chunked universal-minhash path (shingle-axis chunks, round-4
    review: the one-shot matrix was ~1KB/shingle) must equal the direct
    formula exactly."""
    from cloud_dedup_spark.config import MERSENNE_P
    from cloud_dedup_spark.operators.signatures import _hash_params, _minhash

    a, b = _hash_params(CFG)
    rng = np.random.RandomState(3)
    big = rng.randint(0, 2**32, size=70_000).astype(np.uint64)  # > chunk step
    direct = ((a[:, None] * big[None, :] + b[:, None]) % np.uint64(MERSENNE_P)).min(
        axis=1
    ).astype(np.int64)
    assert (direct == _minhash(big, a, b)).all()
    small = big[:100]
    direct_s = ((a[:, None] * small[None, :] + b[:, None]) % np.uint64(MERSENNE_P)).min(
        axis=1
    ).astype(np.int64)
    assert (direct_s == _minhash(small, a, b)).all()
