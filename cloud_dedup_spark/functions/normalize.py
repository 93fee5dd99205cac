"""Content normalization + row identity — native Column expressions only.

The reference normalizes *names* for case-insensitive matching
(``fname.lower()``, src/cloud_duplicate_analyzer.py:177) and verifies
*content* byte-exactly via MD5 (:100-111).  The scaled engine normalizes
content before shingling so trivial formatting deltas don't break near-dup
detection, while the exact channel stays byte-exact on the raw content
(preserving the per-row ``content_sha256`` invariant, BASELINE.json
``input_hint``).

Everything here is JVM-side (regexp_replace / lower / trim / xxhash64) so it
stays inside whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Comment stripping is deliberately UNIFORM across languages — an explicit
# tradeoff, weighed in round 4 and decided for uniformity:
#   * per-lang stripping (strip '#' for py/sh only, so md HEADINGS survive)
#     was implemented and REJECTED: it breaks cross-language verbatim
#     containment — a go/js snippet embedded in an md README normalizes
#     differently on the two sides, so the substring channel can no longer
#     find the plant (pinned by test_substring's corpus truth, which failed
#     under the per-lang variant).  Code-in-docs is a common real
#     containment; heading-only-different md docs welding as near-dups is
#     the lesser cost — for training-data dedup, "same body, different
#     title" is usually exactly the template-instance near-dup one wants
#     collapsed, and the exact channel still separates them byte-wise.
#   * the reference has no analog either way (it never inspects content
#     structure).
_BLOCK_COMMENT = r"/\*[\s\S]*?\*/"
_LINE_COMMENT = r"(?m)(#|//).*$"
_WS_RUN = r"\s+"


def normalize_content(col: Column | str) -> Column:
    """lowercase → strip block+line comments → collapse whitespace → trim."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, _BLOCK_COMMENT, " ")
    c = F.regexp_replace(c, _LINE_COMMENT, " ")
    c = F.regexp_replace(c, _WS_RUN, " ")
    return F.trim(c)


def file_id_col() -> Column:
    """Compact 64-bit surrogate id from the natural key (repo, path, commit).

    xxhash64 keeps shuffles narrow (one long vs three strings).  At true
    10^12-row scale a 64-bit id has a measurable birthday-collision count
    (E ≈ n²/2^65 ≈ 27k colliding pairs at n=10^12) — ``file_id2_col`` below
    provides the second independent 64 bits forming a 128-bit composite for
    collision DETECTION, and the pipeline quarantines detected collisions
    (plans/pipeline.py::quarantine_id_collisions) so a collision can never
    silently merge two unrelated files into one graph node.  The natural key
    is always carried alongside, so results are reported by (repo, path),
    never by the surrogate.
    """
    return F.xxhash64("repo", "path", "commit")


def file_id2_col() -> Column:
    """Second, independent 64-bit hash of the natural key (salted, different
    argument order) — together with ``file_id_col`` a 128-bit composite
    identity.  P[both collide for a given pair] ≈ 2^-128; at 10^12 files the
    expected number of undetected collisions is ~10^-14.
    """
    return F.xxhash64("path", "commit", "repo", F.lit(0x5F3C))


def with_identity(files: DataFrame) -> DataFrame:
    """Add file_id, content_sha256 (if absent), n_bytes, and normalized content.

    ``content_sha256`` is recomputed with the built-in ``sha2`` when the input
    doesn't carry it — this is the invariant column the driver checks per row
    (reference analog: streaming MD5, src/cloud_duplicate_analyzer.py:100-111).
    """
    out = files
    if "content_sha256" not in out.columns:
        out = out.withColumn("content_sha256", F.sha2(F.col("content"), 256))
    return (
        out.withColumn("file_id", file_id_col())
        .withColumn("file_id2", file_id2_col())
        .withColumn("n_bytes", F.octet_length("content"))
        .withColumn("content_norm", normalize_content("content"))
    )
