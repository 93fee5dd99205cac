"""Shared Spark session + corpus fixtures.

One session per test run (Spark startup ~10 s dominates otherwise), local[4]
with a small shuffle-partition count — the same settings shape as a real
cluster run, just narrower (session.py is the single source of truth).
"""

from __future__ import annotations

import pytest

from cloud_dedup_spark.corpus import corpus_df
from cloud_dedup_spark.session import build_session

N_FILES = 400
SEED = 42


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="cloud-dedup-tests", master="local[4]",
                      shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(spark):
    """(files DataFrame, truth) — cached so every module reuses one plan."""
    df, truth = corpus_df(spark, N_FILES, SEED)
    df = df.cache()
    df.count()
    return df, truth


def cluster_pairs(clusters):
    """Unordered member-pair set of a cluster list — the recall currency."""
    out = set()
    for members in clusters:
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                out.add(frozenset((ms[i], ms[j])))
    return out
