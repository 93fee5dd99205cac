"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin on the same sf dir, compare row count + schema-ish
+ order-insensitive values.

Usage: PYTHONPATH=/root/repo python scripts/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from cloud_dedup_spark.session import build_session  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def normalize(rows, cols):
    """Sort columns by name, stringify with float rounding, sort rows."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(
        master="local[8]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name}: rows-only ({len(srows)} rows) — no oracle")
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        status = []
        if sorted(scols) != sorted(ocols):
            status.append(f"SCHEMA spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            status.append(f"ROWS spark={len(srows)} oracle={len(orows)}")
        sn = normalize(srows, scols)
        on = normalize(orows, ocols)
        if sn != on:
            diff = [(x, y) for x, y in zip(sn, on) if x != y][:3]
            extra_s = [x for x in sn if x not in set(on)][:3]
            extra_o = [x for x in on if x not in set(sn)][:3]
            status.append(f"VALUES first-diffs={diff} spark-only={extra_s} oracle-only={extra_o}")
        if status:
            failures += 1
            print(f"✗ {name}: " + " | ".join(status))
        else:
            print(f"✓ {name}: {len(srows)} rows match")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
