"""Result-equivalence gate for optimization-round restructurings.

Two modes:
  dump <tree> <sf_dir> <out.pkl> q1 q2 ...   run queries from <tree> (cwd and
      PYTHONPATH must point at it) and pickle {name: sorted rows}.
  diff <a.pkl> <b.pkl>                       exact comparison.

Run dump once from the pristine HEAD snapshot and once from the working tree
(separate processes so driver AND executor workers import the right tree),
then diff.  Any restructured query must be IDENTICAL on every SF before the
change is kept — "do not change what any declared query computes".
"""

from __future__ import annotations

import os
import pickle
import sys


def dump(tree: str, sf_dir: str, out: str, names: list[str]) -> None:
    sys.path.insert(0, tree)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_under_test", os.path.join(tree, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["entry_under_test"] = mod
    spec.loader.exec_module(mod)

    from cloud_dedup_spark.session import build_session

    spark = build_session(app_name="compare-outputs")
    try:
        qs = mod.queries()
        res = {}
        for n in names:
            rows = sorted(
                tuple(r) for r in qs[n](spark, sf_dir).collect()
            )
            res[n] = rows
            print(f"dumped {n}: {len(rows)} rows", flush=True)
        with open(out, "wb") as fh:
            pickle.dump(res, fh)
    finally:
        spark.stop()


def diff(a_path: str, b_path: str) -> None:
    with open(a_path, "rb") as fh:
        a = pickle.load(fh)
    with open(b_path, "rb") as fh:
        b = pickle.load(fh)
    fail = 0
    for n in sorted(set(a) | set(b)):
        ra, rb = a.get(n), b.get(n)
        same = ra == rb
        print(
            f"{n}: a={len(ra) if ra is not None else None} "
            f"b={len(rb) if rb is not None else None} "
            f"{'IDENTICAL' if same else 'MISMATCH'}"
        )
        if not same:
            fail += 1
            if ra and rb:
                only_a = [r for r in ra if r not in rb][:3]
                only_b = [r for r in rb if r not in ra][:3]
                print(f"  only_a: {only_a}\n  only_b: {only_b}")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    if sys.argv[1] == "dump":
        dump(sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5:])
    else:
        diff(sys.argv[2], sys.argv[3])
