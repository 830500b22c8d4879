"""Dump ``explain('formatted')`` for bench/registry queries to files.

The optimization rounds must commit the physical plan of every query
they touch as ``plans/<round>/<name>_<suffix>.txt`` so plan claims
("2 Exchange -> 1", "BatchEvalPython removed") are auditable without
running Spark. This drives the same callables the bench suite times
(``bench.extra_queries``), so the captured plan is the benched shape.

Usage:
  python tools/capture_plans.py <outdir> <suffix> [sf_dir] [name ...]

Default sf_dir /root/testdata/sf0.1 (the driver's bench SF); default
names = every entry in bench.extra_queries().
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gamma_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    outdir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    import bench
    import __spark_entry__ as entry_mod

    qs = bench.extra_queries(entry_mod)
    names = sys.argv[4:] or sorted(qs)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture_plans")
    failed = []
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"[plans] unknown query {name}", file=sys.stderr)
            failed.append(name)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — capture the rest
            print(f"[plans] {name} failed: {exc}", file=sys.stderr)
            failed.append(name)
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"[plans] wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
