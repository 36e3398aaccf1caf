"""Plan audit over every registered query (optimization round tooling).

Explains all queries() plans and flags optimization red flags per the
spark_optimization_guide checklist:

- BatchEvalPython (row-at-a-time Python UDF on a query path)
- CartesianProduct / BroadcastNestedLoopJoin
- SortMergeJoin count (each costs two sorted exchanges)
- Exchange count
- parquet scans without PushedFilters where the query filters
- single-partition global Window (Window with no partitionBy)

Usage: python scripts/plan_audit.py [sf_dir] [query ...]
Writes plans/r06/audit.json and prints a summary table.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gtfs2lc_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session(app_name="plan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    out = {}
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:300]}
            continue
        flags = {
            "batch_eval_python": plan.count("BatchEvalPython"),
            "arrow_eval_python": plan.count("ArrowEvalPython"),
            "map_in_pandas": plan.count("MapInPandas") + plan.count("MapInArrow")
            + plan.count("FlatMapGroupsInPandas"),
            "cartesian": plan.count("CartesianProduct"),
            "bnl_join": plan.count("BroadcastNestedLoopJoin"),
            "smj": plan.count("SortMergeJoin"),
            "shj": plan.count("ShuffledHashJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "global_window": len(
                re.findall(r"Window .*windowspecdefinition\((?!\w+#)", plan)
            ),
            "scans_no_pushed_filter": len(
                re.findall(r"PushedFilters: \[\]", plan)
            ),
        }
        out[name] = flags
    os.makedirs("plans/r06", exist_ok=True)
    with open("plans/r06/audit.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    for name, fl in sorted(out.items()):
        if "error" in fl:
            print(f"{name}: ERROR {fl['error'][:80]}")
            continue
        hot = {k: v for k, v in fl.items() if v and k in (
            "batch_eval_python", "cartesian", "bnl_join", "global_window")}
        print(f"{name}: exch={fl['exchanges']} smj={fl['smj']} "
              f"bhj={fl['bhj']} shj={fl['shj']} {hot if hot else ''}")
    spark.stop()


if __name__ == "__main__":
    main()
