#!/usr/bin/env python3
"""r17 plan audit: one summary line per headline query — Exchange count,
Python-boundary nodes (BatchEvalPython / ArrowEvalPython / MapInPandas /
FlatMapGroupsInPandas), join strategies, CartesianProduct, sort count —
so the optimization round can triage plan defects instead of reading 160
plans by hand.

Usage: python scripts/r17_plan_audit.py [sf_dir] > audit.txt
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

NODE_RE = re.compile(r"\((\d+)\) ([A-Za-z]+)")


def main() -> None:
    from bench import HEADLINE
    from distributed_video_analytics_flink_spark import operators as ops
    from distributed_video_analytics_flink_spark.plans import formatted_plan
    from distributed_video_analytics_flink_spark.session import get_spark

    spark = get_spark(app_name="r17-plan-audit")
    for name in HEADLINE:
        try:
            df = ops.QUERIES[name].fn(spark, SF)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}\tERROR\t{type(exc).__name__}: {exc}"[:200], flush=True)
            continue
        nodes: dict[int, str] = {}
        for m in NODE_RE.finditer(plan):
            nodes.setdefault(int(m.group(1)), m.group(2))
        kinds = list(nodes.values())
        counts = {
            "exch": sum(k == "Exchange" for k in kinds),
            "bcast": sum(k == "BroadcastExchange" for k in kinds),
            "py": sum(
                k in ("BatchEvalPython", "ArrowEvalPython") for k in kinds
            ),
            "map_py": sum(
                k in ("MapInPandas", "FlatMapGroupsInPandas", "MapInArrow")
                for k in kinds
            ),
            "sort": sum(k == "Sort" for k in kinds),
            "smj": sum(k == "SortMergeJoin" for k in kinds),
            "cart": sum(k == "CartesianProduct" for k in kinds),
            "wgl": sum(k == "WindowGroupLimit" for k in kinds),
            "win": sum(k == "Window" for k in kinds),
            "rdd": plan.count("Scan ExistingRDD"),
        }
        flags = []
        if counts["cart"]:
            flags.append("CARTESIAN")
        if counts["py"]:
            flags.append("ROW_PY" if "BatchEvalPython" in kinds else "ARROW_PY")
        if counts["win"] and not counts["wgl"]:
            flags.append("WINDOW_NO_LIMIT")
        print(
            f"{name}\texch={counts['exch']} bcast={counts['bcast']} "
            f"py={counts['py']} map_py={counts['map_py']} sort={counts['sort']} "
            f"smj={counts['smj']} win={counts['win']} wgl={counts['wgl']} "
            f"rdd={counts['rdd']}\t{' '.join(flags)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
