"""Physical-plan audit: print `.explain("formatted")` for the key
operators and assert the plan properties that matter at 100 TB:

- parquet scans carry PushedFilters / pruned ReadSchema,
- the fetch join broadcasts the slice (BroadcastHashJoin, pages side
  streamed, no Exchange on the big side),
- dequeue has no global sort (window per bucket, single hash exchange),
- hot-path expressions sit inside WholeStageCodegen spans.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check(name: str, plan: str, must: list[str], must_not: list[str] = ()):
    ok = True
    for m in must:
        if m not in plan:
            print(f"  MISSING  {m!r}")
            ok = False
    for m in must_not:
        if m in plan:
            print(f"  FORBIDDEN {m!r} present")
            ok = False
    print(f"{'PASS' if ok else 'FAIL'}  {name}")
    return ok


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from hiispider_spark.operators.fetch import fetch_join
    from hiispider_spark.operators.frontier import build_frontier, dequeue_topk
    from hiispider_spark.session import get_spark
    from hiispider_spark.sources.synth import synth_pages, synth_seeds

    spark = get_spark(app="explain-audit", cpus=8, shuffle_partitions=8)
    ok = True

    # 1. column pruning + filter pushdown on a parquet scan
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") < "1996-01-01").select(
        "l_orderkey", "l_extendedprice"
    )
    p = plan_of(q)
    ok &= check(
        "parquet scan: pushdown + pruning",
        p,
        must=["PushedFilters: [IsNotNull(l_shipdate)", "l_orderkey"],
        must_not=["l_comment"],
    )

    # 2. dequeue: windowed top-k, no global Sort over all partitions
    fr = build_frontier(synth_seeds(spark, sf), n_partitions=8)
    dq = dequeue_topk(fr, "2024-01-01 00:01:00", 5)
    p = plan_of(dq)
    ok &= check(
        "dequeue: per-bucket window w/ group-limit pushdown, no global sort",
        p,
        # WindowGroupLimit = Spark pushed rank<=k INTO the window sort;
        # the only exchanges are the dedup groupBy and the part_id hash
        must=["WindowGroupLimit", "Window"],
        must_not=["TakeOrderedAndProject"],
    )
    if p.count("Exchange") > 2:
        print(f"  NOTE: {p.count('Exchange')} exchanges in dequeue plan")

    # 3. fetch join: slice broadcast, page store NOT shuffled
    pages = synth_pages(spark, sf)
    fetched, _ = fetch_join(fr, pages)
    p = plan_of(fetched)
    ok &= check(
        "fetch join: BroadcastHashJoin with slice build side",
        p,
        must=["BroadcastHashJoin"],
        must_not=["SortMergeJoin"],
    )

    # 4. extraction column twin stays JVM-side (no Python eval nodes)
    from hiispider_spark.operators.extract import text_extract_col

    p = plan_of(pages.select(text_extract_col(F.col("html")).alias("t")))
    ok &= check(
        "extract column twin: pure JVM (no Python eval in plan)",
        p,
        must=["Project"],
        must_not=["ArrowEvalPython", "BatchEvalPython"],
    )

    print("\nfull dequeue plan:\n" + plan_of(dq))
    print("\nfull fetch plan:\n" + plan_of(fetched))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
