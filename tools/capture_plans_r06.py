"""Capture .explain('formatted') for headline queries → plans/r06/<q>_<tag>.txt.

Usage: python tools/capture_plans_r06.py <tag> [query ...]
"""
import io, os, sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

HEADLINE = [
    "crawl_epoch_flagship", "dedup_exact", "dedup_lsh_fast",
    "dedup_fingerprint_portable", "text_profile", "bpe_token_count",
    "ann_topk", "quality_gopher", "span_dedup", "host_stats",
    "seen_antijoin", "politeness_budget", "redirect_resolve",
    "decontamination", "scope_filter",
]

def main():
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    import __spark_entry__ as em
    from hiispider_spark.session import get_spark
    qs = em.queries()
    spark = get_spark(app=f"plans-{tag}", cpus=8, shuffle_partitions=32)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs("plans/r06", exist_ok=True)
    for n in names:
        df = qs[n](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"plans/r06/{n}_{tag}.txt", "w") as f:
            f.write(buf.getvalue())
        print(n, "->", f"plans/r06/{n}_{tag}.txt")
    spark.stop()

if __name__ == "__main__":
    main()
