#!/usr/bin/env python3
"""Regenerate PLANS.md: executed AQE-final plans of the headline queries."""
import sys

sys.path.insert(0, ".")
from processor_spark.session import build_session
from processor_spark import registry
from processor_spark.plans import explain_str

HEADLINE = [
    "q_pricing_summary", "q_join_5way", "q_window_rank", "q_tumbling_window",
    "q_sessionization", "q_topk_similarity", "q_text_tokens", "q_grouping_sets",
]

def main(sf="/root/testdata/sf0.1"):
    registry.load_all_modules()
    spark = build_session()
    out = ["# PLANS — executed physical plans of the headline queries (sf0.1)\n"]
    for key in HEADLINE:
        df = registry.get(key).fn(spark, sf)
        df.collect()
        plan = explain_str(df, "formatted")
        out.append(f"## {key}\n\n```\n{plan.split(chr(10)*2)[0]}\n```\n")
    open("PLANS.md", "w").write("\n".join(out))

if __name__ == "__main__":
    main(*sys.argv[1:])
