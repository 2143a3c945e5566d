#!/usr/bin/env python3
"""Regenerate PLANS.md: executed AQE-final plans of the headline queries."""
import re
import sys

sys.path.insert(0, ".")
from processor_spark.session import build_session
from processor_spark import registry
from processor_spark.plans import explain_str

HEADLINE = [
    "q_pricing_summary", "q_join_5way", "q_window_rank", "q_tumbling_window",
    "q_sessionization", "q_topk_similarity", "q_text_tokens", "q_grouping_sets",
    # not in the bench suite, dumped for the scale story: the SMB
    # fact⋈fact join whose whole point is the plan shape (zero Exchange)
    "q_bucketed_join",
    # LLM-pipeline + layout tier (driver-tracked since r4): the dedup
    # posting-array pipeline, partition pruning, and the z-order audit
    "q_dedup_ngram",
    "q_dedup_minhash_md5",
    # r7s2: single-exchange multi-window decimation, two-pass exact
    # quantiles, sliding sketch merge
    "q_lttb_downsample",
    "q_exact_quantiles",
    "q_hll_sliding",
    # r7s3: fixed-query broadcast ranking eval, banded Hamming pairs,
    # array-native content chunking, frontier BFS
    "q_ndcg",
    "q_phash_near",
    "q_cdc_chunks",
    "q_bfs_hops",
    "q_scan_partitioned",
    "q_zorder_layout",
    "q_compaction_plan",
    "q_bm25",
    # continued-session tier: decorrelated lateral (WindowGroupLimit),
    # local pair mining, distinct-score AUC, sweep-line concurrency
    "q_join_lateral",
    "q_basket_pairs",
    "q_auc_ranksum",
    "q_max_concurrency",
    # session close: broadcast Bloom-bitmap blocklist probe
    "q_bloom_prefilter",
    # r11: index-backed SemDeDup (no assign crossJoin — the plan IS
    # the claim) and the cross-table curation composite
    "q_semdedup_serve",
    "q_curation_verdicts",
]

INTRO = """Post-execution (AQE-final) plans captured from `.explain("formatted")`
minus the verbose node detail — regenerate with
`python3 tools/dump_plans.py`. What to look for per SCALE.md:
PushedFilters on every scan, BroadcastHashJoin on dim joins, two
HashAggregate phases per agg, TakeOrderedAndProject for top-k,
`[codegen id]` spans covering the hot pipelines, no BatchEvalPython
anywhere.
"""


def main(sf="/root/testdata/sf0.1"):
    registry.load_all_modules()
    spark = build_session()
    out = [f"# PLANS — executed physical plans of the headline queries (sf0.1)\n\n{INTRO}"]
    for key in HEADLINE:
        df = registry.get(key).fn(spark, sf)
        df.collect()
        plan = explain_str(df, "formatted")
        out.append(f"## {key}\n\n```\n{plan.split(chr(10)*2)[0]}\n```\n")
        pushed = sorted(
            {m for m in re.findall(r"PushedFilters: \[[^\]]+\]", plan) if "[]" not in m}
        )
        if pushed:
            out.append("Pushed filters: " + "; ".join(pushed) + "\n")
    open("PLANS.md", "w").write("\n".join(out))


if __name__ == "__main__":
    main(*sys.argv[1:])
