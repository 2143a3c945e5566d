#!/usr/bin/env python3
"""Scaling probe: separate fixed per-action overhead from marginal
per-row cost (the quantity that matters at 100 TB).

Replicates the fact tables (lineitem, orders, events) N× with
key-shifting (so join keys stay consistent and cardinalities scale),
writes them to a temp layout next to the sf0.1 dims, and times the
headline queries warm on both layouts in ONE session.  A query whose
time is flat is overhead-bound at fixture scale; one that scales
linearly shows its true marginal cost.

Usage: python3 tools/scale_probe.py [N]   (default 8)
Prints one JSON line; safe to re-run (temp dir reused).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# SPARK_GRAFT_PROBE_JITTER_EMB=1 (r13): embeddings replicas get the
# ann_bits_probe ±5% deterministic jitter instead of replicating as
# bit-clones — the layout the semantic-tier rows need (bit-clone
# replicas make every vector 64 exact ε-dups, an adversarial dedup
# density no real corpus has; jittered replicas are near-dups).
JITTER_EMB = os.environ.get("SPARK_GRAFT_PROBE_JITTER_EMB", "") == "1"
DST = f"/tmp/processor_spark-scale-probe-{REPL}x" + ("-jemb" if JITTER_EMB else "")

HEADLINE = [
    "q_pricing_summary",
    "q_join_5way",
    "q_window_rank",
    "q_tumbling_window",
    "q_sessionization",
    "q_text_tokens",
    "q_grouping_sets",
    # LLM-pipeline tier (r4): end-to-end wall-clock at N× docs — the
    # ngram_cap_probe covers candidate-set growth only
    "q_dedup_ngram",
    "q_dedup_minhash_md5",
    "q_dedup_substring",
    "q_dedup_clusters",
    "q_corpus_mixture",
    # r4 additions: data-layout tier (orders-based), retrieval scoring
    # and media decode (documents-based)
    "q_zorder_layout",
    "q_compaction_plan",
    "q_bm25",
    "q_pii_scan",
    "q_media_audio",
    "q_sliding_distinct",
    "q_ngram_novelty",
    "q_weighted_median",
    "q_skyline",
    # continued-session additions: local-pair mining, corpus-pair
    # jaccard, iterative ML step, perceptual image dedup, diff/trend
    "q_basket_pairs",
    "q_source_jaccard",
    "q_kmeans_update",
    "q_media_phash",
    "q_snapshot_diff",
    "q_cusum_changepoint",
    "q_regression_slope",
    "q_vocab_coverage",
    "q_dataset_card",
    "q_oov_rate",
    "q_hard_negatives",
    "q_session_dynamic_gap",
    "q_max_concurrency",
    # session close: broadcast Bloom blocklist probe — constant bitmap,
    # cost must be linear narrow-map on the probe side
    "q_bloom_prefilter",
    # r6 additions: lakehouse MERGE round trip (storage IO should be
    # CDC-batch-sized, i.e. linear in the touched slice), persisted
    # ANN serving (index-shaped, should be near-flat), graph ANN
    # build+serve, unicode dedup ladder, rank fusion
    "q_merge_snapshot",
    "q_time_travel",
    "q_ann_ivf_serve",
    "q_ann_pq_serve",
    "q_ann_graph",
    "q_ann_graph_serve",
    "q_dedup_ngram_unicode",
    "q_hybrid_rrf",
    # r7 additions: portable sketches (register/cell aggs must stay
    # map-side-combinable — near-flat expected for cardinality-stable
    # replication), zone-map-pruned lake read, MMR pool reranking
    "q_hll_md5",
    "q_hll_merge",
    "q_kmv_sketch",
    "q_cms_heavy",
    "q_lake_skipping",
    "q_mmr_rerank",
    # r7 continued: embedding compression/decomposition (explode +
    # two-phase aggs — near-flat expected per vector count), BPE
    # induction (corpus pass is one word-count agg; iteration is
    # vocab-capped so N× docs should cost only the first agg)
    "q_embed_quantize",
    "q_embed_pca",
    "q_bpe_train",
    "q_bpe_apply",
    "q_rr_counts",
    "q_embed_outliers",
    "q_lttb_downsample",
    "q_bootstrap_ci",
    "q_sax_symbolize",
    "q_seasonal_decompose",
    "q_acf",
    "q_embed_pc1_stats",
    "q_rake_keywords",
    "q_exact_quantiles",
    "q_vocab_growth",
    "q_ks_test",
    "q_mutual_nn",
    "q_hll_sliding",
    # r7 session 3: ranking eval (fixed query set — must be near-flat),
    # Holt fold (agg-sized), Hamming LSH, BFS, content chunking,
    # sketch calibration, boilerplate, ladder report
    "q_ndcg",
    "q_map_mrr",
    "q_holt_forecast",
    "q_phash_near",
    "q_bfs_hops",
    "q_cdc_chunks",
    "q_minhash_calibration",
    "q_boilerplate",
    "q_dedup_report",
    "q_collocations",
    "q_join_asof_nearest",
    "q_phrase_search",
    "q_seasonal_anomaly",
    "q_user_growth",
    "q_dim_truncation_recall",
    "q_binary_hamming_recall",
    "q_l_diversity",
    "q_maxsim_retrieval",
    "q_phash_clusters",
    "q_media_scenecut",
    "q_reshard_moves",
    "q_trending_topk",
    "q_ab_power",
    "q_lsh_recall",
    "q_decay_popularity",
    "q_audience_overlap",
    "q_conversion_ci",
    "q_backlog_curve",
    "q_price_index",
    "q_hhi_concentration",
    "q_pareto_share",
    "q_churn_rate",
    "q_dow_profile",
    # r8: learned quality scorer (one persisted feature pass + stats
    # broadcast — near-flat expected) and its weights twin; IVF with
    # trained centroids (two O(n·nlist) broadcast passes — linear)
    "q_quality_model",
    "q_quality_model_weights",
    "q_ann_ivf_kmeans",
    "q_quality_model_ols",
    "q_quality_model_score",
    "q_phrase_search_serve",
    "q_ann_ivf_kmeans_serve",
    # r9/r10: filtered ANN (label predicate inside the cell-pruned
    # scan — linear assign pass + nprobe-bounded serve), generational
    # text-index append (delta-only tokenize — index-shaped), IVF-PQ
    # composite (codes-per-cell ADC scan — near-flat serve)
    "q_ann_filtered",
    "q_ann_filtered_serve",
    "q_text_index_append",
    "q_ann_ivfpq",
    "q_ann_ivfpq_serve",
    "q_quality_model_holdout",
    "q_knn_l2",
    "q_ann_ivfpq_refine",
    "q_ann_ivfpq_refine_serve",
    "q_ann_ivfpq_recall",
    "q_ann_ivf_append",
    "q_ann_pq_trained",
    "q_ann_pq_trained_recall",
    "q_join_setsim",
    "q_curriculum_shards",
    "q_ann_pq_trained_serve",
    "q_winnow_fingerprints",
    # r11: SemDeDup (within-cell pair stage — per-cell occupancy grows
    # with the corpus at fixed nlist, so the fixture ratio is the
    # WORST case; a deployment re-parameterizes nlist ≈ n/target_cell
    # to keep it linear), its per-cell report, and the per-doc Gopher
    # repetition signals (explode + two map-side-combinable aggs)
    "q_semdedup",
    "q_semdedup_stats",
    "q_gopher_repetition",
    "q_label_propagation",
    "q_semdedup_clusters",
    "q_curation_verdicts",
    "q_audio_segments",
    # r12: the fuzzy-tier curation composite + per-source funnel, the
    # two-level keys (router math at fixture nlist — near-flat
    # expected; the 64x story is the ann_bits_probe ladder), and the
    # index-backed clusters serve
    "q_curation_funnel",
    "q_ann_ivf_twolevel",
    "q_semdedup_twolevel",
    "q_semdedup_clusters_serve",
]

# per-table key columns to shift per replica so keys stay unique and
# join relationships replicate instead of exploding
_SHIFTS = {
    "lineitem": {"l_orderkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 0},
    "events": {"event_id": 10_000_000, "user_id": 100_000},
    "documents": {"doc_id": 10_000_000},
    "part": {"p_partkey": 10_000_000},
    # embeddings replicate too (vec_id shift keeps the 4 seed
    # centroids vec_id<4 in replica 0 only — assignment work scales,
    # the codebook stays fixed, as a real corpus grows)
    "embeddings": {"vec_id": 10_000_000},
}


# Optional: SPARK_GRAFT_PROBE_TABLES="documents,events" replicates only
# those tables (others copied 1×) — a 64× docs-only probe shouldn't pay
# for 38M lineitem rows it never reads.  Default: replicate all _SHIFTS.
_REPL_TABLES = {
    t.strip()
    for t in os.environ.get("SPARK_GRAFT_PROBE_TABLES", "").split(",")
    if t.strip()
} or set(_SHIFTS)


def build_layout(spark) -> None:
    from pyspark.sql import functions as F

    from processor_spark.sources.fixtures import TABLES, load

    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    for t in TABLES:
        df = load(spark, SRC, t)
        if t in _SHIFTS and t in _REPL_TABLES:
            parts = []
            for i in range(REPL):
                rep = df
                for col, step in _SHIFTS[t].items():
                    if step:
                        rep = rep.withColumn(col, F.col(col) + F.lit(i * step))
                if t == "embeddings" and i > 0 and JITTER_EMB:
                    rep = rep.withColumn(
                        "embedding",
                        F.expr(
                            f"transform(embedding, (x, d) -> CAST(x + "
                            f"(((vec_id * 2654435761 + d * 40503 + {i}) % 997)"
                            f" / 997.0 - 0.5) * 0.1 AS FLOAT))"
                        ),
                    )
                if t == "documents" and i > 0:
                    # salt every token with the replica id: replica i of a
                    # doc shares NO n-grams/shingles with replica j, so the
                    # corpus scales like a real N×-larger corpus (dup
                    # structure replicated WITHIN each replica) instead of
                    # every doc acquiring N-1 verbatim near-dups (which
                    # would grow the pair space N², an adversarial layout
                    # no real corpus has)
                    rep = rep.withColumn(
                        "text",
                        F.array_join(
                            F.expr(
                                f"transform(split(trim(text), '\\\\s+'),"
                                f" t -> concat('r{i}', t))"
                            ),
                            " ",
                        ),
                    )
                parts.append(rep)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")


def main() -> None:
    from processor_spark import registry
    from processor_spark.session import build_session

    spark = build_session(app_name="processor_spark-scale-probe")
    qs = registry.queries()

    # optional key subset: argv[2:] restricts the probe (fast re-check
    # of a single new operator).  Validate BEFORE the expensive
    # build_layout so a typo fails in milliseconds, not minutes.
    keys = sys.argv[2:] or HEADLINE
    unknown = [k for k in keys if k not in qs]
    if unknown:
        sys.exit(f"unknown query keys (not in registry): {unknown}")

    build_layout(spark)
    result: dict[str, dict[str, float]] = {}
    for key in keys:
        row: dict[str, float] = {}
        for tag, sf_dir in (("base", SRC), (f"{REPL}x", DST)):
            qs[key](spark, sf_dir).toPandas()  # warm (plan+codegen)
            # drop persisted subplans so the timed run measures a full
            # recompute, not a cached-block read
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[key](spark, sf_dir).toPandas()
            row[tag] = round(time.perf_counter() - t0, 3)
        row["ratio"] = round(row[f"{REPL}x"] / row["base"], 2) if row["base"] else -1.0
        result[key] = row

    print(json.dumps({"replication": REPL, "base_dir": SRC, "queries": result}))


if __name__ == "__main__":
    main()
