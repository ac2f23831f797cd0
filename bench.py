"""Benchmark harness (driver-run per round; BENCH_r{N}.json).

Runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) and prints ONE JSON line::

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "turns_per_sec": ...}

``--scaling`` runs the flagship pipeline in fresh processes at
num_cpus=2, 8 and 32 on identical input — the same actor-pool fraction
(cpus/2) at every level — and reports throughput at each level, the
2→4N and 8→4N efficiencies, and the machine's measured parallel
capacity (this sandbox is SMT/steal-limited well below 32 hardware
threads, which bounds the raw 8→32 number; a real 4N-node cluster adds
whole nodes).  This is the sandbox evidence for the north rule's
N vs 4N cluster criterion.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _run_benchmarks(sf_dir: str, num_cpus: int) -> dict:
    import ray

    # cheap load probe BEFORE ray.init: how many effective CPU-seconds per
    # wall-second `num_cpus` workers get RIGHT NOW.  Every BENCH_r*.json
    # self-reports the machine load it ran under (round-2's driver bench
    # looked like a 40 % regression that was pure co-tenant load — this
    # field makes that diagnosable instead of a wasted round of signal).
    capacity = _measure_cpu_capacity(levels=(num_cpus,))

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from ocr_engine_ray.pipelines import queries as q
    from ocr_engine_ray.pipelines.flagship import conv_rollup, flagship, flagship_composed

    # untimed: materialize the synthetic corpus (cached across runs) and
    # warm the page cache so we measure compute+shuffle, not cold disk
    paths = q.transcript_paths(sf_dir)
    n_turns = 0
    for p in paths:
        with open(p, "rb") as f:
            while f.read(1 << 22):
                pass
    import pyarrow.parquet as pq

    n_turns = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)

    # untimed warmup: spin up Ray worker processes / Ray Data executor once
    # on a single shard so timings measure steady-state compute, not
    # first-execution infrastructure startup
    flagship(paths[:1]).count()

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        return out

    # headline: flagship extraction (read → extract actor pool → validate)
    n_extracted = timed("flagship_extract", lambda: flagship(paths).count())
    # steady-state: same pipeline with the actor images warm — what a
    # long-running (100 TB) job sees after the first minutes
    timed("flagship_extract_warm", lambda: flagship(paths).count())
    import shutil
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="bench_write_", dir="/tmp")
    try:
        timed("flagship_write_parquet",
              lambda: flagship(paths).write_parquet(out_dir))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    # tree combine: right for this corpus's 6.6k-conversation cardinality
    # (see conv_rollup docstring; the unbounded-cardinality shuffle path is
    # the default and covered by q_conv_rollup + equivalence test)
    timed("conv_rollup", lambda: conv_rollup(flagship_composed(paths),
                                             combine="tree").count())
    timed("events_conv_rollup", lambda: q.q_events_conv_rollup(sf_dir).count())
    timed("lineitem_pricing_summary",
          lambda: q.q_lineitem_pricing_summary(sf_dir).count())
    timed("documents_token_stats",
          lambda: q.q_documents_token_stats(sf_dir).count())
    timed("documents_dedup_exact",
          lambda: q.q_documents_dedup_exact(sf_dir).count())
    timed("transcripts_dedup_exact",
          lambda: q.q_transcripts_dedup_exact(sf_dir).count())
    timed("documents_minhash_neardup",
          lambda: q.q_documents_minhash_neardup(sf_dir).count())
    timed("embeddings_ann_topk",
          lambda: q.q_embeddings_ann_topk(sf_dir).num_rows)
    # round-3 additions: the new heavy operator families
    timed("documents_winnow_fingerprints",
          lambda: q.q_documents_winnow_fingerprints(sf_dir).count())
    timed("customers_fuzzy_name_pairs",
          lambda: q.q_customers_fuzzy_name_pairs(sf_dir).count())
    timed("events_funnel",
          lambda: q.q_events_funnel(sf_dir).num_rows)
    timed("events_tumbling_daily",
          lambda: q.q_events_tumbling_daily(sf_dir).num_rows)
    timed("documents_tfidf_pairs",
          lambda: q.q_documents_tfidf_pairs(sf_dir).count())
    timed("transcripts_boilerplate",
          lambda: q.q_transcripts_boilerplate(sf_dir).count())
    timed("events_value_outliers",
          lambda: q.q_events_value_outliers(sf_dir).count())
    # round-4 additions: corrected+vectorized simhash, LSH join API
    timed("documents_simhash_neardup",
          lambda: q.q_documents_simhash_neardup(sf_dir).count())
    timed("documents_lsh_join_exact",
          lambda: q.q_documents_lsh_join_exact(sf_dir).count())
    timed("documents_dup_spans",
          lambda: q.q_documents_dup_spans(sf_dir).count())
    timed("embeddings_semantic_dedup",
          lambda: q.q_embeddings_semantic_dedup(sf_dir).count())
    timed("documents_dup_spans_removed",
          lambda: q.q_documents_dup_spans_removed(sf_dir).count())
    timed("documents_char_entropy",
          lambda: q.q_documents_char_entropy(sf_dir).count())
    timed("documents_dsir_weights",
          lambda: q.q_documents_dsir_weights(sf_dir).count())
    # round-4 session-3 additions: retrieval, wide joins, PCA family
    timed("revenue_by_nation",
          lambda: q.q_revenue_by_nation(sf_dir).count())
    timed("documents_bm25_topk",
          lambda: q.q_documents_bm25_topk(sf_dir).count())
    timed("documents_gopher_gate",
          lambda: q.q_documents_gopher_gate(sf_dir).count())
    timed("documents_ngram_novelty",
          lambda: q.q_documents_ngram_novelty(sf_dir).count())
    timed("embeddings_covariance",
          lambda: q.q_embeddings_covariance(sf_dir).count())
    timed("embeddings_pca_project",
          lambda: q.q_embeddings_pca_project(sf_dir).count())
    # round-4 session-4 additions: warehouse join/subquery shapes + KS
    timed("volume_shipping",
          lambda: q.q_volume_shipping(sf_dir).count())
    timed("orders_large_quantity",
          lambda: q.q_orders_large_quantity(sf_dir).count())
    timed("orders_above_cust_avg",
          lambda: q.q_orders_above_cust_avg(sf_dir).count())
    timed("events_ks_test",
          lambda: q.q_events_ks_test(sf_dir).count())
    timed("transcripts_dup_weights",
          lambda: q.q_transcripts_dup_weights(sf_dir).count())
    timed("transcripts_windowed_dedup",
          lambda: q.q_transcripts_windowed_dedup(sf_dir).count())
    timed("events_winsorize_values",
          lambda: q.q_events_winsorize_values(sf_dir).count())
    timed("customers_rfm_segments",
          lambda: q.q_customers_rfm_segments(sf_dir).count())
    # round-4 session-7 additions: graph family, profiling, windows
    timed("parts_copurchase_triangles",
          lambda: q.q_parts_copurchase_triangles(sf_dir).count())
    timed("parts_copurchase_pagerank",
          lambda: q.q_parts_copurchase_pagerank(sf_dir).count())
    timed("parts_basket_lift",
          lambda: q.q_parts_basket_lift(sf_dir).count())
    timed("lineitem_profile",
          lambda: q.q_lineitem_profile(sf_dir).count())
    timed("events_rolling_1h_sum",
          lambda: q.q_events_rolling_1h_sum(sf_dir).count())
    timed("events_impute_median",
          lambda: q.q_events_impute_median(sf_dir).count())
    timed("documents_jaccard_threshold_curve",
          lambda: q.q_documents_jaccard_threshold_curve(sf_dir).count())
    # round-4 session-8 additions: warehouse + curation staples
    timed("customers_skyline",
          lambda: q.q_customers_skyline(sf_dir).count())
    timed("events_scd2_intervals",
          lambda: q.q_events_scd2_intervals(sf_dir).count())
    timed("documents_keywords",
          lambda: q.q_documents_keywords(sf_dir).count())
    timed("events_twap",
          lambda: q.q_events_twap(sf_dir).count())
    timed("ri_audit",
          lambda: q.q_ri_audit(sf_dir).count())
    # round-4 session-9 additions: inference stats, ML primitives,
    # entity resolution, hybrid retrieval
    timed("documents_nb_classify",
          lambda: q.q_documents_nb_classify(sf_dir).count())
    timed("documents_js_divergence",
          lambda: q.q_documents_js_divergence(sf_dir).count())
    timed("customers_golden_record",
          lambda: q.q_customers_golden_record(sf_dir).count())
    timed("embeddings_rrf_fusion",
          lambda: q.q_embeddings_rrf_fusion(sf_dir).count())
    timed("events_logit_purchase",
          lambda: q.q_events_logit_purchase(sf_dir).count())
    timed("documents_sentence_stats",
          lambda: q.q_documents_sentence_stats(sf_dir).count())
    # round-4 session-11 additions: graph part 2, density clustering,
    # diversified retrieval, sequential/isotonic replays
    timed("parts_copurchase_kcore",
          lambda: q.q_parts_copurchase_kcore(sf_dir).count())
    timed("parts_copurchase_bfs",
          lambda: q.q_parts_copurchase_bfs(sf_dir).count())
    timed("parts_copurchase_eigencentrality",
          lambda: q.q_parts_copurchase_eigencentrality(sf_dir).count())
    timed("embeddings_dbscan",
          lambda: q.q_embeddings_dbscan(sf_dir).count())
    timed("embeddings_mmr",
          lambda: q.q_embeddings_mmr(sf_dir).num_rows)
    timed("events_sprt",
          lambda: q.q_events_sprt(sf_dir).count())
    timed("events_isotonic_daily",
          lambda: q.q_events_isotonic_daily(sf_dir).count())
    # round-4 session-12 additions: transcripts payload ops, link
    # prediction, SFT pair construction
    timed("transcripts_sft_pairs",
          lambda: q.q_transcripts_sft_pairs(sf_dir).count())
    timed("transcripts_tool_stats",
          lambda: q.q_transcripts_tool_stats(sf_dir).count())
    timed("transcripts_context_budget",
          lambda: q.q_transcripts_context_budget(sf_dir).count())
    timed("parts_copurchase_linkpred",
          lambda: q.q_parts_copurchase_linkpred(sf_dir).count())
    timed("documents_lexical_rank",
          lambda: q.q_documents_lexical_rank(sf_dir).count())
    timed("events_bot_audit",
          lambda: q.q_events_bot_audit(sf_dir).count())
    timed("supplier_ship_lag",
          lambda: q.q_supplier_ship_lag(sf_dir).count())
    # round-5 additions: broadcast-CSR graph kernels (edge Dataset is
    # memoized, so family members after the first measure their own
    # kernel), transcripts integrity/agent-ops wave, streaming near-dup
    timed("parts_copurchase_adamic_adar",
          lambda: q.q_parts_copurchase_adamic_adar(sf_dir).count())
    timed("parts_copurchase_edge_jaccard",
          lambda: q.q_parts_copurchase_edge_jaccard(sf_dir).count())
    timed("parts_copurchase_betweenness",
          lambda: q.q_parts_copurchase_betweenness(sf_dir).count())
    timed("parts_copurchase_communities",
          lambda: q.q_parts_copurchase_communities(sf_dir).count())
    timed("transcripts_turn_integrity",
          lambda: q.q_transcripts_turn_integrity(sf_dir).count())
    timed("transcripts_loop_runs",
          lambda: q.q_transcripts_loop_runs(sf_dir).count())
    timed("transcripts_episodes",
          lambda: q.q_transcripts_episodes(sf_dir).count())
    timed("transcripts_anchor_spans",
          lambda: q.q_transcripts_anchor_spans(sf_dir).count())
    timed("transcripts_role_balance",
          lambda: q.q_transcripts_role_balance(sf_dir).count())
    timed("transcripts_tool_latency_quantiles",
          lambda: q.q_transcripts_tool_latency_quantiles(
              sf_dir).count())
    timed("events_asof_join",
          lambda: q.q_events_asof_join(sf_dir).count())
    timed("embeddings_kcenter",
          lambda: q.q_embeddings_kcenter(sf_dir).count())
    timed("embeddings_qa",
          lambda: q.q_embeddings_qa(sf_dir).count())
    timed("documents_neardup_streaming",
          lambda: q.q_documents_neardup_streaming(sf_dir).count())
    timed("transcripts_conv_dedup",
          lambda: q.q_transcripts_conv_dedup(sf_dir).count())
    timed("parts_small_qty_revenue",
          lambda: q.q_parts_small_qty_revenue(sf_dir).count())
    timed("suppliers_sole_late",
          lambda: q.q_suppliers_sole_late(sf_dir).count())
    timed("parts_copurchase_closeness",
          lambda: q.q_parts_copurchase_closeness(sf_dir).count())
    timed("documents_kneser_ney",
          lambda: q.q_documents_kneser_ney(sf_dir).count())
    timed("transcripts_training_windows",
          lambda: q.q_transcripts_training_windows(sf_dir).count())
    timed("transcripts_training_prep",
          lambda: q.q_transcripts_training_prep(sf_dir).count())
    timed("embeddings_mrl_recall",
          lambda: q.q_embeddings_mrl_recall(sf_dir).count())
    timed("events_cusum_changepoint",
          lambda: q.q_events_cusum_changepoint(sf_dir).count())
    timed("events_trimmed_mean",
          lambda: q.q_events_trimmed_mean(sf_dir).count())
    timed("transcripts_role_lexical",
          lambda: q.q_transcripts_role_lexical(sf_dir).count())
    timed("flagship_backend_agreement",
          lambda: q.q_flagship_backend_agreement(sf_dir).count())
    # round-5 late-session additions: preference pairs, similarity/
    # sketch family, graph quality scores, retrieval eval
    timed("transcripts_preference_pairs",
          lambda: q.q_transcripts_preference_pairs(sf_dir).count())
    timed("transcripts_conv_turn_jaccard",
          lambda: q.q_transcripts_conv_turn_jaccard(sf_dir).count())
    timed("parts_copurchase_modularity",
          lambda: q.q_parts_copurchase_modularity(sf_dir).count())
    timed("parts_copurchase_clustering",
          lambda: q.q_parts_copurchase_clustering(sf_dir).count())
    timed("documents_rank_agreement",
          lambda: q.q_documents_rank_agreement(sf_dir).count())
    timed("events_bloom_filter",
          lambda: q.q_events_bloom_filter(sf_dir).count())
    timed("events_count_min",
          lambda: q.q_events_count_min(sf_dir).count())
    timed("embeddings_triplet_margin",
          lambda: q.q_embeddings_triplet_margin(sf_dir).count())
    timed("documents_extractive_topsent",
          lambda: q.q_documents_extractive_topsent(sf_dir).count())
    timed("transcripts_markup_overhead",
          lambda: q.q_transcripts_markup_overhead(sf_dir).count())
    timed("transcripts_repeated_lines",
          lambda: q.q_transcripts_repeated_lines(sf_dir).count())
    timed("transcripts_id_leakage",
          lambda: q.q_transcripts_id_leakage(sf_dir).count())

    ray.shutdown()
    headline = timings["flagship_extract"]
    return {
        "metric": "flagship extraction wall time (turns→validated records)",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "num_cpus": num_cpus,
        "n_turns": n_turns,
        "n_extracted": n_extracted,
        "turns_per_sec": round(n_turns / headline, 1) if headline else None,
        "machine_parallel_capacity": capacity,
    }


def _run_flagship_only(sf_dir: str, num_cpus: int, pool: int) -> dict:
    """One timed flagship run with an explicit actor-pool width — used by
    --scaling so both parallelism levels run the same pool FRACTION
    (pool = cpus/2), keeping the comparison apples-to-apples."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocr_engine_ray.pipelines import queries as q
    from ocr_engine_ray.pipelines.flagship import flagship

    # 4× the sf corpus per level: scaling efficiency must measure
    # STEADY-STATE throughput, and a 5-second run at the top level is
    # half actor-pool startup (fixed cost) — at 100 TB runs are hours
    # and the fixed cost vanishes.  Measured: 2→8 efficiency reads
    # 0.61 un-amortized vs 0.88 with the 4× corpus on identical code.
    paths = q.transcript_paths(sf_dir) * 4
    for p in set(paths):
        with open(p, "rb") as f:
            while f.read(1 << 22):
                pass
    flagship(paths[:1], concurrency=pool).count()  # untimed warmup
    t0 = time.perf_counter()
    n = flagship(paths, concurrency=pool).count()
    dt = time.perf_counter() - t0
    ray.shutdown()
    return {"value": round(dt, 3), "n_turns": n,
            "turns_per_sec": round(n / dt, 1), "num_cpus": num_cpus,
            "pool": pool, "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])}


def _burn(n):
    x = 0
    for i in range(n):
        x += i * i
    return x


def _measure_cpu_capacity(levels=(2, 8, 32)) -> dict:
    """The sandbox machine's real parallel capacity (SMT/steal-limited):
    how many CPU-seconds per wall-second k worker processes actually get.
    Reported so the raw 8→32 efficiency can be read against the hardware
    ceiling — a real 4N-node cluster adds whole nodes, not SMT siblings."""
    import multiprocessing as mp

    burn = _burn
    n = 4_000_000
    t0 = time.perf_counter()
    burn(n)
    t1 = time.perf_counter() - t0
    out = {}
    for k in levels:
        with mp.Pool(k) as p:
            t0 = time.perf_counter()
            p.map(burn, [n] * k)
            out[f"capacity_{k}"] = round(k * t1 / (time.perf_counter() - t0), 2)
    return out


def _scaling(sf_dir: str) -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, GRAFT_SF_DIR=sf_dir,
                   GRAFT_SCALING_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flagship-only"],
            env=env, capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    results = {n: run(n) for n in (2, 8, 32)}
    tp = {n: results[n]["turns_per_sec"] for n in results}
    return {
        "metric": "flagship scaling efficiency N→4N cpus (1.0 = linear), "
                  "same pool fraction (cpus/2) at every level",
        "turns_per_sec": {str(n): tp[n] for n in tp},
        "sec": {str(n): results[n]["value"] for n in results},
        "scaling_efficiency_2_to_8": round((tp[8] / tp[2]) / 4, 3),
        "scaling_efficiency_8_to_32": round((tp[32] / tp[8]) / 4, 3),
        "machine_parallel_capacity": _measure_cpu_capacity(),
        "sf": results[2]["sf"], "n_turns": results[2]["n_turns"],
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(_scaling(sf_dir)))
        return
    if "--flagship-only" in sys.argv:
        ncpu = int(os.environ.get("GRAFT_SCALING_CPUS", "8"))
        print(json.dumps(_run_flagship_only(sf_dir, ncpu, max(1, ncpu // 2))))
        return
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32") or "32")
    print(json.dumps(_run_benchmarks(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
