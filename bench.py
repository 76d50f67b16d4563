"""Benchmark harness: headline KG pipeline + representative operator queries.

Plain run (one JSON line, driver contract):
    RAY_GRAFT_CPUS=32 GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py

Scaling run (north rule: two parallelism levels in fresh processes):
    python bench.py --scaling       # 4 vs 16 CPUs (N and 4N) on the same input
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "tpch_q1_pricing_summary",
    "hash_join_lineitem_orders",
    "broadcast_join_orders",
    "tumbling_window_events",
    "exact_dedup_docs",
    "minhash_dedup_docs",
    "ann_cosine_topk",
    "token_count_docs",
    "langid_quality_docs",
    "simhash_docs",
    "cumsum_orders",
    "top_bigrams_per_lang",
    "bloom_semi_join_lineitem",
    "heavy_hitter_users",
    "stratified_split_docs",
    "pack_sequences_docs",
    "tfidf_top_terms",
    "inverted_index_docs",
    "bm25_topk_docs",
    "skew_join_events",
    "decontam_docs",
    "dense_rank_orders",
    "chunk_dedup_docs",
    "pii_scrub_docs",
    "lm_perplexity_docs",
    "bpe_token_counts_docs",
    "deterministic_shuffle_docs",
    "jaccard_selfjoin_docs",
    "interval_join_orders_lineitem",
    "corr_matrix_lineitem",
    "pca_embeddings",
    "weighted_sample_parts",
    "classifier_finetune_docs",
    "entropy_docs",
    "quantiles_by_brand_parts",
    "cube_orders",
    "semantic_dedup_embeddings",
    "countmin_user_freq_events",
    "source_cap_docs",
    "distinct_users_per_type_events",
    "zscore_outliers_events",
    "rank_stats_orders",
    "dup_gram_docs",
    "editdist_join_customers",
    "unpivot_lineitem",
    "winsorize_parts",
    "rolling_median_orders",
    "transition_counts_events",
    "funnel_events",
    "collect_topk_docs",
    "mode_quantity_lineitem",
    "mad_value_events",
    "regex_extract_docs",
    "retention_cohorts_events",
    "bfs_depths_lineitem",
    "star_join_revenue_nation",
    "streaks_events",
    "revenue_share_orders",
    "table_diff_orders",
    "quantile_cont_brand_parts",
    "weighted_avg_price_lineitem",
    "upsert_orders",
    "trending_types_daily_events",
    "normalized_dedup_docs",
    "activity_histogram_events",
    "corr_by_brand_parts",
    "compress_runs_events",
    "latest_event_per_user",
    "time_rollup_events",
    "bounce_rate_users",
    "wow_growth_events",
    "profile_orders",
    "composite_join_lineitem",
    "checksum_orders",
    "churned_users_events",
    "pct_change_orders",
    "except_orders_pairs",
    "chunk_overlap_docs",
    "impute_group_mean_orders",
    "union_by_name_orders",
    "windowed_distinct_events",
    "collect_ordered_events",
    "fk_violations_audit",
    "regr_slope_brand_parts",
    "minmax_normalize_parts",
    "topk_ties_parts",
    "trailing_range_sum_orders",
    "explode_tokens_docs",
    "incremental_agg_orders",
    "pushdown_filter_orders",
    "seqmatch_events",
    "feature_hash_docs",
    "target_encode_orders",
    "ordinal_encode_parts",
    "kfold_split_docs",
    "rrf_fusion_docs",
    "trimmed_mean_parts",
    "twohop_parts",
    "split_leakage_docs",
    "dup_rate_by_source_docs",
    "mutual_info_parts",
    "ks_drift_orders",
    "medoid_embeddings",
    "negative_sample_lineitem",
    "cohens_kappa_docs",
    "js_divergence_sources",
    "grouping_sets_orders",
    "vocab_coverage_docs",
    "weighted_median_parts",
    "quota_topk_parts",
    "global_rank_orders",
    "quantile_normalize_docs",
    "fuzzy_decontam_docs",
    "bernoulli_sample_docs",
    "pareto_front_parts",
    "asof_forward_events",
    "intersect_orders_pairs",
    "chi2_parts",
    "gini_customer_spend",
    "autocorr_events",
    "path_trigrams_events",
    "psi_orders",
    "ndcg_docs",
    "gap_cv_users",
    "fleiss_kappa_docs",
]


def _consume(res) -> int:
    """Count rows without materializing to the driver."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, pa.Table):
        return res.num_rows
    return len(res)


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    from folkscope_ray.pipelines.kg import build_kg
    from folkscope_ray.synth import corpus_for_sf, n_files_for_sf, sf_of_dir

    sf = sf_of_dir(SF_DIR)
    src = corpus_for_sf(SF_DIR)
    n_files = n_files_for_sf(sf)

    # warm the OS page cache so we measure compute + shuffle, not cold disk
    import pyarrow.parquet as pq

    pq.read_table(src)

    t0 = time.time()
    kg = build_kg(src)
    n_triples = kg.triples().count()
    t_kg = time.time() - t0

    q_times: dict[str, float] = {}
    if os.environ.get("KG_BENCH_QUERIES", "1") != "0":
        # fresh session for the query suite: the KG build leaves the object
        # store full of spilled blocks, which taxes every query measured
        # after it (same-query times were 2-4x their solo values)
        ray.shutdown()
        ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
        DataContext.get_current().enable_progress_bars = False
        # warm the worker pool so the first timed query doesn't absorb
        # Ray worker startup (~5 s of pure process spawn at 32 cpus)
        import ray.data as _rd

        _rd.range(NCPU * 4, override_num_blocks=NCPU * 4).map_batches(
            lambda b: b).count()
        qs = entrymod.queries()
        for name in BENCH_QUERIES:
            t0 = time.time()
            _consume(qs[name](SF_DIR))
            q_times[name] = round(time.time() - t0, 3)

    out = {
        "metric": "kg_pipeline_e2e",
        "value": round(t_kg, 3),
        "unit": "sec",
        "queries": q_times,
        "sf": sf,
        "num_cpus": NCPU,
        "n_files": n_files,
        "n_triples": n_triples,
        "files_per_sec": round(n_files / t_kg, 2),
    }
    ray.shutdown()
    # busy-loop hardware calibration recorded WITH the bench row (r4 verdict
    # ask 7): two aggregate throughputs (8-proc and NCPU-proc, M iters/s)
    # taken in the same window make this row comparable across the shared
    # VM's 2-7x load swings — a low hw_calib_hi/hw_calib_lo ratio means the
    # window was contended and absolute times here read slow.
    calib_lo = min(8, NCPU)
    out["hw_calib_lo"] = round(
        cpu_aggregate_throughput(calib_lo, n=8_000_000), 1)
    # when NCPU <= 8 the two levels coincide — reuse the measurement
    # instead of re-running the identical busy-loop (the ratio is then
    # uninformative by construction and reads as exactly 1.0)
    out["hw_calib_hi"] = out["hw_calib_lo"] if NCPU == calib_lo else round(
        cpu_aggregate_throughput(NCPU, n=8_000_000), 1)
    out["hw_calib_procs"] = [calib_lo, NCPU]
    return out


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def cpu_aggregate_throughput(nproc: int, n: int = 20_000_000) -> float:
    """Raw hardware parallel throughput at ``nproc`` busy-loop processes
    (M iters/s aggregate) — calibrates what perfect scaling CAN measure on
    this box: the VM advertises 32 processors but SMT/shared cores cap the
    8->32 aggregate ratio at ~3x, so a perfectly-scaling job measures ~0.74
    raw efficiency here.  The normalized number (job / hardware ceiling) is
    the multi-node-relevant one."""
    import multiprocessing as mp
    import time as _t

    t0 = _t.time()
    with mp.Pool(nproc) as p:
        p.map(_burn, [n] * nproc)
    return nproc * n / (_t.time() - t0) / 1e6


def run_scaling():
    """Same job at two parallelism levels in fresh processes; report
    throughputs + efficiency = (T_lo / T_hi) / (cpus_hi / cpus_lo), plus the
    measured HARDWARE scaling ceiling between the same two levels and the
    hardware-normalized job efficiency.

    Each level runs ``KG_BENCH_REPEATS`` times (default 2) and takes the MIN:
    wall-clock variance on a shared VM is ±25%, and min-of-N is the standard
    way to measure the pipeline rather than the neighbours.

    Default levels are 4 and 16 (N and 4N): at num_cpus=32 every SMT thread
    of the box is claimed, so Ray's own system processes (raylet, object
    store, driver) contend with task workers — a single-node artifact a real
    multi-node cluster does not have (system processes scale with node
    count).  The 4->16 pair stays below that regime; the busy-loop hardware
    ceiling reported alongside calibrates whatever pair is chosen."""
    lo = int(os.environ.get("SCALE_LO", "4"))
    hi = int(os.environ.get("SCALE_HI", "16"))
    repeats = int(os.environ.get("KG_BENCH_REPEATS", "2"))

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR,
                   KG_BENCH_QUERIES="0")
        best = None
        for _ in range(repeats):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["value"] < best["value"]:
                best = r
        return best

    r_lo, r_hi = one(lo), one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    # hardware ceiling: best-of-N busy-loop aggregates at the same two levels
    hw_lo = max(cpu_aggregate_throughput(lo) for _ in range(repeats))
    hw_hi = max(cpu_aggregate_throughput(hi) for _ in range(repeats))
    hw_ceiling = (hw_hi / hw_lo) / (hi / lo)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "cpus_lo": lo, "cpus_hi": hi,
        "files_per_sec_lo": r_lo["files_per_sec"],
        "files_per_sec_hi": r_hi["files_per_sec"],
        "hw_ceiling": round(hw_ceiling, 3),
        "normalized_efficiency": round(min(eff / hw_ceiling, 1.5), 3),
        "repeats": repeats,
        "sf": r_hi["sf"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
