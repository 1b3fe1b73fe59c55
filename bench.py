#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via a noop write (all partitions
computed, nothing collected to the driver) — the honest end-to-end cost
of the plan, the same thing a cluster would execute.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gomaxscale_spark.plans import all_queries
from gomaxscale_spark.session import get_session

#: Headline set: the flagship + one representative per operator family
#: (agg, multiway join, as-of, window fns, event-time windows, snapshot,
#: json, dedup×3, similarity, text×2, udf).
HEADLINE = [
    "flagship_user_activity",
    "q1_pricing_summary",
    "q5_region_revenue",
    "asof_join_purchase_attribution",
    "window_topk_orders_per_customer",
    "tumbling_window_counts",
    "session_window_per_user",
    "cdc_snapshot_latest_state",
    "json_extract_props",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "similarity_cosine_topk",
    "text_quality_score",
    "text_token_stats",
    # built-in window twin of udf_grouped_zscore (same oracle): the
    # headline reflects engine capability, not the Python-worker tax;
    # the applyInPandas variant stays in the catalog as the B18 proof
    "window_zscore_builtin",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "range_join_bucketed",
    "dedup_embedding_cosine",
    "text_tfidf",
    "dedup_simhash",
]


#: Measured and reported under "extra_queries" WITHOUT entering the
#: headline total — the total has been round-over-round comparable
#: since r1, so new operators get tracked here instead of inflating it.
EXTRA = [
    "cdc_snapshot_latest_state_salted",
    "dedup_embedding_lsh_scaled",
    "dedup_embedding_cc",
    "multimodal_resize_fit",
    # r6 operators (VERDICT r6 item 3): tracked here so a regression in
    # any of them shows in the bench JSON without touching the
    # r1-comparable headline total
    "multimodal_audio_features",
    "multimodal_frame_extract",
    "dedup_embedding_keep_representatives",
    "dedup_prefix_filter_join",
    "dedup_minhash_lsh_capped",
    # r7: the SCD2 validity-interval fold (C2's other standard shape)
    # and the review-queue drain (full-signature collapse of hot
    # buckets — the linear escape hatch for deferred boilerplate)
    "cdc_scd2_history",
    "dedup_minhash_lsh_hot_drain",
    # r8: the adaptive-width ANN serving twins (in-plan probe-width /
    # centroid-count dials — see SCALING.md r8 for the fixed-vs-
    # adaptive replica curves)
    "similarity_lsh_bucketed_scaled",
    "similarity_ivf_topk_scaled",
    # r9: the hot-domain escalation of sampling_domain_cap — salted
    # two-phase per-key top-K, no per-source window node
    "sampling_domain_cap_salted",
    # r9: batched brute-force cosine top-k (one corpus pass for Q
    # queries; salted per-query selection + numpy kernel)
    "similarity_cosine_topk_batch",
    # r10: PQ/ADC — rank the corpus reading only the 8-byte code column
    # (the compression half of IVF-PQ; codes are ingest-time in prod)
    "similarity_pq_adc_topk",
    # r10: exact-substring (duplicated-span) dedup — the positional
    # modality (Lee et al. 2021 shape); one window-key exchange
    "dedup_substring_coverage",
    "dedup_substring_strip",
    # r10: DSIR importance resampling (hashed-unigram LLR in µ-nats +
    # deterministic Gumbel top-k)
    "sampling_dsir_weights",
    "sampling_dsir_select",
    # r10: CCNet-style hashed bigram-LM perplexity quality scoring
    "text_bigram_perplexity",
    # r10: substring-family diagnostics + span-level decontamination +
    # the one-pass corpus profile
    "dedup_substring_span_histogram",
    "decontaminate_substring_overlap",
    "profile_documents_by_source",
    # r10: the remaining schema-feasible TPC-H shapes (q2/q11/q16/q20
    # need partsupp, which this testdata doesn't have)
    "q4_order_priority_check",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q12_linestatus_priority",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q19_disjunctive_revenue",
    "q22_global_sales_opportunity",
    # r10: event-sequence analytics
    "events_funnel_conversion",
    "events_retention_cohorts",
    "events_sessionize",
    # r10: the three-modality contamination release gate
    "contamination_report",
    # r11: Gopher char-mass n-gram repetition + the rule battery
    "text_ngram_char_repetition",
    "text_gopher_rules",
    # r11: the four-modality batch release gate (contamination + DSIR)
    "release_report",
    # r11: the two-word (m=16) PQ layout — finer cells, measured recall
    "similarity_pq16_adc_topk",
    # r11: TPC-H q21 shape + the corpus vocabulary heavy hitters
    "q21_suppliers_kept_waiting",
    "text_vocab_top_tokens",
    # r11: cross-source duplication matrix (digest self-join forensics)
    "dedup_cross_source_matrix",
    # r12: OPQ — plan-literal rotation before the subspace split
    "similarity_opq_adc_topk",
    # r12: cluster-balanced prototype subsampling (embedding-space quota)
    "sampling_cluster_balanced",
    # r12: per-dimension embedding data card (integer-exact aggregates)
    "dq_embedding_profile",
    # r13: retrieval family — BM25 (exact / hashed-df / batched),
    # hybrid RRF, deterministic shuffle
    "search_bm25_topk",
    "search_hybrid_rrf",
    "corpus_shuffle_shards",
    "search_bm25_hashed_topk",
    "search_bm25_batch_topk",
    # r13: Bloom decontamination prefilter, OHLC resample, quality deciles
    "decontaminate_bloom_prefilter",
    "timeseries_downsample_ohlc",
    "text_quality_deciles",
    # r14 (VERDICT r13 item 2): the two r13 post-record entries pick up
    # their owed cells — soft quality draw + event transition matrix
    "sampling_quality_gumbel",
    "events_transition_matrix",
    # r14: the streaming BM25 lake gate entry (now in-window) and the
    # batched hashed-df serving hot path
    "streaming_bm25_lake_availablenow",
    "search_bm25_batch_hashed_topk",
    # r14: batched hybrid fusion + the sequence-assembly family
    "search_hybrid_rrf_batch",
    "text_chunk_windows",
    "corpus_pack_sequences",
    "text_bpe_pair_counts",
    "dedup_chunk_hash",
    # r14: corpus hygiene & mixing family
    "dedup_semantic_cluster",
    "decontaminate_embedding_cosine",
    "sampling_soft_dedup_weights",
    "sampling_epoch_upsample",
    "text_filter_ablation_matrix",
    # r14 wave 2: run governance
    "sampling_mixture_divergence",
    "text_vocab_coverage",
    "dedup_split_leakage_audit",
    # r14 wave 3: DQ & design cards
    "dq_cluster_label_purity",
    "corpus_pack_efficiency",
    # r14 wave 4: the 8th real-engine streaming entry
    "streaming_mixture_monitor_availablenow",
    # r15: the capped composition of the leakage audit (VERDICT r14
    # item 5 — the bounded-by-construction production form) and the
    # iterated-BPE tokenizer-training capstone (item 6)
    "dedup_split_leakage_audit_capped",
    "text_bpe_merges",
    # r15 new families: corpus versioning, tokenizer application,
    # curriculum ordering
    "corpus_version_diff",
    "corpus_release_delta_card",
    "text_bpe_fertility_card",
    "corpus_curriculum_order",
    # r15: the 9th real-engine streaming entry (manifest-lake diff)
    "streaming_version_diff_availablenow",
    "text_bpe_fertility_by_source",
    "corpus_release_gate",
    "decontaminate_incremental_delta",
    # r16: the tokenizer loop closed (BPE-encode + real-token packing,
    # VERDICT r15 item 3) and the release-pipeline capstone (item 4)
    "corpus_tokenize_bpe",
    "corpus_pack_sequences_bpe",
    "corpus_release_pipeline",
    # r16 new family: SFT / instruction-data assembly
    "sft_assemble_conversations",
    "sft_loss_mask_spans",
    "sft_dedup_by_prompt",
    "sft_truncate_context_budget",
    "sft_pack_conversations",
    # r16 wave 2: preference-data QA family
    "pref_pairwise_matrix",
    "pref_bradley_terry",
    "pref_annotator_agreement",
    # r16 wave 3: eval-suite analysis family
    "eval_pass_at_k",
    "eval_pass_at_k_summary",
    "eval_wilson_interval",
    # r16: the 10th real-engine streaming entry (vocabulary lake)
    "streaming_bpe_vocab_lake_availablenow",
    # r16 wave 5: RL-rollout processing (truncated GAE / returns as
    # plan-literal lead folds), the deterministic loader order + resume
    # slice, and the exact-integer temperature-shares card
    "rollout_gae_advantages",
    "rollout_returns_to_go",
    "rollout_episode_card",
    "rollout_training_batch",
    "loader_epoch_order",
    "loader_resume_slice",
    "sampling_temperature_shares",
]


#: Calibration-comparability protocol (r16, VERDICT r15 item 2). The
#: frozen scan_filter_project probe has measured the HOST at
#: 0.119-0.152 s (tighter pre/post bound) on every committed record
#: r12-r15; the r15 incident was a battery recorded under a degraded
#: window (probe 0.30-0.92) whose cells then read ×1.1-2.3 on
#: unchanged code. The protocol: every record carries the pinned
#: reference, its own cal_factor (probe/reference) and
#: calibration-NORMALIZED twin cells next to the raw walls, plus a
#: host_state verdict; with SPARK_GRAFT_BENCH_STRICT=1 (the close
#: protocol sets it when producing the committed BENCH_LOCAL_r{N}
#: record) an out-of-band probe REFUSES to emit the record at all —
#: re-run on a quiet host instead of committing archaeology.
#: The pre- and post-battery probes have DIFFERENT systematic scales
#: (measured identically on every committed record r12-r15): the pre
#: probe runs on a ~30 s-old JVM (C2 still compiling, page cache cold)
#: and reads 0.277-0.342; the post probe runs after ~25 min of battery
#: (fully warmed) and reads 0.119-0.152. Judging the pre probe against
#: the warmed reference would refuse every honest battery, and judging
#: only the tighter bound lets a degraded START sneak through — so the
#: strict gate checks EACH probe against ITS OWN pinned reference and
#: requires both in band. (Necessary, not sufficient: a 2 s probe at
#: each end cannot see mid-battery contention — keep the host quiet.)
CAL_REFERENCE_MIN = 0.135  # warmed post-battery probe, r14 committed record
CAL_REFERENCE_PRE_MIN = 0.30  # young-JVM pre-battery probe, r12-r15 center
CAL_OK_BAND = (0.5, 2.0)  # acceptable cal_factor for a committed record


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def cdc_ingest_events_per_sec(n_events: int = 100_000) -> float:
    """The reference's own benchmark (gomaxscale_test.go:262-307):
    events/sec through the consumer path (socket → framing → dispatch)
    against an in-process mock server pumping insert events."""
    import json as _json

    from gomaxscale_spark.sources.client import CDCClient
    from gomaxscale_spark.sources.mock_server import MockMaxScaleServer

    events = [
        _json.dumps(
            {
                "domain": 0,
                "server_id": 1,
                "sequence": i,
                "event_number": 1,
                "timestamp": 1704067200 + i,
                "event_type": "insert",
                "id": i,
                "name": f"user-{i}",
                "email": f"user-{i}@example.com",
            }
        ).encode()
        for i in range(n_events)
    ]
    blob = b"".join(events)
    # 64 KiB wire chunks: realistic TCP segmentation, no per-event sendall
    script = [blob[i : i + 65536] for i in range(0, len(blob), 65536)]
    with MockMaxScaleServer(script=script, keep_open=2.0, honor_gtid=False) as (host, port):
        client = CDCClient(
            host,
            port,
            "example",
            "users",
            user="u",
            password="p",
            read_timeout=1.0,
            buffer_size=65536,
        )
        client.connect()
        start = time.perf_counter()
        n = 0
        for _ in client.events(max_idle_polls=2):
            n += 1
            if n >= n_events:
                break  # stop the clock at the last event, not at EOF-drain
        elapsed = time.perf_counter() - start
        client.close()
    assert n == n_events, f"ingest dropped events: {n}/{n_events}"
    return round(n / elapsed, 0)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    except ValueError:
        sf = os.path.basename(sf_dir.rstrip("/"))  # scaling replicas: keep the label
    spark = get_session("gomaxscale_spark_bench")
    registry = all_queries()

    # warm the JVM/codegen once on the cheapest query
    materialize(registry["scan_filter_project"].fn(spark, sf_dir))

    def calibrate() -> dict:
        """Best-of-5 (min + median) of the frozen calibration plan.
        r10 (VERDICT r9 item 4): the single frozen probe's own spread
        had grown past the round deltas it normalizes; best-of-5 run
        BEFORE and AFTER the battery lets bench_compare use the
        tighter bound and exposes within-run host drift directly."""
        runs = []
        for _ in range(5):
            start = time.perf_counter()
            materialize(registry["scan_filter_project"].fn(spark, sf_dir))
            runs.append(time.perf_counter() - start)
        return {
            "min": round(min(runs), 3),
            "median": round(statistics.median(runs), 3),
        }

    calibration_pre = calibrate()

    # best-of-3 per query: this host shows 2-4× run-to-run noise from
    # neighbors; the minimum is the standard noise-resistant estimator
    # of the plan's actual cost (run 1 also pays codegen compilation
    # for the wide-aggregate pipelines — the min discounts that too).
    # r6 (VERDICT r5 item 6): the median rides alongside so a noisy
    # host is detectable from the JSON alone — when median >> min on
    # queries whose code didn't change, suspect the host, not the plan.
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in HEADLINE:
        runs = []
        for _ in range(3):
            start = time.perf_counter()
            materialize(registry[name].fn(spark, sf_dir))
            runs.append(time.perf_counter() - start)
        timings[name] = round(min(runs), 3)
        medians[name] = round(statistics.median(runs), 3)

    total = round(sum(timings.values()), 3)

    extra: dict[str, float] = {}
    for name in EXTRA:
        runs = []
        for _ in range(3):
            start = time.perf_counter()
            materialize(registry[name].fn(spark, sf_dir))
            runs.append(time.perf_counter() - start)
        extra[name] = round(min(runs), 3)

    # fixed-cost calibration probe: scan_filter_project's plan has been
    # frozen since round 1 (one pushed-filter parquet scan), so its
    # round-over-round delta measures the HOST, not the repo. Run
    # best-of-5 before AND after the battery; publish the TIGHTER
    # bound per statistic (the probe measures a host floor, so the
    # smaller observation is the better estimate) plus both raw cells.
    calibration_post = calibrate()
    calibration = {
        "query": "scan_filter_project",
        "min": min(calibration_pre["min"], calibration_post["min"]),
        "median": min(calibration_pre["median"], calibration_post["median"]),
        "pre": calibration_pre,
        "post": calibration_post,
        "reference_min": CAL_REFERENCE_MIN,
    }
    # the pinned reference is an sf0.1 probe — comparing it against a
    # probe over different data is apples-to-oranges, so the
    # comparability verdict only exists at the record SF (the driver /
    # committed-record scale); replicas and smoke SFs stay raw-only
    is_reference_sf = sf == 0.1
    if is_reference_sf:
        cal_factor = round(calibration["min"] / CAL_REFERENCE_MIN, 4)
        # The refusal gate judges EACH probe against its own pinned
        # reference (see CAL_REFERENCE_PRE_MIN): the min-based factor
        # alone lets a battery that STARTED on a degraded host and
        # recovered by the end sneak through with its early cells
        # inflated (r15's committed battery: pre up to 0.92 → cells
        # ×1.1-2.3 on unchanged code). Both ends must be quiet.
        cal_factor_pre = round(
            calibration_pre["min"] / CAL_REFERENCE_PRE_MIN, 4
        )
        cal_factor_post = round(
            calibration_post["min"] / CAL_REFERENCE_MIN, 4
        )
        host_ok = all(
            CAL_OK_BAND[0] <= f <= CAL_OK_BAND[1]
            for f in (cal_factor_pre, cal_factor_post)
        )
        host_state = "ok" if host_ok else "degraded"
    else:
        cal_factor = None
        cal_factor_pre = None
        cal_factor_post = None
        host_ok = True  # nothing to refuse against
        host_state = "no-reference-for-sf"

    def normalized(cells: dict[str, float]) -> dict[str, float]:
        if cal_factor is None:
            return {}
        return {k: round(v / cal_factor, 3) for k, v in cells.items()}

    # LLM-pipeline capstone throughput: documents/sec through
    # quality-filter → exact-dedup → decontamination (best-of-2)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    cap_best = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        materialize(registry["pipeline_training_corpus"].fn(spark, sf_dir))
        cap_best = min(cap_best, time.perf_counter() - start)

    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "extra_queries": extra,
        "calibration": calibration,
        # r16 comparability protocol: cal_factor = probe/reference;
        # *_normalized cells = raw wall / cal_factor — the
        # round-over-round comparable twins (host_state != ok means
        # even the normalized cells should be read with suspicion)
        "cal_factor": cal_factor,
        # per-end probe factors — the ones the strict gate judges
        "cal_factor_pre": cal_factor_pre,
        "cal_factor_post": cal_factor_post,
        "host_state": host_state,
        "value_normalized": (
            None if cal_factor is None else round(total / cal_factor, 3)
        ),
        "queries_normalized": normalized(timings),
        "extra_queries_normalized": normalized(extra),
        "sf": sf,
        "capstone_docs_per_sec": round(n_docs / cap_best, 0),
        # best-of-2: same noise-resistance as the queries
        "cdc_ingest_events_per_sec": max(
            cdc_ingest_events_per_sec() for _ in range(2)
        ),
    }
    if os.environ.get("SPARK_GRAFT_BENCH_STRICT") == "1" and not host_ok:
        print(
            f"bench: REFUSING to emit a committed record — calibration "
            f"probe out of band {CAL_OK_BAND}: pre ×{cal_factor_pre} vs "
            f"{CAL_REFERENCE_PRE_MIN} s, post ×{cal_factor_post} vs "
            f"{CAL_REFERENCE_MIN} s (raw pre {calibration_pre['min']} / "
            f"post {calibration_post['min']} s); re-run on a quiet host",
            file=sys.stderr,
        )
        spark.stop()
        sys.exit(3)

    print(json.dumps(payload))
    # Self-sufficient record (VERDICT r11 item 6): the driver wrapper
    # stores only the LAST ~2k chars of stdout, which truncates the
    # headline head out of BENCH_r{N}.json every round. Persist the
    # complete record ourselves so round-over-round totals never depend
    # on the wrapper tail; tools/bench_compare.py reads this file
    # directly (it is the raw one-line format). The close protocol
    # commits it as BENCH_LOCAL_r{N}.json.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
    )
    try:
        with open(out_path, "w") as f:
            json.dump(payload, f)
            f.write("\n")
    except OSError as exc:  # a read-only checkout must not fail the bench
        print(f"bench: could not write {out_path}: {exc}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
