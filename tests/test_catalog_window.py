"""Guard the driver's 50-query correctness window.

The driver hash-checks only the FIRST 50 entries of ``queries()`` —
round 1 lost 61 queries to registration order. These tests pin the
invariants: every §2 family is represented inside the window, every
window entry has an oracle (a no-oracle entry burns a slot on a null
check), and the adapter in ``__spark_entry__`` preserves the ordering.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

from gomaxscale_spark.plans import all_queries

WINDOW = 50

#: family → at least one of these names must sit inside the window
FAMILY_REPRESENTATIVES = {
    "B1/B2 scan": ["scan_filter_project"],
    "B3 join": ["join_inner_customer_orders"],
    "B4 range join": ["range_join_bucketed", "range_join_theta"],
    "B5 as-of": ["asof_join_purchase_attribution"],
    "B6 agg": ["q1_pricing_summary", "agg_collect_sorted", "agg_approx_percentile"],
    "B7 rollup": ["rollup_lineitem", "cube_orders", "grouping_sets_orders"],
    "B8 window": ["window_time_range_sum", "window_topk_orders_per_customer"],
    "B9 top-k": ["topn_global_orders"],
    "B10 set ops": ["setop_intersect_all", "setop_union_all_parties"],
    "B11 scalar": ["scalar_null_handling", "scalar_math_conditional"],
    "B12 json": ["json_variant_projection", "json_extract_props"],
    "B13 pivot": ["pivot_event_type_counts", "explode_word_frequencies"],
    "B14 streaming gates": [
        "streaming_tumbling_availablenow",
        "streaming_session_availablenow",
        "streaming_dedup_availablenow",
        "streaming_static_enrichment",
        # r16: sliding rotated to tier-2 head (the overlapping-window
        # twin of the tumbling gate) to fund the manifest-lake diff
        "streaming_stream_stream_join",
        # r14: the BM25 term-statistics lake — the 7th real-engine gate
        "streaming_bm25_lake_availablenow",
        # r15: the traffic-mix drift monitor — the 8th real-engine gate
        "streaming_mixture_monitor_availablenow",
        # r16: the manifest-lake release diff — the 9th real-engine
        # entry takes the eighth B14 window row (VERDICT r15 item 1)
        "streaming_version_diff_availablenow",
    ],
    # r12 window swap: the scale-safe capped LSH form is B15's MinHash
    # slot-holder (uncapped + exact demoted to tier-2 head to fund the
    # r11-modality promotions, VERDICT r11 item 1); r13 demoted
    # dedup_incremental_batch to fund the dq_embedding_profile
    # promotion; r14 demoted dedup_connected_components_lsh (its exact
    # twin, keep-reps downstream variant, and embedding analogue all
    # stay oracle-replayed at tier 2) to fund the Bloom prefilter.
    "B15 dedup": ["dedup_minhash_lsh_capped", "dedup_substring_coverage"],
    # r8 window swap: the ADAPTIVE serving twins hold the B16 slots
    # (fixed-width forms demoted to tier-2) — the pin names the live
    # slot-holders so a future reshuffle that drops them fails here.
    # r13: brute-force cosine demoted to fund the OPQ promotion.
    # r14: the m=16 PQ row demoted (OPQ is the strict superset shape —
    # same two-word ADC machinery plus the trained rotation) to fund
    # the search_bm25_hashed_topk promotion.
    "B16 similarity": ["similarity_lsh_bucketed_scaled",
                       "similarity_ivf_topk_scaled",
                       "similarity_opq_adc_topk"],
    "B17 text": ["text_tfidf", "text_contamination_ngram"],
    # r14: the retrieval modality's gate coverage (VERDICT r13 item 1)
    "B16b retrieval": ["search_bm25_hashed_topk"],
    "B17b decontamination": ["decontaminate_bloom_prefilter",
                             "text_contamination_ngram"],
    "B18 udf": ["udf_pandas_scalar_log1p", "udf_grouped_zscore",
                "udf_mapinpandas_doc_stats", "udf_grouped_agg_mad",
                "udtf_json_key_values"],
    "C1 routing": ["cdc_event_routing"],
    "C2 snapshot": ["cdc_snapshot_latest_state", "cdc_transaction_stitching"],
    "C3 typed projection": ["json_typed_projection"],
    "C4 schema evolution": ["schema_evolution_union_by_name"],
    "DQ": ["dq_referential_orphans", "dq_column_profile"],
    "SQL API": ["sql_correlated_min_price", "sql_api_sales_by_region"],
    "sampling": ["sampling_hash_split", "sampling_stratified_sample"],
    "multimodal": ["multimodal_decode_features", "multimodal_frame_sample"],
}


def test_priority_list_is_exactly_the_window():
    """_PRIORITY must stay exactly WINDOW entries long: one short and a
    tier-2 query silently gains a gate slot, one long and a prioritized
    query silently loses its row."""
    from gomaxscale_spark.plans import _PRIORITY

    assert len(_PRIORITY) == WINDOW


def test_every_family_inside_window():
    window = set(list(all_queries())[:WINDOW])
    missing = {
        family: reps
        for family, reps in FAMILY_REPRESENTATIVES.items()
        if not window & set(reps)
    }
    assert not missing, f"families with no representative in the first {WINDOW}: {missing}"


def test_b14_all_eight_streaming_gates_inside_window():
    window = set(list(all_queries())[:WINDOW])
    gates = set(FAMILY_REPRESENTATIVES["B14 streaming gates"])
    assert gates <= window, f"streaming gates outside window: {gates - window}"


def test_scale_safe_cc_compositions_hold_the_window_slots():
    """VERDICT r4 item 1: the driver-checked slots must never carry the
    (lang, len_band)-blocked exact CC twins — they DNF'd at 10× data
    (SCALING.md) and live in tier 2 only. r11: keep-representatives
    moved to tier-2 head to fund the substring promotion (VERDICT r10
    item 3). r14: the LSH composition's own row rotated to tier-2 head
    to fund the Bloom-prefilter promotion (VERDICT r13 items 1/4) — B15
    was the most over-represented family, and the composition keeps
    dense no-gate coverage (exact twin, keep-reps variant, embedding
    analogue all full-catalog oracle-replayed; min-label fixpoint
    pytested). The standing invariant is unchanged: no exact-CC form
    may ever hold a window slot."""
    window = list(all_queries())[:WINDOW]
    assert "dedup_connected_components" not in window
    assert "dedup_keep_representatives" not in window
    assert "dedup_keep_representatives_lsh" not in window  # tier-2 since r11
    assert "dedup_connected_components_lsh" not in window  # tier-2 since r14


def test_r10_modalities_hold_gate_rows():
    """VERDICT r10 item 3: the positional-dedup, PQ-serving, and DSIR
    data-selection modalities each carry a hard per-round CORRECTNESS
    row — the driver gate must cover the newest families, not only the
    r1-era ones. Funded by B18 (5 → 3 shapes: the scalar pandas_udf and
    grouped-agg forms are tier-2 head) and B15's keep-reps variant."""
    window = set(list(all_queries())[:WINDOW])
    # r12: the PQ modality's row became the m=16 two-word layout; r14:
    # that row rotated to tier-2 head (VERDICT r13 item 1) — the
    # modality's gate coverage now flows through similarity_opq_adc_topk,
    # the strict superset shape (same two-word ADC machinery plus the
    # trained rotation; both PQ layouts stay oracle-replayed at tier 2).
    # r16 (VERDICT r15 item 1): sampling_dsir_weights rotated to
    # tier-2 head to fund the capped-leakage-audit promotion — the
    # DSIR µ-nat LLR scoring still executes in-window inside
    # release_report's data-selection leg, and the entry stays
    # full-catalog oracle-replayed every suite run.
    assert {
        "dedup_substring_coverage",
        "similarity_opq_adc_topk",
    } <= window
    assert "udf_pandas_scalar_log1p" not in window
    assert "udf_grouped_agg_mad" not in window


def test_r12_modalities_hold_gate_rows():
    """VERDICT r12 item 1 (standing policy, the exact precedent of the
    r10/r11 promotions): each round's biggest additions earn hard
    per-round CORRECTNESS rows — OPQ ADC serving, cluster-balanced
    prototype sampling, and the per-dimension embedding data card.
    Funded by similarity_cosine_topk (the re-rank kernel inside the four
    remaining B16 serving rows), text_quality_score (runs in-window
    inside the capstone and release_report composites), and
    dedup_incremental_batch (B15 was the most over-represented family;
    the incremental semantics stay pytest-exercised via the streaming
    lake sinks). All three demotions sit at tier-2 head, full-catalog
    oracle-replayed every suite run."""
    window = set(list(all_queries())[:WINDOW])
    assert {
        "similarity_opq_adc_topk",
        "sampling_cluster_balanced",
        "dq_embedding_profile",
    } <= window
    assert "similarity_cosine_topk" not in window
    assert "text_quality_score" not in window
    assert "dedup_incremental_batch" not in window


def test_r13_modalities_hold_gate_rows():
    """VERDICT r13 items 1/4 (standing policy — the exact precedent of
    the r10-r12 promotions): the retrieval family and the Bloom
    decontamination prefilter earn hard per-round CORRECTNESS rows —
    search_bm25_hashed_topk (one row covers the scoring chain, the
    bounded 64k-bucket stats artifact, AND the lake's bit-equality
    story), streaming_bm25_lake_availablenow (the 7th real-engine
    streaming gate), and decontaminate_bloom_prefilter (the 100 TB
    decontamination topology next to its exact-broadcast twin). Funded
    by text_language_id, similarity_pq16_adc_topk, and
    dedup_connected_components_lsh — all at tier-2 head, full-catalog
    oracle-replayed every suite run."""
    window = set(list(all_queries())[:WINDOW])
    assert {
        "search_bm25_hashed_topk",
        "streaming_bm25_lake_availablenow",
        "decontaminate_bloom_prefilter",
    } <= window
    assert "text_language_id" not in window
    assert "similarity_pq16_adc_topk" not in window
    assert "dedup_connected_components_lsh" not in window


def test_capped_lsh_holds_the_minhash_window_slot():
    """VERDICT r6 item 6 established the count-first-capped MinHash-LSH
    twin — the form that survives a boilerplate hot band key at 100 TB —
    in the window; r12 (VERDICT r11 item 1) completed the standing
    scale-safe-twin policy by demoting the uncapped form to tier-2 head
    to fund the Gopher promotion. The capped form must keep the slot."""
    window = list(all_queries())[:WINDOW]
    assert "dedup_minhash_lsh_capped" in window
    assert "dedup_minhash_lsh" not in window


def test_r11_modalities_hold_gate_rows():
    """VERDICT r11 item 1: each round's biggest additions earn hard
    per-round CORRECTNESS rows — the Gopher repetition battery, the
    four-modality release gate, and the m=16 two-word PQ layout. Funded
    by dedup_minhash_lsh (capped twin keeps B15's MinHash row),
    dedup_exact_documents (hashed twin in tier 2; semantics in-window
    via the capstone), and the m=8 PQ layout (coarser variant). r14:
    the m=16 row itself rotated to tier-2 head — the PQ/ADC modality's
    gate coverage continues through the OPQ superset row (see
    test_r10_modalities_hold_gate_rows). r16 (VERDICT r15 item 1):
    text_ngram_char_repetition rotated to tier-2 head to fund the
    text_bpe_merges promotion — B17 was the most over-represented
    family (5 window rows); the battery stays full-catalog
    oracle-replayed every suite run and its struct-array machinery is
    pytested directly."""
    window = set(list(all_queries())[:WINDOW])
    assert {
        "release_report",
        "similarity_opq_adc_topk",
    } <= window
    assert "similarity_pq_adc_topk" not in window
    assert "similarity_pq16_adc_topk" not in window  # tier-2 since r14
    assert "dedup_exact_documents" not in window


def test_scale_safe_embedding_neardup_holds_the_window_slot():
    """VERDICT r5 item 1 established that the driver-checked embedding
    near-dup slot carries a SCALE-SAFE form only: the fixed 8-bit
    signature gives N²/256 candidate growth and DNF'd (>15 min) at the
    30× replica (SCALING.md). r15 (VERDICT r14 item 3): the slot
    rotated from the adaptive sign-LSH to dedup_semantic_cluster —
    SemDeDup's k-means blocking, itself measured k-grown-linear at x30
    where fixed-k went quadratic — and the adaptive sign-LSH form moved
    to tier-2 head (full-catalog oracle-replayed). The standing
    invariant: the FIXED sign-LSH form never returns to the window."""
    window = list(all_queries())[:WINDOW]
    assert "dedup_semantic_cluster" in window
    assert "dedup_embedding_lsh" not in window


def test_r14_families_hold_gate_rows():
    """VERDICT r14 item 3 (standing r10-r13 promotion policy): the r14
    families earn hard per-round CORRECTNESS rows — dedup_semantic_
    cluster (the web-scale semantic-dedup topology), corpus_pack_
    sequences (the training-sequence assembly spine), and streaming_
    mixture_monitor_availablenow (the 8th real-engine gate). Funded by
    dedup_embedding_lsh_scaled, similarity_lsh_bucketed_scaled, and
    cdc_snapshot_latest_state_salted — each the long-tail twin of a
    family that keeps in-window coverage; all three at tier-2 head,
    full-catalog oracle-replayed every suite run."""
    window = set(list(all_queries())[:WINDOW])
    assert {
        "dedup_semantic_cluster",
        "corpus_pack_sequences",
        "streaming_mixture_monitor_availablenow",
    } <= window
    assert "dedup_embedding_lsh_scaled" not in window
    assert "similarity_lsh_bucketed_scaled" not in window
    assert "cdc_snapshot_latest_state_salted" not in window


def test_window_entries_all_have_oracles():
    qs = all_queries()
    null_slots = [n for n in list(qs)[:WINDOW] if qs[n].oracle is None]
    assert not null_slots, f"no-oracle queries burning window slots: {null_slots}"


def test_at_most_one_no_oracle_query_total():
    # judge contract: ≤3 without an oracle, each with written
    # justification; we hold ourselves to 1 (dedup_simhash)
    no_oracle = sorted(n for n, q in all_queries().items() if q.oracle is None)
    assert no_oracle == ["dedup_simhash"], no_oracle


def test_doc_banners_match_live_registry():
    """VERDICT r11 item 7: the SURVEY.md / README.md headline banners
    drifted (still said 181 two rounds later) because nothing enforced
    them. Parse the catalog-size claims out of both banners and pin them
    to the live registry — adding a query now REQUIRES bumping the
    banners in the same commit."""
    import re

    qs = all_queries()
    total, with_oracle = len(qs), sum(1 for q in qs.values() if q.oracle is not None)

    root = Path(__file__).resolve().parents[1]
    survey = (root / "SURVEY.md").read_text()
    m = re.search(r"(\d+) catalog queries, (\d+) DuckDB-oracle-checked", survey)
    assert m, "SURVEY.md banner lost its catalog-count sentence"
    assert (int(m.group(1)), int(m.group(2))) == (total, with_oracle), (
        f"SURVEY.md banner says {m.groups()}, registry is {(total, with_oracle)}"
    )

    readme = (root / "README.md").read_text()
    m = re.search(
        r"catalog of (\d+) `\(spark, sf_dir\).*?operators,\n\s+(\d+) of them",
        readme,
        re.DOTALL,
    )
    assert m, "README.md banner lost its catalog-count sentence"
    assert (int(m.group(1)), int(m.group(2))) == (total, with_oracle), (
        f"README.md banner says {m.groups()}, registry is {(total, with_oracle)}"
    )


def test_spark_entry_preserves_priority_order():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("__spark_entry__", mod)
    spec.loader.exec_module(mod)
    assert list(mod.queries())[:WINDOW] == list(all_queries())[:WINDOW]
    oracles = mod.oracle_sql()
    for name in list(all_queries())[:WINDOW]:
        assert name in oracles


def test_bench_query_lists_resolve_in_registry():
    """A typo in bench.py's HEADLINE/EXTRA lists would KeyError midway
    through the driver's bench run — pin every name to the registry."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parents[1] / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    registry = set(all_queries())
    missing = [n for n in bench.HEADLINE + bench.EXTRA if n not in registry]
    assert not missing, f"bench names not in the registry: {missing}"
    assert "scan_filter_project" in registry  # the calibration probe


def test_r15_families_hold_gate_rows():
    """VERDICT r15 item 1 (standing policy — the exact precedent of
    the r10-r14 promotions): the r15 families earn hard per-round
    CORRECTNESS rows — corpus_version_diff (the versioning spine),
    text_bpe_merges (the tokenizer-training capstone),
    streaming_version_diff_availablenow (the 9th real-engine
    streaming entry), and dedup_split_leakage_audit_capped (the
    scale-safe twin of the leakage audit). Funded by
    streaming_sliding_availablenow (tumbling's overlapping-window
    twin), sampling_dsir_weights (runs in-window inside
    release_report), text_ngram_char_repetition (B17 held five
    rows), and udf_mapinpandas_doc_stats (the mapInPandas shape runs
    in-window via multimodal_decode_features) — all at tier-2 head,
    full-catalog oracle-replayed every suite run."""
    window = set(list(all_queries())[:WINDOW])
    assert {
        "corpus_version_diff",
        "text_bpe_merges",
        "streaming_version_diff_availablenow",
        "dedup_split_leakage_audit_capped",
    } <= window
    assert "streaming_sliding_availablenow" not in window
    assert "sampling_dsir_weights" not in window
    assert "text_ngram_char_repetition" not in window
    assert "udf_mapinpandas_doc_stats" not in window
