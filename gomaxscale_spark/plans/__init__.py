"""Query catalog: every operator from SURVEY.md §2 exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
a DuckDB oracle twin. The driver consumes these via ``__spark_entry__``.

Ordering matters: the driver's correctness gate evaluates the FIRST 50
registry entries, so ``all_queries`` returns an explicitly prioritized
ordering — one-or-more representatives of EVERY SURVEY §2 family
(B1-B18, C1-C4) plus the DQ / SQL-API / sampling / multimodal surfaces
inside the first 50, long-tail variants of already-represented families
after. Tier 2 leads with the near-miss family variants so a wider gate
window still picks high-information queries first.
"""

from __future__ import annotations

from .base import REGISTRY, Query

# importing the modules populates REGISTRY
from . import relational as _relational  # noqa: E402,F401
from . import llm as _llm  # noqa: E402,F401
from . import cdc_stream as _cdc_stream  # noqa: E402,F401

#: First 50 = the driver's correctness window. Grouped by SURVEY §2
#: family; every family has at least one entry here.
_PRIORITY: list[str] = [
    # B1/B2 scan + filter + project
    "scan_filter_project",
    # B6 aggregates (incl. the round-2 canonicalizer/no-oracle fixes)
    "q1_pricing_summary",
    "agg_collect_sorted",
    # B3 join family
    "join_inner_customer_orders",
    # B4 theta/range join
    "range_join_bucketed",
    # B5 as-of join
    "asof_join_purchase_attribution",
    # B7 rollup/cube/grouping sets
    "rollup_lineitem",
    # B8 window functions
    "window_time_range_sum",
    # B9 sort/limit/top-k
    "topn_global_orders",
    # B10 set ops
    "setop_intersect_all",
    # B11 scalar functions
    "scalar_null_handling",
    # B12 JSON / VARIANT
    "json_variant_projection",
    # B13 pivot/explode
    "pivot_event_type_counts",
    # C3 typed payload projection
    "json_typed_projection",
    # C4 schema evolution
    "schema_evolution_union_by_name",
    # B14 streaming: the 6 real-engine gates + batch flagship
    "streaming_tumbling_availablenow",
    "streaming_session_availablenow",
    "streaming_dedup_availablenow",
    "streaming_static_enrichment",
    # r16 (VERDICT r15 item 1): streaming_sliding_availablenow rotated
    # to tier-2 head to fund the streaming_version_diff_availablenow
    # promotion below — sliding is the overlapping-window TWIN of the
    # tumbling gate that stays in-window (same engine path, same
    # drain helper), it remains full-catalog oracle-replayed every
    # suite run, and B14 keeps eight real-engine rows.
    "streaming_stream_stream_join",
    # r14 (VERDICT r13 item 1): the SEVENTH real-engine streaming gate —
    # the BM25 term-statistics lake fed through readStream/foreachBatch
    # (availableNow), scored against committed epoch sums. B14 coverage
    # for the r13 retrieval lake. Funded by the text_language_id
    # demotion (B17 held four window rows; the n-gram heuristic is a
    # pure codegen map whose shape the quality family already covers,
    # and it stays full-catalog oracle-replayed at tier-2 head).
    "streaming_bm25_lake_availablenow",
    # r15 (VERDICT r14 item 3): the EIGHTH real-engine streaming gate —
    # the windowed traffic-mix drift monitor (per-hour event-type
    # shares + KL vs the plan-literal expected mix; engine maintains
    # the minimal keyed counts, shares/KL computed on the serving
    # read). Funded by the cdc_snapshot_latest_state_salted demotion.
    "streaming_mixture_monitor_availablenow",
    # r16 (VERDICT r15 item 1): the NINTH real-engine streaming entry
    # — incremental release diffing served off the epoch-committed
    # (id, digest) manifest lake — earns its hard per-round
    # CORRECTNESS row (standing promotion policy: each round's new
    # families rotate into the gate). Funded by the
    # streaming_sliding_availablenow demotion above.
    "streaming_version_diff_availablenow",
    "flagship_user_activity",
    # sampling / splits
    "sampling_hash_split",
    # C1/C2 CDC-relational bridge
    "cdc_event_routing",
    "cdc_snapshot_latest_state",
    "cdc_transaction_stitching",
    # r6 (VERDICT r5 item 7) promoted the skew-proof salted max_by fold;
    # r15 (VERDICT r14 item 3) rotated it back to tier-2 head to fund
    # the streaming_mixture_monitor promotion — it is the long-tail
    # TWIN of cdc_snapshot_latest_state (same semantics, salted fold),
    # its skew behavior stays pinned by test_stateful_skew's
    # result-equality tests, and it remains full-catalog
    # oracle-replayed every suite run.
    # B15 dedup (incl. the incremental batch-vs-lake capstone). The CC
    # and keep-representatives slots carry the bounded LSH compositions
    # (r5, per VERDICT r4): the (lang, len_band)-blocked exact twins
    # DNF'd at 10× data (SCALING.md) and now sit in tier 2 as
    # small-block exact semantics.
    # r12 (VERDICT r11 item 1): dedup_exact_documents demoted to tier-2
    # head — its md5-digest twin dedup_exact_hashed stays oracle-replayed
    # every suite run and the exact-dedup semantics also run inside the
    # capstone pipeline_training_corpus, which holds a window row. Slot
    # funds the release_report promotion.
    # r14 (VERDICT r13 item 1): text_language_id demoted to tier-2 head
    # to fund the streaming BM25 lake promotion above — see the B14
    # comment; B17 keeps tfidf + contamination + n-gram repetition +
    # release_report (+ the Bloom prefilter below) in-window.
    # r12 (VERDICT r11 item 1): the uncapped MinHash-LSH form demoted to
    # tier-2 head — standing policy says the gate carries the scale-safe
    # twin, and dedup_minhash_lsh_capped (count-first bucket cap) IS that
    # twin and keeps its row below. Slot funds the Gopher promotion.
    # r7 (VERDICT r6 item 6): the capped form joins the window alongside
    # the uncapped one — no measured DNF this time (uncapped held 2.8×
    # wall for 3× data at x30), but the count-first bucket cap is the
    # form that survives a boilerplate hot band key at 100 TB, and the
    # standing policy is that the driver gate carries the scale-safe
    # twin. Slot funded by agg_approx_percentile (B6 keeps two window
    # rows: q1 + collect_sorted; the sketch battery moves to tier-2
    # head, still full-catalog oracle-replayed every suite run).
    "dedup_minhash_lsh_capped",
    # r14 (VERDICT r13 items 1/4): dedup_connected_components_lsh demoted
    # to tier-2 head to fund the decontaminate_bloom_prefilter promotion
    # — B15 was still the most over-represented family in the window,
    # and the CC composition keeps dense coverage without a gate row:
    # its blocked-exact semantics twin (dedup_connected_components), its
    # downstream keep-reps variant, and its embedding analogue
    # (dedup_embedding_cc) are all full-catalog oracle-replayed every
    # suite run, and the min-label fixpoint is pytested directly. The
    # exact twins still never return to the window (r4 pin, updated).
    # The Bloom prefilter is the 100 TB decontamination topology — the
    # fixed 140 KB broadcast form of the family whose exact-broadcast
    # twin (text_contamination_ngram) also stays in-window, so the gate
    # now checks BOTH contamination forms.
    "decontaminate_bloom_prefilter",
    # r11 (VERDICT r10 item 3): the exact-substring (positional) dedup
    # modality gets its hard per-round CORRECTNESS row — it was the
    # biggest r10 addition with zero gate coverage. Slot funded by
    # dedup_keep_representatives_lsh (tier-2 head): CC already carries
    # the LSH-composition shape in the window, and keep-reps is its
    # downstream variant (same candidates, same verify, one more join).
    "dedup_substring_coverage",
    # r16 (VERDICT r15 item 1): the capped train/eval leakage audit —
    # identical split arithmetic over the count-first-capped pair
    # pipeline, the form whose cost is bounded before any pair exists
    # (measured 44× the uncapped form at x100, SCALING.md r15) — gets
    # its gate row. Funded by the sampling_dsir_weights demotion (see
    # the sampling comment below): the gate keeps the scale-safe twin
    # discipline for the leakage family the same way it does for
    # MinHash-LSH above.
    "dedup_split_leakage_audit_capped",
    # r13 (VERDICT r12 item 1): dedup_incremental_batch demoted to
    # tier-2 head — B15 was the most over-represented family in the
    # window (the verdict counted 8 rows), the incremental batch-vs-lake
    # semantics stay pytest-exercised through the streaming lake sinks
    # (IncrementalEmbeddingIndexSink / text-dedup lake) and the entry
    # stays full-catalog oracle-replayed every suite run. Slot funds the
    # dq_embedding_profile promotion.
    # r13 (VERDICT r12 item 1): similarity_cosine_topk demoted to tier-2
    # head — the brute-force baseline's semantics are subsumed by the
    # four B16 serving rows that remain in-window (adaptive LSH, adaptive
    # IVF, m=16 PQ ADC, and the newly promoted OPQ ADC, which re-ranks
    # its shortlist with the same exact-cosine kernel). Slot funds the
    # similarity_opq_adc_topk promotion.
    # r8 (VERDICT r7 item 2): both ANN SERVING slots swap to their
    # adaptive-width twins — the fixed forms' per-probe scan is provably
    # linear in the corpus (probed rows 149 → 4,611 across x1→x30 for
    # the 4-plane bucket; n_probe/n_centroids = a quarter of the corpus
    # for 16-centroid IVF), while the adaptive forms hold it at ~the
    # 128-row target resp. ~4·√N by deriving the width in-plan from
    # count(*) (SCALING.md r8 ingest/probe decomposition, incl. the
    # honest one-shot table where fixed wins because the adaptive forms
    # deliberately move cost to amortized ingest). Fixed twins stay in
    # tier 2, full-catalog oracle-replayed.
    # r15 (VERDICT r14 item 3): similarity_lsh_bucketed_scaled rotated
    # to tier-2 head to fund the corpus_pack_sequences promotion — B16
    # held four window rows and the adaptive-IVF row below covers the
    # same bucketed-ANN serving story (count-derived probe width,
    # zero-exchange probe); the LSH form stays full-catalog
    # oracle-replayed every suite run and its adaptive-width plan shape
    # stays pinned in test_plan_shapes.py.
    "similarity_ivf_topk_scaled",
    # r6 (VERDICT r5 item 1) put the ADAPTIVE-width banded sign-LSH in
    # the window (fixed 8-bit form DNF'd at the 30× replica); r15
    # (VERDICT r14 item 3) rotated it to tier-2 head to fund the
    # dedup_semantic_cluster promotion — the embedding near-dup
    # modality's gate coverage now flows through SemDeDup (the modern
    # web-scale semantic-dedup topology: learned k-means blocking
    # instead of sign-LSH bands, measured k-grown-linear at x30 where
    # fixed-k went quadratic). The adaptive sign-LSH form stays
    # full-catalog oracle-replayed every suite run; the r5 invariant
    # (the FIXED form never returns to the window) is unchanged and
    # still pinned in test_catalog_window.py.
    "dedup_semantic_cluster",
    # r11 (VERDICT r10 item 3): the PQ/IVF-PQ serving tier gets a gate
    # row — ADC top-k over literal codebooks, oracle-exact. r12 (VERDICT
    # r11 item 1): the slot swaps to the m=16 two-word layout — the
    # recall-winning variant (recall@10 0.56→0.92 at x30 top-500,
    # SCALING.md r11) and the structurally harder shape (two code words,
    # varargs-LUT ADC); the m=8 twin moves to tier-2 head, still
    # full-catalog oracle-replayed every suite run.
    # r14 (VERDICT r13 item 1): similarity_pq16_adc_topk demoted to
    # tier-2 head to fund the search_bm25_hashed_topk promotion — the
    # ADC family held two window rows and the OPQ row below exercises
    # the same two-word ADC machinery PLUS the trained rotation (it is
    # the strict superset shape); both PQ layouts stay full-catalog
    # oracle-replayed every suite run.
    # r14 (VERDICT r13 item 1): the hashed-df BM25 serving form — ONE
    # row covers the retrieval scoring chain, the bounded 64k-bucket
    # stats artifact, AND the streaming lake's bit-equality story (its
    # score() runs this exact code path; batch ≡ lake pytested).
    "search_bm25_hashed_topk",
    # r13 (VERDICT r12 item 1): OPQ — the rotation-before-subspace-split
    # serving tier built in r12 (trained Lloyd↔Procrustes rotation, three
    # bit-equal forms, oracle replays rotation+codes+ranks) — gets its
    # hard per-round CORRECTNESS row. Funded by the similarity_cosine_topk
    # demotion above.
    "similarity_opq_adc_topk",
    # B17 text analysis (incl. the benchmark-decontamination capstone).
    # r13 (VERDICT r12 item 1): text_quality_score demoted to tier-2 head
    # — its heuristics run in-window inside BOTH composites that consume
    # them (pipeline_training_corpus's quality leg and release_report's
    # gate), making it the most redundant of the three B17 quality rows.
    # Slot funds the sampling_cluster_balanced promotion.
    "text_tfidf",
    "text_contamination_ngram",
    # r12 (VERDICT r11 item 1): the Gopher char-mass n-gram repetition
    # battery earned its row here; r16 (VERDICT r15 item 1) rotated it
    # to tier-2 head to fund the text_bpe_merges promotion below — B17
    # was the most over-represented family in the window (5 rows), the
    # battery stays full-catalog oracle-replayed every suite run, and
    # its char-mass struct-array machinery is pytested directly.
    # r16 (VERDICT r15 item 1): the tokenizer-TRAINING capstone — K=4
    # iterated BPE merges (vocabulary-bounded state, per-round argmax
    # = one collected row) — gets its hard per-round CORRECTNESS row;
    # the whole r15/r16 tokenizer family (fertility cards, encode,
    # real-token packing) hangs off this chain.
    "text_bpe_merges",
    # north-star composition: quality-filter → dedup → decontaminate
    "pipeline_training_corpus",
    # r12 (VERDICT r11 item 1): the four-modality release gate — the
    # composition that chains the audited contamination legs + DSIR into
    # one release verdict — joins the window. Funded by the
    # dedup_exact_documents demotion above.
    "release_report",
    # B18 UDF shapes — r11: three window reps (applyInPandas,
    # mapInPandas, UDTF); the scalar pandas_udf and grouped-agg shapes
    # moved to tier-2 head to fund the r10-modality promotions
    # (VERDICT r10 item 3). r16 (VERDICT r15 item 1):
    # udf_mapinpandas_doc_stats rotated to tier-2 head to fund the
    # corpus_version_diff promotion below — the mapInPandas API shape
    # keeps an in-window exerciser (multimodal_decode_features is an
    # Arrow-batched mapInPandas) and the entry stays full-catalog
    # oracle-replayed every suite run.
    "udf_grouped_zscore",
    "udtf_json_key_values",
    # r16 (VERDICT r15 item 1): the corpus-versioning SPINE — the
    # content-addressed release diff whose digest-projection join
    # (40-byte rows, text never shuffles) every other versioning
    # entry (delta card, gate, incremental decon, release pipeline,
    # manifest lake) builds on — gets its hard per-round CORRECTNESS
    # row. Funded by the udf_mapinpandas_doc_stats demotion above.
    "corpus_version_diff",
    # r11 (VERDICT r10 item 3): DSIR importance-resampling weights
    # earned the data-selection gate row; r16 (VERDICT r15 item 1)
    # rotated it to tier-2 head to fund the
    # dedup_split_leakage_audit_capped promotion above — the DSIR
    # µ-nat LLR scoring executes in-window inside release_report's
    # data-selection leg, and the entry stays full-catalog
    # oracle-replayed every suite run.
    # r13 (VERDICT r12 item 1): cluster-balanced prototype sampling — the
    # embedding-space domain cap (Arrow assign_nearest kernel, 28× the
    # fan-out+window form at x100, quota ranks on the 6dp-rounded score).
    # Funded by the text_quality_score demotion above.
    "sampling_cluster_balanced",
    # r15 (VERDICT r14 item 3): the training-sequence assembly spine —
    # token-budget sequence packing (GPT-style concat order as a
    # provenance map: ONE shard-keyed cumsum exchange, measured linear
    # at the replicas). The r14 sequence-assembly family's gate row.
    # Funded by the similarity_lsh_bucketed_scaled demotion.
    "corpus_pack_sequences",
    # data-quality gate
    "dq_referential_orphans",
    # r13 (VERDICT r12 item 1): the per-dimension embedding data card —
    # µ-int BIGINT aggregation (order-immune parity), the measurement
    # behind the OPQ isotropy verdict. Funded by the
    # dedup_incremental_batch demotion above.
    "dq_embedding_profile",
    # SQL API (correlated subquery)
    "sql_correlated_min_price",
    # multimodal plumbing
    "multimodal_decode_features",
]

#: Tier 2: nearest-miss variants of families already represented above —
#: first in line if the gate window ever widens.
_TIER2: list[str] = [
    # r16 NEW FAMILIES wave 5 at tier-2 head (standing pattern):
    # RL-rollout processing — truncated GAE advantages / returns-to-go
    # re-expressed as H plan-literal lead() folds (no backward
    # recurrence, no stateful UDF) plus the per-episode QA card; the
    # deterministic data-loader order (seeded portable hash →
    # round-robin shards via the curriculum closed form) with its
    # exactly-once resume slice; and the exact-integer temperature-
    # shares mixture card. All oracle-checked at both SFs.
    "rollout_gae_advantages",
    "rollout_returns_to_go",
    "rollout_episode_card",
    # ... and the family's capstone: the episode-QA-gated PPO training
    # batch (card gate → GAE → broadcast-enriched manifest)
    "rollout_training_batch",
    "loader_epoch_order",
    "loader_resume_slice",
    "sampling_temperature_shares",
    # r16 NEW at tier-2 head (standing pattern): the tokenizer loop
    # CLOSED (VERDICT r15 item 3) — BPE-encode the corpus into token
    # IDs under the learned merge chain, and the pack-sequences twin
    # that budgets real BPE tokens instead of whitespace words; plus
    # the versioning family's end-to-end capstone (item 4) chaining
    # diff → delta card → incremental decon → go/no-go gate over one
    # shared digest-diff frame. All oracle-checked at both SFs.
    "corpus_tokenize_bpe",
    "corpus_pack_sequences_bpe",
    "corpus_release_pipeline",
    # r16 NEW FAMILY at tier-2 head (standing pattern): SFT /
    # instruction-data assembly — the fine-tuning last mile between a
    # curated corpus and a chat trainer: digest-chained transcript
    # assembly, loss-mask spans (train assistant turns, mask
    # prompts), prompt-level conversation dedup, and context-budget
    # suffix truncation. All oracle-checked at both SFs.
    "sft_assemble_conversations",
    "sft_loss_mask_spans",
    "sft_dedup_by_prompt",
    "sft_truncate_context_budget",
    "sft_pack_conversations",
    # r16 NEW FAMILY wave 2: preference-data QA — the RLHF / reward-
    # model curation surface: canonical win matrix, Bradley-Terry
    # strengths (8 unrolled MM rounds, the pagerank fixpoint
    # discipline), and Cohen's-kappa annotator agreement. All
    # oracle-checked at both SFs.
    "pref_pairwise_matrix",
    "pref_bradley_terry",
    "pref_annotator_agreement",
    # r16 NEW FAMILY wave 3: eval-suite analysis — pass@k (the
    # unbiased combinatorial estimator as a row-local fixed-order
    # product: bit-equal across engines), the suite-level mean
    # curve, and per-problem Wilson 95% intervals. All
    # oracle-checked at both SFs.
    "eval_pass_at_k",
    "eval_pass_at_k_summary",
    "eval_wilson_interval",
    # r16: the TENTH real-engine streaming entry — the incremental
    # tokenizer-vocabulary lake (per-epoch (w, wc) deltas behind
    # EpochCommit; BPE round-1 merge candidates served off the summed
    # committed vocabulary via the batch operator core). First in
    # line for a B14 window rotation.
    "streaming_bpe_vocab_lake_availablenow",
    # r16 demotions (VERDICT r15 item 1 — funded the corpus_version_diff
    # / text_bpe_merges / streaming_version_diff / capped-leakage-audit
    # promotions; rationale at each _PRIORITY swap comment). All four
    # stay full-catalog oracle-replayed every suite run.
    "streaming_sliding_availablenow",
    "sampling_dsir_weights",
    "text_ngram_char_repetition",
    "udf_mapinpandas_doc_stats",
    # r15 NEW FAMILIES at tier-2 head (standing pattern): corpus
    # versioning & release management (content-addressed release
    # diffing — per-doc delta + the per-source sign-off card; digests
    # only in the shuffle), tokenizer application (the BPE compression
    # curve over the learned merge chain), and curriculum data
    # ordering (easy-to-hard within stratum, round-robin across — the
    # closed-form position that removes the global row_number). All
    # oracle-checked at both SFs.
    # (r16: corpus_version_diff, streaming_version_diff_availablenow
    # and dedup_split_leakage_audit_capped promoted to the window per
    # the standing policy — VERDICT r15 item 1.)
    "corpus_release_delta_card",
    "text_bpe_fertility_card",
    "corpus_curriculum_order",
    "text_bpe_fertility_by_source",
    "corpus_release_gate",
    "decontaminate_incremental_delta",
    # r15 demotions (VERDICT r14 item 3 — funded the semantic-dedup /
    # pack-sequences / mixture-monitor promotions; rationale at each
    # _PRIORITY swap comment). All three stay full-catalog
    # oracle-replayed every suite run.
    "dedup_embedding_lsh_scaled",
    "similarity_lsh_bucketed_scaled",
    "cdc_snapshot_latest_state_salted",
    # r14 NEW MODALITY at tier-2 head (standing pattern): sequence
    # assembly — the last mile between a curated corpus and a
    # training/RAG consumer: context-window chunking, fixed-budget
    # sequence packing (GPT-style concat order as a provenance map),
    # and BPE first-merge pair counts (tokenizer induction). All three
    # oracle-checked at both SFs.
    # r14 NEW FAMILY at tier-2 head: corpus hygiene & mixing — the
    # curation decisions BETWEEN dedup and the loader: SemDeDup
    # (k-means-blocked semantic near-dup, Abbas et al. 2023), semantic
    # benchmark decontamination (embedding-cosine leakage the n-gram
    # family can't see), soft dedup (chunk-commonness reweighting, He
    # et al. 2024), mixture-epoch upsampling (integer-exact fractional
    # copies), and the Gopher-rule ablation matrix. All five
    # oracle-checked at both SFs.
    "decontaminate_embedding_cosine",
    "sampling_soft_dedup_weights",
    "sampling_epoch_upsample",
    "text_filter_ablation_matrix",
    # r14 wave 2 — run governance: mixture-fit KL audit (actual vs
    # target recipe), tokenizer OOV-coverage, and the train/eval
    # near-dup leakage matrix (what a naive id-hash split ships).
    "sampling_mixture_divergence",
    "text_vocab_coverage",
    "dedup_split_leakage_audit",
    # r14 wave 3 — DQ & design cards: per-cluster label purity (the
    # external clustering-validation readout on the embedding table)
    # and the sequence-length cost card (what each candidate budget
    # would pay in sequences / boundary-spanning docs / utilization).
    "dq_cluster_label_purity",
    "corpus_pack_efficiency",
    # r14 wave 4 — the EIGHTH real-engine streaming entry at tier-2
    # head: the windowed traffic-mix drift monitor (per-hour event-type
    # shares + KL vs the expected mix, counts maintained by the real
    # engine under availableNow, shares computed on the serving read —
    # the BM25-lake split). First in line for a B14 window rotation.
    "text_chunk_windows",
    "text_bpe_pair_counts",
    # (r16: text_bpe_merges promoted to the window — VERDICT r15
    # item 1.)
    # r14: chunk-level duplication — the exact-dedup shape on the
    # chunk axis (what a RAG chunk store checks before indexing)
    "dedup_chunk_hash",
    # r14 demotions at tier-2 head (VERDICT r13 item 1 — funded the
    # retrieval-family + Bloom-prefilter promotions; rationale at each
    # _PRIORITY swap comment). All three stay full-catalog
    # oracle-replayed every suite run.
    "similarity_pq16_adc_topk",
    "dedup_connected_components_lsh",
    "text_language_id",
    # r13 NEW MODALITIES (the standing pattern: new families enter
    # here, the next round's mandate decides promotion — exactly how
    # the r10/r11/r12 modalities entered; r14 promoted the hashed-df
    # form, the streaming lake gate, and the Bloom prefilter): the
    # remaining retrieval entries and the reproducible corpus shuffle.
    # All oracle-checked at both SFs; batch ≡ lake equality pytested.
    "search_bm25_topk",
    "search_hybrid_rrf",
    "corpus_shuffle_shards",
    "search_bm25_batch_topk",
    # r14 (VERDICT r13 item 6): the serving hot path — batched one-pass
    # BM25 with df/avgdl from the bounded stats artifact; the lake's
    # topk_batch runs the same operator off committed epoch sums
    "search_bm25_batch_hashed_topk",
    # r14: the batched hybrid composition — Q hybrid requests, one
    # lexical + one vector corpus pass, per-query RRF fusion
    "search_hybrid_rrf_batch",
    # r13: hour-bucket OHLC resample — the timeseries family's third
    # entry (gap-fill / topk-similar / downsample)
    "timeseries_downsample_ohlc",
    # r13: per-language quality deciles — the mixture designer's
    # stratification table (B17-adjacent)
    "text_quality_deciles",
    # r13: the soft quality draw over those deciles (Gumbel ∝ exp(10q))
    "sampling_quality_gumbel",
    # r13: the event-sequence transition matrix (Markov-path summary
    # next to funnel/sessionize/retention)
    "events_transition_matrix",
    # tier-2 head: the scale-safe / fully-oracle-checked variants of
    # families whose window slot carries a different form — first in
    # line if the gate window widens (VERDICT r4 item 4)
    "timeseries_topk_similar_scaled",
    "dedup_simhash_portable",
    # r13: demoted from the window to fund the r12-modality promotions
    # (OPQ / cluster-balanced / embedding profile, VERDICT r12 item 1).
    # All three stay full-catalog oracle-replayed every suite run: the
    # incremental batch-vs-lake semantics also run pytest-side through
    # the streaming lake sinks, brute-force cosine is the re-rank kernel
    # inside the four B16 serving rows still in-window, and the quality
    # heuristics execute inside both in-window composites (capstone +
    # release_report).
    "dedup_incremental_batch",
    "similarity_cosine_topk",
    "text_quality_score",
    # r11: demoted from the window to fund the r10-modality promotions
    # (substring/PQ/DSIR gate rows, VERDICT r10 item 3). All three stay
    # full-catalog oracle-replayed every suite run; keep-reps remains
    # the downstream variant of the CC composition that still holds a
    # window row, and the two UDF shapes are the simplest of B18's five.
    "dedup_keep_representatives_lsh",
    "udf_pandas_scalar_log1p",
    "udf_grouped_agg_mad",
    # r12: demoted from the window to fund the r11-modality promotions
    # (Gopher battery / release_report / m=16 PQ, VERDICT r11 item 1).
    # All three stay full-catalog oracle-replayed every suite run: the
    # uncapped LSH's scale-safe capped twin holds the window row, exact
    # dedup's md5-digest twin is below and the capstone exercises the
    # semantics in-window, and the m=8 PQ layout is the coarser variant
    # of the promoted two-word form.
    "dedup_minhash_lsh",
    "dedup_exact_documents",
    "similarity_pq_adc_topk",
    # r8: demoted from the window — the fixed-width ANN serving forms
    # (probe scan linear in the corpus, SCALING.md r8); their slots now
    # carry the adaptive-width twins. Kept oracle-green as the
    # small-corpus baselines (and the one-shot-wall winners).
    "similarity_lsh_bucketed",
    "similarity_ivf_topk",
    # r5: the exact-recall candidate generator as a standalone
    # PPJoin-style entry, and the skew-proof salted snapshot fold
    "dedup_prefix_filter_join",
    # demoted from the window in round 6 (slot given to the salted
    # snapshot fold): exact-cosine within label blocks — quadratic per
    # label, the semantics twin of the scale path dedup_embedding_lsh_scaled
    "dedup_embedding_cosine",
    # r6: semantic-dedup clustering (adaptive embedding LSH pairs →
    # star-CC) — the embedding analogue of the text CC composition
    "dedup_embedding_cc",
    "dedup_embedding_keep_representatives",
    # r7: demoted from the window to fund the capped-LSH promotion
    # (VERDICT r6 item 6) — B6 keeps q1 + collect_sorted in the gate;
    # the sketch battery stays full-catalog oracle-replayed here
    "agg_approx_percentile",
    # demoted from the window in round 6: the fixed 8-bit signature is
    # the proven 30× scale-killer; kept as the classic-width semantics
    # twin (oracle-green at every SF the gate runs)
    "dedup_embedding_lsh",
    # demoted from the window in round 5: blocked-exact CC/keep-reps
    # twins — oracle-exact small-block semantics, quadratic per block
    # (their window slots now carry the bounded LSH compositions)
    "dedup_connected_components",
    "dedup_keep_representatives",
    # demoted from the window in round 3 (proven green in r2's
    # CORRECTNESS run — their slots now carry the capstones)
    "agg_approx_count_distinct",
    "embedding_quantize_int8",
    "text_repetition_stats",
    "dedup_ngram_jaccard",
    "dedup_exact_hashed",
    "multimodal_frame_sample",
    "multimodal_resize_fit",
    "multimodal_audio_features",
    "multimodal_frame_extract",
    "sampling_stratified_sample",
    "dq_column_profile",
    "dq_contract_violations",
    "sql_api_sales_by_region",
    "window_zscore_builtin",
    "embedding_kmeans_refine",
    "similarity_ivf_kmeans_topk",
    "agg_hll_sketch_merge",
    "agg_approx_topk_priorities",
    "cdc_snapshot_as_of",
    "text_pii_redaction",
    "text_boilerplate_ngrams",
    "sampling_mixture_rebalance",
    "sampling_temperature_mix",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "agg_regression_stats",
    "timeseries_gap_fill",
    "timeseries_topk_similar",
    "graph_pagerank_dedup",
    # demoted from _PRIORITY in r4 to fund the banded-LSH window slot;
    # holds a tier-2 slot so a wider gate still reaches it
    "embedding_centroids",
    "tumbling_window_counts",
    "session_window_per_user",
    "percentiles_per_status",
    "q5_region_revenue",
    "text_token_stats",
    "text_fingerprint",
]


def all_queries() -> dict[str, Query]:
    missing = [n for n in _PRIORITY + _TIER2 if n not in REGISTRY]
    if missing:  # fail loudly — a silent KeyError here would shift the window
        raise KeyError(f"priority list names unknown queries: {missing}")
    ordered: dict[str, Query] = {}
    for name in _PRIORITY + _TIER2:
        ordered[name] = REGISTRY[name]
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
