#!/usr/bin/env python
"""Replica scaling cells for the r16 entries (tokenizer application,
release pipeline, SFT assembly family, vocabulary lake).

Usage: python tools/scale_r16.py <sf_dir> [n_runs]
Prints one line per entry: name wall_best (seconds).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gomaxscale_spark.plans import all_queries
from gomaxscale_spark.session import get_session

ENTRIES = [
    "corpus_tokenize_bpe",
    "corpus_pack_sequences_bpe",
    "corpus_release_pipeline",
    "sft_assemble_conversations",
    "sft_loss_mask_spans",
    "sft_dedup_by_prompt",
    "sft_truncate_context_budget",
    "sft_pack_conversations",
    "streaming_bpe_vocab_lake_availablenow",
    "pref_pairwise_matrix",
    "pref_bradley_terry",
    "pref_annotator_agreement",
    "eval_pass_at_k",
    "eval_pass_at_k_summary",
    "eval_wilson_interval",
    "rollout_gae_advantages",
    "rollout_returns_to_go",
    "rollout_episode_card",
    "rollout_training_batch",
    "loader_epoch_order",
    "loader_resume_slice",
    "sampling_temperature_shares",
]


def main() -> None:
    sf_dir = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    spark = get_session("scale_r16")
    registry = all_queries()
    # warm
    registry["scan_filter_project"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    for name in (only or ENTRIES):
        best = float("inf")
        for _ in range(n_runs):
            start = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - start)
        print(f"{name} {best:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
