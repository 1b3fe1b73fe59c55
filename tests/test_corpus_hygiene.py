"""Corpus hygiene & mixing (r14): SemDeDup cluster-blocked semantic
dedup, embedding benchmark decontamination, soft-dedup reweighting,
mixture-epoch upsampling, and the Gopher-rule ablation matrix —
hand-computed semantics + the plan shapes the scale notes claim
(epoch upsample / decontamination: ZERO exchanges).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from gomaxscale_spark.operators.dedup import soft_dedup_weights
from gomaxscale_spark.operators.sampling import epoch_upsample
from gomaxscale_spark.operators.similarity import (
    benchmark_decontaminate_embeddings,
    semantic_dedup,
)
from gomaxscale_spark.operators.text import filter_ablation_matrix


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# ------------------------------------------------------------ SemDeDup


def test_semantic_dedup_drops_higher_id_keeps_witness(spark):
    # two orthogonal directions -> two clusters; near-dups only inside
    e = _vecs(
        spark,
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.99, 0.14, 0.0, 0.0]),  # near-dup of 1
            (4, [0.0, 0.98, 0.2, 0.0]),  # near-dup of 2
            (5, [0.97, 0.0, 0.24, 0.0]),  # near-dup of 1 and 3
        ],
    )
    got = {
        r.vec_id: (r.cluster_id, r.witness_id)
        for r in semantic_dedup(e, n_clusters=2, threshold=0.9).collect()
    }
    # ids 3,5 fall in vector-1's cluster and lose to witness 1;
    # id 4 falls in vector-2's cluster and loses to witness 2
    assert got == {3: (1, 1), 4: (2, 2), 5: (1, 1)}


def test_semantic_dedup_cross_cluster_pairs_never_compared(spark):
    # 3 is nearly identical to 1 but seeded into cluster 2 by
    # construction: identical to seed 2's direction with a nudge
    e = _vecs(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [0.1, 0.99]),  # cluster 2
            (4, [0.12, 0.98]),  # cluster 2, near-dup of 3
        ],
    )
    rows = semantic_dedup(e, n_clusters=2, threshold=0.999).collect()
    # the only ≥0.999 pair within a cluster is (3,4); (2,3)/(2,4) score
    # ~0.995/0.993 and (1,3)/(1,4) live across clusters
    assert [(r.vec_id, r.witness_id) for r in rows] == [(4, 3)]


def test_semantic_dedup_is_a_drop_list(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = semantic_dedup(e).collect()
    assert rows, "testdata should contain semantic near-dups at 0.35"
    for r in rows:
        assert r.witness_id < r.vec_id
        assert r.witness_score >= 0.35


# ------------------------------------------- embedding decontamination


def test_decontaminate_embeddings_flags_only_near_benchmark(spark):
    # bench slice = id % 41 == 0 -> ids 41 and 82
    e = _vecs(
        spark,
        [
            (41, [1.0, 0.0, 0.0]),
            (82, [0.0, 1.0, 0.0]),
            (1, [0.99, 0.1, 0.05]),  # ~bench 41
            (2, [0.0, 0.0, 1.0]),  # orthogonal: clean
            (3, [0.1, 0.97, 0.0]),  # ~bench 82
        ],
    )
    got = {
        r.vec_id: r.bench_id
        for r in benchmark_decontaminate_embeddings(
            e, bench_mod=41, threshold=0.9
        ).collect()
    }
    assert got == {1: 41, 3: 82}


def test_decontaminate_embeddings_zero_exchanges(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = benchmark_decontaminate_embeddings(e)
    p = df._jdf.queryExecution().executedPlan().toString()
    # the benchmark matrix rides inside the Arrow kernel; the corpus
    # pass is a pure map (the only allowed exchange is the narrow-input
    # parallelize guard, which is round-robin, not a hash shuffle)
    assert "Exchange hashpartitioning" not in p, p
    assert "BroadcastExchange" not in p, p


def test_decontaminate_bench_rows_never_flagged(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    flagged = benchmark_decontaminate_embeddings(e).collect()
    assert flagged, "testdata should contain semantic leakage at 0.32"
    assert all(r.vec_id % 41 != 0 for r in flagged)


# ------------------------------------------------------ soft dedup


def test_soft_dedup_weights_hand_computed(spark):
    shared = " ".join(f"s{i}" for i in range(64))
    uniq_a = " ".join(f"a{i}" for i in range(64))
    uniq_b = " ".join(f"b{i}" for i in range(64))
    d = spark.createDataFrame(
        [
            # doc 1: chunks at starts 0 (s0..s63, shared with doc 2's
            # first chunk) and 48 (16-token tail, unique — doc 2's
            # start-48 chunk is 64 tokens so the digests differ)
            (1, shared),
            (2, shared + " " + uniq_b),
            (3, uniq_a),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in soft_dedup_weights(d, "doc_id", "text").collect()}
    assert got[1].n_chunks == 2 and got[1].n_shared == 1
    assert got[1].dup_frac == 0.5 and got[1].weight == 0.666667
    assert got[3].n_shared == 0 and got[3].weight == 1.0
    # doc 2's chunk at start 0 equals doc 1's -> at least one shared
    assert got[2].n_shared >= 1
    assert 0.5 <= got[2].weight < 1.0


def test_soft_dedup_unique_corpus_all_weight_one(spark):
    d = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(10))) for i in range(5)],
        "doc_id long, text string",
    )
    rows = soft_dedup_weights(d, "doc_id", "text").collect()
    assert len(rows) == 5
    assert all(r.weight == 1.0 and r.n_shared == 0 for r in rows)


# ------------------------------------------------- epoch upsampling


def test_epoch_upsample_copy_counts_and_indices(spark):
    d = spark.createDataFrame(
        [(i, "de" if i % 2 else "en") for i in range(1, 201)],
        "doc_id long, lang string",
    )
    rows = epoch_upsample(
        d, "doc_id", "lang", weights={"en": 1.0, "de": 2.25}
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        n = rs[0].n_copies
        assert sorted(r.copy_idx for r in rs) == list(range(1, n + 1))
        if doc_id % 2 == 0:
            assert n == 1  # en: exactly one copy
        else:
            assert n in (2, 3)  # de: 2 + Bernoulli(0.25)
    # the fractional draw really fires sometimes and not always
    de_counts = [rs[0].n_copies for d_, rs in by_doc.items() if d_ % 2 == 1]
    assert de_counts.count(3) > 0 and de_counts.count(2) > 0


def test_epoch_upsample_matches_portable_hash(spark):
    d = spark.createDataFrame([(7, "zh")], "doc_id long, lang string")
    rows = epoch_upsample(d, "doc_id", "lang", weights={"zh": 3.5}).collect()
    h = int(hashlib.md5(b"7:epoch0").hexdigest()[:15], 16)
    expect = 3 + (1 if h % 1000 < 500 else 0)
    assert rows[0].n_copies == expect
    assert len(rows) == expect


def test_epoch_upsample_unknown_group_defaults_to_one_copy(spark):
    d = spark.createDataFrame([(1, "xx")], "doc_id long, lang string")
    rows = epoch_upsample(d, "doc_id", "lang", weights={"en": 2.0}).collect()
    assert len(rows) == 1 and rows[0].n_copies == 1


def test_epoch_upsample_zero_exchanges(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = epoch_upsample(d, "doc_id", "lang", weights={"en": 1.0, "zh": 3.5})
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p


def test_epoch_upsample_rejects_bad_weights(spark):
    d = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        epoch_upsample(d, "doc_id", "lang", weights={})
    with pytest.raises(ValueError):
        epoch_upsample(d, "doc_id", "lang", weights={"en": -1.0})


# --------------------------------------------------- ablation matrix


def test_filter_ablation_matrix_counts_and_shares(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = filter_ablation_matrix(d, "doc_id", "text").collect()
    assert 1 <= len(rows) <= 16
    assert sum(r.n_docs for r in rows) == d.count()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    combos = {
        (r.rule_word_count, r.rule_mean_len, r.rule_alpha_frac, r.rule_stopwords)
        for r in rows
    }
    assert len(combos) == len(rows)  # one row per combination


# ---------------------------------------------- wave 2: run governance


def test_mixture_divergence_hand_computed(spark):
    import math

    from gomaxscale_spark.operators.sampling import mixture_divergence

    d = spark.createDataFrame(
        [(i, "en") for i in range(6)] + [(i, "zh") for i in range(6, 10)],
        "doc_id long, lang string",
    )
    rows = {
        r.lang: r
        for r in mixture_divergence(d, "lang", {"en": 0.5, "zh": 0.5}).collect()
    }
    assert rows["en"].n_docs == 6 and rows["en"].actual_share == 0.6
    assert rows["en"].target_share == 0.5
    assert rows["en"].kl_term == round(0.6 * math.log(0.6 / 0.5), 6)
    assert rows["zh"].kl_term == round(0.4 * math.log(0.4 / 0.5), 6)
    # perfectly matched mix -> every term 0
    d2 = spark.createDataFrame(
        [(1, "en"), (2, "zh")], "doc_id long, lang string"
    )
    assert all(
        r.kl_term == 0.0
        for r in mixture_divergence(d2, "lang", {"en": 0.5, "zh": 0.5}).collect()
    )


def test_mixture_divergence_unknown_group_is_null_not_renormalized(spark):
    from gomaxscale_spark.operators.sampling import mixture_divergence

    d = spark.createDataFrame([(1, "xx"), (2, "en")], "doc_id long, lang string")
    rows = {r.lang: r for r in mixture_divergence(d, "lang", {"en": 1.0}).collect()}
    assert rows["xx"].target_share is None and rows["xx"].kl_term is None
    assert rows["en"].actual_share == 0.5  # total still counts the stranger


def test_mixture_divergence_rejects_bad_targets(spark):
    import pytest as _pytest

    from gomaxscale_spark.operators.sampling import mixture_divergence

    d = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with _pytest.raises(ValueError):
        mixture_divergence(d, "lang", {})
    with _pytest.raises(ValueError):
        mixture_divergence(d, "lang", {"en": 0.0})


def test_vocab_coverage_hand_computed(spark):
    from gomaxscale_spark.operators.text import vocab_coverage

    d = spark.createDataFrame(
        [
            (1, "a a a b"),  # a,b in a top-2 vocab
            (2, "a b rare"),  # 1 oov of 3
            (3, "rare weird odd"),  # all oov
            (4, ""),  # emits nothing
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in vocab_coverage(d, "doc_id", "text", 2).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].n_oov == 0 and got[1].oov_rate == 0.0
    assert got[2].n_tokens == 3 and got[2].n_oov == 1
    assert got[2].oov_rate == round(1 / 3, 6)
    assert got[3].n_oov == 3 and got[3].oov_rate == 1.0


def test_vocab_coverage_boundary_is_deterministic(spark):
    # counts all equal -> the vocab is the lexicographically first V
    from gomaxscale_spark.operators.text import vocab_coverage

    d = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    r = vocab_coverage(d, "doc_id", "text", 3).collect()[0]
    assert r.n_tokens == 5 and r.n_oov == 2  # vocab = {a, b, c}


def test_split_leakage_audit_measures_cross_split_near_dups(spark):
    from gomaxscale_spark.operators.dedup import split_leakage_audit
    from gomaxscale_spark.operators.sampling import hash_bucket

    base = " ".join(f"w{i}" for i in range(40))
    # two identical docs whose ids land in different splits, plus noise
    rows = [(i, base) for i in (1, 2, 3)] + [
        (100 + i, f"unique doc {i} " + " ".join(f"u{i}_{j}" for j in range(30)))
        for i in range(5)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    buckets = {
        r.doc_id: r.b
        for r in d.select("doc_id", hash_bucket(F.col("doc_id")).alias("b")).collect()
    }

    def split(i):
        return "train" if buckets[i] < 80 else ("val" if buckets[i] < 90 else "test")

    expect = {}
    import itertools

    for a, b in itertools.combinations((1, 2, 3), 2):
        key = tuple(sorted((split(a), split(b))))
        expect[key] = expect.get(key, 0) + 1
    got = {
        (r.split_lo, r.split_hi): r.n_pairs
        for r in split_leakage_audit(d, "doc_id", "text").collect()
    }
    assert got == expect
    assert any(lo != hi for lo, hi in got), (
        "ids 1/2/3 should not all share one split bucket"
    )


# ------------------------------------------- wave 3: DQ & design cards


def test_cluster_label_purity_hand_computed(spark):
    from gomaxscale_spark.operators.similarity import cluster_label_purity

    e = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 7),   # seed of cluster 1
            (2, [0.0, 1.0], 9),   # seed of cluster 2
            (3, [0.9, 0.1], 7),   # cluster 1, label 7
            (4, [0.95, 0.05], 8), # cluster 1, label 8 (minority)
            (5, [0.1, 0.9], 9),   # cluster 2, label 9
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        r.cluster_id: r for r in cluster_label_purity(e, n_clusters=2).collect()
    }
    assert got[1].n_vectors == 3 and got[1].majority_label == 7
    assert got[1].n_majority == 2 and got[1].purity == round(2 / 3, 6)
    assert got[2].n_vectors == 2 and got[2].purity == 1.0


def test_cluster_label_purity_majority_tie_prefers_lowest_label(spark):
    from gomaxscale_spark.operators.similarity import cluster_label_purity

    e = spark.createDataFrame(
        [(1, [1.0, 0.0], 5), (2, [0.99, 0.01], 3)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = cluster_label_purity(e, n_clusters=1).collect()
    assert rows[0].majority_label == 3 and rows[0].purity == 0.5


def test_pack_efficiency_hand_computed(spark):
    from gomaxscale_spark.operators.sampling import pack_efficiency

    # one shard, known order: force with n_shards=1
    d = spark.createDataFrame(
        [(1, " ".join(["a"] * 10)), (2, " ".join(["b"] * 10))],
        "doc_id long, text string",
    )
    rows = {
        r.budget: r
        for r in pack_efficiency(
            d, "doc_id", "text", budgets=(8, 32), n_shards=1
        ).collect()
    }
    # 20 tokens total: budget 8 -> ceil(20/8)=3 seqs; both docs span a
    # boundary (10 > 8 for the first; second starts at offset 10%8=2,
    # 2+10 > 8); budget 32 -> 1 seq, nothing spans
    assert rows[8].n_sequences == 3 and rows[8].n_docs_spanning == 2
    assert rows[8].tokens_total == 20
    assert rows[8].utilization == round(20 / 24, 6)
    assert rows[32].n_sequences == 1 and rows[32].n_docs_spanning == 0
    assert rows[32].utilization == round(20 / 32, 6)


def test_pack_efficiency_consistent_with_pack_sequences(spark, sf_dir):
    from gomaxscale_spark.operators.sampling import pack_efficiency, pack_sequences

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    card = {
        r.budget: r
        for r in pack_efficiency(d, "doc_id", "text", budgets=(256,)).collect()
    }[256]
    packed = pack_sequences(d, "doc_id", "text", budget=256)
    # spanning docs per the card == docs whose offset+len crosses 256
    spans = packed.filter(
        (F.col("pack_offset") + F.col("n_tokens")) > 256
    ).count()
    assert card.n_docs_spanning == spans
    assert card.tokens_total == packed.agg(F.sum("n_tokens")).collect()[0][0]


def test_pack_efficiency_rejects_bad_budgets(spark):
    import pytest as _pytest

    from gomaxscale_spark.operators.sampling import pack_efficiency

    d = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        pack_efficiency(d, "doc_id", "text", budgets=())
    with _pytest.raises(ValueError):
        pack_efficiency(d, "doc_id", "text", budgets=(0,))


def test_epoch_upsample_decimal_quantization(spark):
    """r14 ADVICE: frac_k must come from Decimal(str(w)), not float
    round() — w=0.6 is not exactly representable in binary (float
    arithmetic can land a thousandth off), and w=1.0005 hits banker's
    rounding (round() → 0). The contract: exact thousandths or raise."""
    d = spark.createDataFrame([(7, "en")], "doc_id long, lang string")
    # 0.6 → frac_k exactly 600: h % 1000 = 283 for id 7 → extra copy
    h = int(hashlib.md5(b"7:epoch0").hexdigest()[:15], 16)
    rows = epoch_upsample(d, "doc_id", "lang", weights={"en": 1.6}).collect()
    assert rows[0].n_copies == 1 + (1 if h % 1000 < 600 else 0)
    # finer than thousandths: loud rejection, not silent rounding
    with pytest.raises(ValueError, match="thousandths"):
        epoch_upsample(d, "doc_id", "lang", weights={"en": 1.0005})
