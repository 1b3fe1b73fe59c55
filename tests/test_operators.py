"""Operator semantics beyond the oracle gate: as-of join vs
pandas.merge_asof, MinHash-LSH recall vs brute-force Jaccard, SimHash
hamming bounds, CDC snapshot fold with update/delete images, language-ID
on crafted fixtures, multimodal stubs."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from gomaxscale_spark.catalog import load_table
from gomaxscale_spark.operators.asof import asof_join
from gomaxscale_spark.operators.dedup import (
    jaccard,
    minhash_lsh_candidates,
    simhash_near_duplicates,
    word_shingles,
)
from gomaxscale_spark.operators.multimodal import (
    attach_media,
    decode_media,
    decode_image_real,
    fake_decode_features,
)
from gomaxscale_spark.operators.snapshot import materialize_snapshot
from gomaxscale_spark.operators.text import language_id


# ------------------------------------------------------------- as-of join

def test_asof_join_matches_pandas_merge_asof(spark):
    left = [(k, t) for k in range(5) for t in range(0, 100, 7)]
    right = [(k, t, t * 10 + k) for k in range(5) for t in range(0, 100, 13)]
    ldf = spark.createDataFrame(left, "k int, t long")
    rdf = spark.createDataFrame(right, "k int, t long, payload long")

    got = (
        asof_join(ldf, rdf.withColumnRenamed("t", "rt"), on="k", left_time="t",
                  right_time="rt", payload={"payload": "p"}, how="left")
        .orderBy("k", "t")
        .collect()
    )

    lpd = pd.DataFrame(left, columns=["k", "t"]).sort_values(["t", "k"])
    rpd = pd.DataFrame(right, columns=["k", "t", "payload"]).sort_values(["t", "k"])
    exp = pd.merge_asof(lpd, rpd, on="t", by="k", direction="backward").sort_values(["k", "t"])

    got_map = {(r.k, r.t): r.p for r in got}
    for row in exp.itertuples():
        expected = None if pd.isna(row.payload) else int(row.payload)
        assert got_map[(row.k, row.t)] == expected


def test_asof_join_inner_drops_unmatched(spark):
    ldf = spark.createDataFrame([(1, 5), (1, 50)], "k int, t long")
    rdf = spark.createDataFrame([(1, 10, 99)], "k int, rt long, payload long")
    got = asof_join(ldf, rdf, "k", "t", "rt", {"payload": "p"}, how="inner").collect()
    assert [(r.t, r.p) for r in got] == [(50, 99)]


def test_asof_join_boundary_equal_time_included(spark):
    ldf = spark.createDataFrame([(1, 10)], "k int, t long")
    rdf = spark.createDataFrame([(1, 10, 7)], "k int, rt long, payload long")
    got = asof_join(ldf, rdf, "k", "t", "rt", {"payload": "p"}).collect()
    assert got[0].p == 7  # <= semantics


# ---------------------------------------------------------- dedup family

@pytest.fixture(scope="module")
def near_dup_corpus(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    docs = []
    for i in range(30):
        docs.append((i, base + f" variant {i}"))  # high overlap family
    docs.append((100, "completely different text about spark shuffles and partitions here"))
    docs.append((101, "completely different text about spark shuffles and partitions here now"))
    docs.append((200, "unrelated singleton document with its own vocabulary entirely"))
    docs.append((300, "byte for byte identical duplicate document for simhash checks"))
    docs.append((301, "byte for byte identical duplicate document for simhash checks"))
    return spark.createDataFrame(docs, "doc_id long, text string")


def brute_force_pairs(spark, df, threshold, shingle_n=2):
    withsh = df.select("doc_id", word_shingles(F.col("text"), shingle_n).alias("sh"))
    a = withsh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = withsh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("j", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("j") >= threshold)
        .collect()
    }


def test_minhash_lsh_recall_vs_bruteforce(spark, near_dup_corpus):
    exact = brute_force_pairs(spark, near_dup_corpus, threshold=0.7, shingle_n=2)
    assert exact, "fixture should contain true near-duplicates"
    candidates = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(
            near_dup_corpus, "doc_id", "text", num_hashes=64, bands=16, shingle_n=2
        ).collect()
    }
    # banding with b=16,r=4 catches j≥0.7 pairs with prob ≈ 0.975 each;
    # on this fixture the candidate set must cover all true pairs
    missed = exact - candidates
    assert len(missed) <= max(1, len(exact) // 20), f"LSH missed too many: {missed}"


def test_portable_minhash_lsh_recall_vs_bruteforce(spark, near_dup_corpus):
    """The portable (md5 + Carter-Wegman) family drives the oracle-gated
    catalog entries; its banding recall must match the xxhash64 path —
    the brute-force-equality claim the window entries' docstrings defer
    to this check."""
    exact = brute_force_pairs(spark, near_dup_corpus, threshold=0.8, shingle_n=2)
    assert exact, "fixture should contain true near-duplicates"
    candidates = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(
            near_dup_corpus, "doc_id", "text", num_hashes=64, bands=16,
            shingle_n=2, portable=True,
        ).collect()
    }
    missed = exact - candidates
    assert len(missed) <= max(1, len(exact) // 20), f"portable LSH missed too many: {missed}"


def test_prefix_filter_candidates_exact_recall(spark, near_dup_corpus):
    """Prefix filtering is EXACT by construction: every brute-force
    ≥-threshold pair must be a candidate — at every threshold, not in
    expectation (the AllPairs/PPJoin guarantee)."""
    from gomaxscale_spark.operators.dedup import prefix_filter_candidates

    for threshold in (0.5, 0.7, 0.8, 0.9):
        exact = brute_force_pairs(spark, near_dup_corpus, threshold, shingle_n=2)
        candidates = {
            (r.id_a, r.id_b)
            for r in prefix_filter_candidates(
                near_dup_corpus, "doc_id", "text", threshold, shingle_n=2
            ).collect()
        }
        assert exact <= candidates, (
            f"t={threshold}: prefix filter missed true pairs {exact - candidates}"
        )


def test_simhash_pairs_are_low_hamming(spark, near_dup_corpus):
    pairs = simhash_near_duplicates(near_dup_corpus, "doc_id", "text", max_hamming=3).collect()
    assert all(r.hamming <= 3 for r in pairs)
    ids = {(r.id_a, r.id_b) for r in pairs}
    assert (300, 301) in ids  # identical docs → hamming 0


def test_simhash_similarity_orders_hamming(spark, near_dup_corpus):
    from gomaxscale_spark.operators.dedup import simhash_signatures

    sig = {
        r.doc_id: r.simhash
        for r in simhash_signatures(near_dup_corpus, "doc_id", "text").collect()
    }
    ham = lambda a, b: bin((sig[a] ^ sig[b]) & (2**64 - 1)).count("1")
    assert ham(300, 301) == 0
    # one-token difference is closer than unrelated vocabulary
    assert ham(100, 101) < ham(100, 200)


# ------------------------------------------------------------ CDC snapshot

def test_snapshot_fold_insert_update_delete(spark):
    rows = [
        # key 1: insert → update (before+after) → survives with v=20
        (1, "insert", 10.0, 100, 1),
        (1, "update_before", 10.0, 200, 1),
        (1, "update_after", 20.0, 200, 2),
        # key 2: insert → delete → gone
        (2, "insert", 5.0, 150, 1),
        (2, "delete", 5.0, 250, 1),
        # key 3: two inserts, later offset wins
        (3, "insert", 1.0, 300, 1),
        (3, "insert", 2.0, 300, 2),
    ]
    df = spark.createDataFrame(rows, "id int, event_type string, v double, seq long, event_number int")
    snap = materialize_snapshot(df, ["id"], ["seq", "event_number"]).collect()
    state = {r.id: r.v for r in snap}
    assert state == {1: 20.0, 3: 2.0}


def test_drain_hot_buckets_collapses_boilerplate(spark):
    """The review-queue drain on the degenerate one-family corpus the
    capped tests use: with cap=1 every multi-member bucket is hot; the
    6 byte-identical even docs MUST collapse into one full-signature
    family (keep_id = min id), tail-variant odds may only collapse
    with equal signatures (never into the even family), and every
    hot-bucket member appears exactly once in the output — nothing is
    silently dropped. Both signature families (portable + xxhash64)
    honor the same contract."""
    from gomaxscale_spark.operators.dedup import drain_hot_buckets

    base = "common boilerplate text repeated across the corpus for every single document"
    docs = spark.createDataFrame(
        [(i, f"{base} {'tail' + str(i) if i % 2 else ''}") for i in range(12)],
        "doc_id long, text string",
    )
    for portable in (True, False):
        out = drain_hot_buckets(
            docs, "doc_id", "text", max_bucket_size=1, num_hashes=64, bands=16,
            shingle_n=2, portable=portable,
        ).collect()
        rows = {r.doc_id: r for r in out}
        assert sorted(rows) == list(range(12)), "every hot member appears once"
        evens = [rows[i] for i in range(0, 12, 2)]
        assert all(r.kind == "collapsed" for r in evens)
        assert {r.keep_id for r in evens} == {0}
        assert {r.family_size for r in evens} == {6}
        for i in range(1, 12, 2):
            r = rows[i]
            # a tail-variant's family representative is itself an odd
            # doc — it can never join the identical-text even family
            assert r.keep_id is None or r.keep_id % 2 == 1
            if r.kind == "deferred":
                assert r.keep_id is None and r.family_size is None


def test_scd2_history_fold(spark):
    """materialize_history: validity intervals, delete-closes-without-
    opening, re-insert opens a fresh interval, and the open versions
    equal the snapshot fold exactly (the two C2 folds are consistent
    views of one changelog)."""
    from gomaxscale_spark.operators.snapshot import materialize_history

    rows = [
        # key 1: insert → update → still open at v=20
        (1, "insert", 10.0, 100, 1),
        (1, "update_before", 10.0, 200, 1),
        (1, "update_after", 20.0, 200, 2),
        # key 2: insert → delete → closed, nothing current
        (2, "insert", 5.0, 150, 1),
        (2, "delete", 5.0, 250, 1),
        # key 3: insert → delete → re-insert (gap, then a fresh version)
        (3, "insert", 1.0, 300, 1),
        (3, "delete", 1.0, 400, 1),
        (3, "insert", 7.0, 500, 1),
    ]
    df = spark.createDataFrame(
        rows, "id int, event_type string, v double, seq long, event_number int"
    )
    hist = materialize_history(df, ["id"], ["seq", "event_number"]).collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r.id, []).append((r.v, r.valid_from, r.valid_to, r.is_current))
    assert sorted(by_key[1]) == [(10.0, 100, 200, False), (20.0, 200, None, True)]
    assert by_key[2] == [(5.0, 150, 250, False)]  # interval ends at the tombstone
    assert sorted(by_key[3]) == [(1.0, 300, 400, False), (7.0, 500, None, True)]

    # consistency: open versions ≡ the snapshot fold
    current = {(r.id, r.v) for r in hist if r.is_current}
    snap = {
        (r.id, r.v)
        for r in materialize_snapshot(df, ["id"], ["seq", "event_number"]).collect()
    }
    assert current == snap == {(1, 20.0), (3, 7.0)}


def test_snapshot_as_of_time_travel(spark):
    rows = [(1, "insert", 1.0, 100, 1), (1, "update_after", 2.0, 200, 1)]
    df = spark.createDataFrame(rows, "id int, event_type string, v double, seq long, event_number int")
    snap = materialize_snapshot(df, ["id"], ["seq", "event_number"], as_of=F.col("seq") <= 150)
    assert snap.head().v == 1.0


# ---------------------------------------------------------------- text ops

def test_language_id_on_real_sentences(spark):
    fixtures = [
        (1, "the quick brown fox jumps over the lazy dog in the garden", "en"),
        (2, "der schnelle braune fuchs springt über den faulen hund im garten gerne", "de"),
        (3, "le renard brun rapide saute par dessus le chien paresseux dans le jardin", "fr"),
        (4, "el rapido zorro marron salta sobre el perro perezoso en el jardin", "es"),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in fixtures], "id long, text string")
    got = {r.id: r.guess for r in df.select("id", language_id(F.col("text")).alias("guess")).collect()}
    expected = {i: lang for i, _, lang in fixtures}
    hits = sum(got[i] == expected[i] for i in expected)
    assert hits >= 3, f"language-ID accuracy too low: {got} vs {expected}"


# ---------------------------------------------------------------- multimodal

def test_multimodal_decode_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    out1 = {r.doc_id: (r.byte_len, r.width, r.height, r.mean_intensity)
            for r in decode_media(attach_media(docs)).collect()}
    out2 = {r.doc_id: (r.byte_len, r.width, r.height, r.mean_intensity)
            for r in decode_media(attach_media(docs)).collect()}
    assert out1 == out2
    assert all(v[0] > 0 for v in out1.values())


def test_multimodal_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG...")
    feats = fake_decode_features(b"hello world")
    assert feats["byte_len"] == 11


def test_route_by_event_type_partitions_stream(spark):
    from gomaxscale_spark.operators.snapshot import route_by_event_type

    rows = [(i, t) for i, t in enumerate(["insert", "update_before", "update_after", "delete", "insert"])]
    df = spark.createDataFrame(rows, "id int, event_type string")
    routes = route_by_event_type(df)
    counts = {k: v.count() for k, v in routes.items()}
    assert counts == {"insert": 2, "update_before": 1, "update_after": 1, "delete": 1}
    # routes are disjoint and complete
    assert sum(counts.values()) == df.count()


# ---------------------------------------------------------------- new ops


def test_connected_components_known_graph(spark):
    """Chain 1-2-3, triangle 10-11-12 (+ redundant edge), pair 20-21:
    exact min-label clusters regardless of edge order."""
    from gomaxscale_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (10, 11), (11, 12), (10, 12), (21, 20)],
        "id_a long, id_b long",
    )
    got = {
        (r.id, r.cluster_id) for r in connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_connected_components_long_chain_converges(spark):
    """A 12-node path needs ~11 propagation rounds — proves the loop
    runs to fixpoint, not a fixed small iteration count."""
    from gomaxscale_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 111)], "id_a long, id_b long"
    )
    rows = connected_components(pairs).collect()
    assert {r.cluster_id for r in rows} == {100}
    assert len(rows) == 12


def test_stratified_sample_exact_quota_and_determinism(spark, sf_dir):
    from gomaxscale_spark.operators.sampling import stratified_sample

    d = load_table(spark, sf_dir, "documents")
    strata = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    s1 = stratified_sample(d, "lang", "doc_id", 0.1)
    got = {
        r.lang: r.n for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    import math

    assert got == {lang: math.ceil(0.1 * n) for lang, n in strata.items()}
    # deterministic member set across runs
    ids1 = sorted(r.doc_id for r in s1.select("doc_id").collect())
    ids2 = sorted(
        r.doc_id for r in stratified_sample(d, "lang", "doc_id", 0.1).select("doc_id").collect()
    )
    assert ids1 == ids2


def test_hash_split_fractions(spark, sf_dir):
    from gomaxscale_spark.operators.sampling import hash_split

    d = load_table(spark, sf_dir, "documents")
    by_split = {
        r.split: r.n
        for r in hash_split(d, "doc_id").groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    total = sum(by_split.values())
    assert total == d.count()
    # multiplicative hash spreads well: train within ±10pp of 80%
    assert abs(by_split["train"] / total - 0.8) < 0.10


def test_quantize_int8_roundtrip_error_bound(spark, sf_dir):
    """Dequantized values are within max|v|/254 of the original per dim
    (half a quantization step), and q stays in int8 range."""
    from gomaxscale_spark.operators.similarity import quantize_int8

    e = load_table(spark, sf_dir, "embeddings").limit(50)
    orig = e.select(
        "vec_id",
        F.posexplode("embedding").alias("dim_idx", "val"),
        F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double")))).alias("m"),
    )
    q = quantize_int8(e, "vec_id", "embedding")
    joined = orig.join(q, ["vec_id", "dim_idx"])
    bad = joined.filter(
        (F.abs(F.col("q")) > 127)
        | (F.abs(F.col("q") * F.col("m") / 127.0 - F.col("val")) > F.col("m") / 254.0 + 1e-12)
    )
    assert bad.count() == 0


def test_repetition_stats_flags_degenerate_text(spark):
    from gomaxscale_spark.operators.text import repetition_stats

    d = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "all four tokens differ"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(d, "doc_id", "text").collect()}
    assert rows[1].n_tokens == 4 and rows[1].dup_token_ratio == 0.75
    assert rows[1].top_token_ratio == 1.0
    assert rows[2].dup_token_ratio == 0.0 and rows[2].top_token_ratio == 0.25


def test_connected_components_random_graphs_match_union_find(spark):
    """Seeded random graphs: cluster assignment must equal a reference
    union-find's min-representative labeling."""
    import random

    from gomaxscale_spark.operators.dedup import connected_components

    for seed in (7, 42, 1337):
        rng = random.Random(seed)
        nodes = list(range(60))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(45)
        ]
        edges = [(a, b) for a, b in edges if a != b]

        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        touched = {n for e in edges for n in e}
        comp: dict[int, list[int]] = {}
        for n in touched:
            comp.setdefault(find(n), []).append(n)
        expected = {
            n: min(members) for members in comp.values() for n in members
        }

        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
        assert got == expected, f"seed {seed}: CC mismatch"


def test_connected_components_star_known_graph_and_chain(spark):
    """Large-star/small-star must produce the same min-labeled clusters
    as min-label propagation: known graph + a path (the chain is the
    shape where star's O(log² n) rounds beat O(diameter))."""
    from gomaxscale_spark.operators.dedup import connected_components_star

    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (10, 11), (11, 12), (10, 12), (21, 20)],
        "id_a long, id_b long",
    )
    got = {(r.id, r.cluster_id) for r in connected_components_star(pairs).collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 111)], "id_a long, id_b long"
    )
    rows = connected_components_star(chain).collect()
    assert {r.cluster_id for r in rows} == {100}
    assert len(rows) == 12


def test_connected_components_star_matches_min_label_on_random_graphs(spark):
    """Seeded random graphs: the star implementation must agree exactly
    with the min-label propagation implementation."""
    import random

    from gomaxscale_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    for seed in (7, 42, 1337):
        rng = random.Random(seed)
        nodes = list(range(60))
        edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(45)]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        base = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
        star = {r.id: r.cluster_id for r in connected_components_star(pairs).collect()}
        assert star == base, f"seed {seed}: star CC diverges from min-label CC"


def test_lsh_bucket_cap_routes_hot_buckets_to_review(spark, near_dup_corpus):
    """The 30-doc boilerplate family collapses into shared band buckets;
    a cap below 30 must (a) drop its pair expansion from candidates and
    (b) surface the overflow buckets in the review queue."""
    from gomaxscale_spark.operators.dedup import lsh_hot_buckets

    uncapped = minhash_lsh_candidates(
        near_dup_corpus, "doc_id", "text", num_hashes=64, bands=16, shingle_n=2
    )
    capped = minhash_lsh_candidates(
        near_dup_corpus, "doc_id", "text", num_hashes=64, bands=16, shingle_n=2,
        max_bucket_size=10,
    )
    n_unc, n_cap = uncapped.count(), capped.count()
    assert n_cap < n_unc, "cap did not reduce pair expansion"
    hot = lsh_hot_buckets(
        near_dup_corpus, "doc_id", "text", max_bucket_size=10,
        num_hashes=64, bands=16, shingle_n=2,
    ).collect()
    assert hot, "expected overflow buckets in the review queue"
    assert all(r.n_members > 10 for r in hot)
    # the small identical-pair family (docs 300/301) must survive the cap
    assert {(r.id_a, r.id_b) for r in capped.collect()} >= {(300, 301)}


def test_lsh_bucket_cap_precedes_collect_list(spark, near_dup_corpus):
    """Count-first discipline, structurally: the collect_list aggregate
    must sit ABOVE a join against the size-bounded key set — i.e. no
    membership array is ever built for a bucket that wasn't already
    proven ≤ cap by the (skew-immune) count pre-pass. Physical plans
    print root-first, so 'above' means an earlier string offset."""
    from gomaxscale_spark.operators.dedup import _lsh_buckets

    df = _lsh_buckets(
        near_dup_corpus, "doc_id", "text", 64, 16, 2, max_bucket_size=10
    )
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" in p
    joins = [
        m
        for m in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
        if m in p
    ]
    assert joins, f"bounded-keys join missing from plan:\n{p[:2000]}"
    first_join = min(p.index(m) for m in joins)
    assert p.index("collect_list") < first_join, (
        "collect_list must be ABOVE the size-bounding join (count-first cap)"
    )
    # and the cap itself is applied to the count column, below the join
    assert "n_members" in p and p.index("n_members") > first_join


def test_benchmark_contamination_bounds_and_exact_dup(spark):
    """A doc copied verbatim from the benchmark must score 1.0; a doc
    sharing no vocabulary must not appear; everything in (0, 1]."""
    from gomaxscale_spark.operators.text import benchmark_contamination

    bench_docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),  # exact copy
            (11, "alpha beta gamma delta unrelated words here now"),  # partial
            (12, "totally different vocabulary with zero overlap whatsoever ok"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in benchmark_contamination(corpus, bench_docs, "doc_id", "text", n=4)
        .filter(F.col("hits") > 0)
        .collect()
    }
    assert rows[10].contamination == 1.0
    assert 0.0 < rows[11].contamination < 1.0
    assert 12 not in rows


def test_incremental_dedup_survivors(spark):
    from gomaxscale_spark.operators.dedup import incremental_dedup

    hist = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (10, "seen before"),      # dup of lake → dropped
            (11, "brand new text"),   # survives
            (12, "brand new text"),   # batch-internal dup → min id wins
            (13, "another fresh one"),
        ],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in incremental_dedup(new, hist, "doc_id", "text").collect()}
    assert kept == {11, 13}


def test_mixture_rebalance_exact_quota(spark):
    from gomaxscale_spark.operators.sampling import mixture_rebalance

    rows = [(i, "big") for i in range(40)] + [(100 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mixture_rebalance(df, "lang", "doc_id", share=0.5)
    counts = {r.lang: r.cnt for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    # quota = ceil(0.5 * min(10, 40)) = 5 for EVERY stratum
    assert counts == {"big": 5, "small": 5}
    # deterministic: same members on re-run
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in mixture_rebalance(df, "lang", "doc_id", share=0.5).collect())
    assert a == b


def test_public_functions_surface(spark):
    """The documented public import surface must expose working
    Column expressions (a user composing their own queries)."""
    import gomaxscale_spark.functions as gf

    df = spark.createDataFrame(
        [(1, "hello world hello", [1.0, 2.0, 2.0])],
        "id long, text string, vec array<double>",
    )
    row = df.select(
        gf.token_count(F.col("text")).alias("n"),
        F.round(gf.cosine(F.col("vec"), gf.lit_vec([1.0, 2.0, 2.0])), 6).alias("cos"),
        gf.redact_pii(F.lit("mail a@b.co now")).alias("red"),
        gf.fingerprint(F.col("text")).alias("fp"),
        gf.bucketize(F.lit(47.0), 20.0).alias("bk"),
    ).first()
    assert row.n == 3
    assert row.cos == 1.0
    assert row.red == "mail [EMAIL] now"
    assert isinstance(row.fp, int)
    assert row.bk == 2
    for name in ("jaccard", "tokenize", "word_shingles", "dot", "norm",
                 "language_id", "quality_score", "pii_counts", "epoch_us"):
        assert callable(getattr(gf, name)), name


def test_temperature_mix_upweights_small_strata(spark):
    from gomaxscale_spark.operators.sampling import temperature_mix

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mix(df, "lang", "doc_id", target_share=0.5)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # T = ceil(425*0.5) = 213, Z = 20+5 = 25 → big: ceil(213*20/25)=171, small: min(25, ceil(213*5/25))=25
    assert counts == {"big": 171, "small": 25}
    # keep-rate must be HIGHER for the small stratum (the point of α<1)
    assert counts["small"] / 25 > counts["big"] / 400
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in temperature_mix(df, "lang", "doc_id", 0.5).collect())
    assert a == b


def test_gap_fill_grid_dense_and_ffill(spark, sf_dir):
    """The grid must be dense (|types| × |hours| rows) and filled_value
    must equal the most recent non-null hourly value."""
    from gomaxscale_spark.plans import all_queries

    df = all_queries()["timeseries_gap_fill"].fn(spark, sf_dir).orderBy("event_type", "hr")
    rows = df.collect()
    types = {r.event_type for r in rows}
    hours = {r.hr for r in rows}
    assert len(rows) == len(types) * len(hours), "grid is not dense"
    last = {}
    for r in rows:
        if r.hourly_value is not None:
            last[r.event_type] = r.hourly_value
        assert r.filled_value == last.get(r.event_type), (r.event_type, r.hr)


def test_pagerank_mass_and_symmetry(spark, sf_dir):
    """Total rank ≈ 1 (undirected graph, no dangling mass) and nodes
    with identical neighborhoods (exact duplicates) get equal rank."""
    from gomaxscale_spark.plans import all_queries

    rows = all_queries()["graph_pagerank_dedup"].fn(spark, sf_dir).collect()
    assert rows, "near-dup graph should be non-empty"
    total = sum(r.pagerank for r in rows)
    # each emitted rank is rounded to 8 decimals → mass drifts ≤ n·5e-9
    assert abs(total - 1.0) < 5e-9 * len(rows) + 1e-9, total
    assert all(r.pagerank > 0 for r in rows)


def test_capstone_excludes_benchmark_and_dups(spark, sf_dir):
    """No benchmark-split doc and no duplicate digest may survive."""
    from gomaxscale_spark.plans import all_queries
    from gomaxscale_spark.catalog import load_table

    kept = {r.doc_id for r in
            all_queries()["pipeline_training_corpus"].fn(spark, sf_dir).collect()}
    assert kept
    docs = load_table(spark, sf_dir, "documents")
    bench_ids = {
        r.doc_id for r in docs.filter((F.col("doc_id") * 2654435761) % 100 < 5).collect()
    }
    assert not (kept & bench_ids), "benchmark docs leaked into the corpus"
    texts = {r.doc_id: r.text for r in docs.collect()}
    digests = [texts[i] for i in kept]
    assert len(digests) == len(set(digests)), "duplicate texts survived"


def test_materialize_modes_agree(spark, sf_dir, monkeypatch, tmp_path):
    """The SPARK_GRAFT_MATERIALIZE knob trades recovery semantics for
    speed, never results: the capstone (which exercises a
    materialize_once fan-out) must return identical rows under
    local_checkpoint, persist_disk, reliable, and none."""
    from gomaxscale_spark.operators.materialize import ENV_VAR, materialize_once
    from gomaxscale_spark.plans import all_queries

    fn = all_queries()["pipeline_training_corpus"].fn
    results = {}
    for mode in ("local_checkpoint", "persist_disk", "none"):
        monkeypatch.setenv(ENV_VAR, mode)
        results[mode] = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    # reliable requires a configured checkpoint dir — error first, then work
    monkeypatch.setenv(ENV_VAR, "reliable")
    with pytest.raises(RuntimeError, match="setCheckpointDir"):
        fn(spark, sf_dir).collect()
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    results["reliable"] = sorted(tuple(r) for r in fn(spark, sf_dir).collect())

    assert (
        results["local_checkpoint"]
        == results["persist_disk"]
        == results["reliable"]
        == results["none"]
    )
    assert results["local_checkpoint"]

    with pytest.raises(ValueError):
        materialize_once(load_table(spark, sf_dir, "region"), strategy="bogus")


def test_release_bounds_persist_disk_accumulation(spark, monkeypatch):
    """persist_disk mode must not leak one generation of DISK_ONLY
    blocks per fixpoint round: the CC loops release each superseded
    generation, so the number of pinned RDDs after a multi-round run
    stays O(1), not O(rounds). (A 40-node chain forces several
    large-star/small-star rounds.)"""
    from gomaxscale_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )
    from gomaxscale_spark.operators.materialize import ENV_VAR

    monkeypatch.setenv(ENV_VAR, "persist_disk")
    # chain → several star rounds; star converges in O(log² n) so the
    # kept-lineage plan stays small (persist does NOT truncate the
    # logical plan — deep O(diameter) fixpoints under persist_disk are
    # a documented don't, see materialize.py docstring)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "id_a long, id_b long"
    )
    # hub graph → min-label converges in 2 rounds
    hub = spark.createDataFrame(
        [(0, i) for i in range(1, 21)], "id_a long, id_b long"
    )

    def pinned() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    base = pinned()
    out = connected_components_star(chain)
    assert out.filter(F.col("cluster_id") != 0).count() == 0  # one chain
    assert pinned() - base <= 2, "star loop leaked persisted generations"
    base2 = pinned()
    out2 = connected_components(hub)
    assert out2.filter(F.col("cluster_id") != 0).count() == 0
    assert pinned() - base2 <= 2, "min-label loop leaked persisted generations"


def test_ngram_char_repetition_hand_computed(spark):
    """Char-mass fractions on a hand-computable doc: 'ab ab ab cd'
    has 2-grams ('ab ab')×2 and ('ab cd')×1 — clen 4 each, mass 12,
    top 8, dup 8 → both fractions 8/12. A clean doc reports dup 0."""
    from gomaxscale_spark.operators.text import ngram_char_repetition

    d = spark.createDataFrame(
        [(1, "ab ab ab cd"), (2, "pq rs tu vw")], "doc_id long, text string"
    )
    rows = {
        (r.doc_id, r.n): r
        for r in ngram_char_repetition(d, "doc_id", "text", ns=(2,)).collect()
    }
    r1 = rows[(1, 2)]
    assert r1.n_grams == 3
    assert r1.top_gram_char_frac == round(8 / 12, 6)
    assert r1.dup_gram_char_frac == round(8 / 12, 6)
    r2 = rows[(2, 2)]
    assert r2.dup_gram_char_frac == 0.0
    assert r2.top_gram_char_frac == round(4 / 12, 6)


def test_ngram_char_repetition_short_docs_emit_no_rows(spark):
    from gomaxscale_spark.operators.text import ngram_char_repetition

    d = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    ns_seen = {
        r.n for r in ngram_char_repetition(d, "doc_id", "text").collect()
    }
    assert ns_seen == {2}  # 2 tokens: only the 2-gram row exists


def test_ngram_char_repetition_exchanges_carry_hashes_not_grams(spark, sf_dir):
    """The gram stream must shuffle (doc_id, n, 8-byte hash, len) —
    gram strings never exist, token text never enters an exchange."""
    from gomaxscale_spark.plans import all_queries

    df = all_queries()["text_ngram_char_repetition"].fn(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    exchanges = [seg.splitlines()[0] for seg in p.split("Exchange")[1:]]
    assert exchanges
    assert all("text" not in e and "gram" not in e for e in exchanges), exchanges


def test_gopher_rules_battery(spark):
    from gomaxscale_spark.operators.text import gopher_rules

    good = "the and " + " ".join(f"word{i}" for i in range(60))  # 62 words, 2 stop hits
    short = "the quick brown fox is a dog"  # 7 words: fails word count
    no_stop = " ".join(f"zz{i}" for i in range(60))  # no stopwords
    d = spark.createDataFrame(
        [(1, good), (2, short), (3, no_stop)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in gopher_rules(d, "doc_id", "text").collect()}
    assert rows[1].passes and rows[1].rule_stopwords and rows[1].rule_word_count
    assert not rows[2].passes and not rows[2].rule_word_count
    assert rows[2].rule_stopwords  # 'the', 'is', 'a' ≥ 2 hits
    assert not rows[3].passes and not rows[3].rule_stopwords
    assert rows[3].rule_alpha_frac  # zzN words contain alpha chars
