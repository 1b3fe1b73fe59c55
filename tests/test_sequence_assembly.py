"""Sequence assembly (r14): context-window chunking, training-sequence
packing, BPE pair counts — hand-computed semantics + the plan shapes
the scale notes claim (chunking: zero exchanges; packing: exactly one,
keyed by shard).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from gomaxscale_spark.operators.sampling import deterministic_shuffle, pack_sequences
from gomaxscale_spark.operators.text import bpe_pair_counts, chunk_windows


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_hand_computed(spark):
    d = _docs(spark, [(1, "a b c d e"), (2, ""), (3, "x")])
    got = sorted(
        map(
            tuple,
            chunk_windows(d, "doc_id", "text", chunk_size=3, stride=2).collect(),
        )
    )
    # doc 1 (5 tokens): starts 0,2,4 -> windows [a b c], [c d e], [e]
    # doc 2 (empty): nothing; doc 3 (1 token): one window [x]
    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert got == [
        (1, 0, 0, 3, h("a b c")),
        (1, 1, 2, 3, h("c d e")),
        (1, 2, 4, 1, h("e")),
        (3, 0, 0, 1, h("x")),
    ]


def test_chunk_windows_covers_every_token_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(200))
    d = _docs(spark, [(1, text)])
    rows = chunk_windows(d, "doc_id", "text").collect()  # 64/48 defaults
    starts = sorted(r.start_tok for r in rows)
    assert starts == list(range(0, 200, 48))
    # consecutive full windows overlap by chunk_size - stride = 16
    by_start = {r.start_tok: r for r in rows}
    assert by_start[0].n_tokens == 64 and by_start[48].n_tokens == 64
    assert by_start[192].n_tokens == 8  # tail window
    # coverage: last window reaches the final token
    assert max(r.start_tok + r.n_tokens for r in rows) == 200


def test_chunk_windows_zero_exchanges(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = (
        chunk_windows(d, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in p, p


def test_pack_sequences_hand_invariants(spark):
    rows = [(i, " ".join(["w"] * (10 * (i % 7 + 1)))) for i in range(40)]
    d = _docs(spark, rows)
    out = pack_sequences(d, "doc_id", "text", budget=100, n_shards=4).collect()
    assert len(out) == 40
    sh = deterministic_shuffle(d, "doc_id", n_shards=4).collect()
    order = {r.doc_id: (r.shard, r.position) for r in sh}
    by_shard: dict[int, list] = {}
    for r in out:
        # shard/position must be exactly the deterministic_shuffle order
        assert order[r.doc_id] == (r.shard, r.position)
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.position)
        before = 0
        for r in shard_rows:
            assert r.pack_id == before // 100
            assert r.pack_offset == before % 100
            before += r.n_tokens


def test_pack_sequences_budget_recut_keeps_order(spark):
    rows = [(i, " ".join(["w"] * 30)) for i in range(20)]
    d = _docs(spark, rows)
    a = {r.doc_id: (r.shard, r.position) for r in
         pack_sequences(d, "doc_id", "text", budget=64).collect()}
    b = {r.doc_id: (r.shard, r.position) for r in
         pack_sequences(d, "doc_id", "text", budget=512).collect()}
    assert a == b  # re-cutting sequences never reshuffles the corpus


def test_pack_sequences_single_exchange(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = (
        pack_sequences(d, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Exchange hashpartitioning(shard" in p
    assert "rangepartitioning" not in p


def test_bpe_pair_counts_hand_computed(spark):
    d = _docs(spark, [(1, "aa ab"), (2, "AB"), (3, "c")])
    got = [tuple(r) for r in bpe_pair_counts(d, "text", k=5).collect()]
    # vocabulary (lowercased): aa x1, ab x2; 'c' has no pairs
    assert got == [("ab", 2), ("aa", 1)]


def test_bpe_pair_counts_weights_by_word_frequency(spark):
    # 'the' appears 3x -> pairs th, he each weighted 3
    d = _docs(spark, [(1, "the the"), (2, "the xy")])
    got = dict(
        (r.pair, r.n_occurrences) for r in bpe_pair_counts(d, "text").collect()
    )
    assert got == {"th": 3, "he": 3, "xy": 1}


# ------------------------------------------------ iterated BPE (r15)


def _python_bpe(texts, n_merges):
    """Straight-line BPE reference: vocab of whitespace words,
    greedy-leftmost merge application, (count desc, pair asc) argmax."""
    import re
    from collections import Counter

    vocab: dict[tuple, int] = {}
    for txt in texts:
        for w in re.split(r"\s+", txt.lower()):
            if w:
                k = tuple(w)
                vocab[k] = vocab.get(k, 0) + 1
    out = []
    for idx in range(1, n_merges + 1):
        pc: Counter = Counter()
        for toks, c in vocab.items():
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((idx, l, r, l + r, cnt))
        nv: dict[tuple, int] = {}
        for toks, c in vocab.items():
            acc: list = []
            for x in toks:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = l + r
                else:
                    acc.append(x)
            k = tuple(acc)
            nv[k] = nv.get(k, 0) + c
        vocab = nv
    return out


def test_bpe_merges_matches_python_reference_adversarial(spark):
    """Overlapping-candidate chains (aaa/aaaa), a merged token that is
    the LEFT of a later rule, and count ties broken by pair order —
    the cases where greedy-leftmost and naive pair replacement
    diverge."""
    from gomaxscale_spark.operators.text import bpe_merges

    texts = [
        "aaaa aaa aa ab",
        "aaaa bb bb cc",
        "abab abab baba",
        "xy xy xz xz",  # tie on count -> pair asc decides
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.merge_idx, r.left_tok, r.right_tok, r.merged, r.n_occurrences)
        for r in bpe_merges(df, "text", n_merges=5)
        .orderBy("merge_idx")
        .collect()
    ]
    assert got == _python_bpe(texts, 5)


def test_bpe_merges_matches_python_reference_corpus(spark, sf_dir):
    from gomaxscale_spark.operators.text import bpe_merges
    from gomaxscale_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    texts = [r.text for r in docs.select("text").collect()]
    got = [
        (r.merge_idx, r.left_tok, r.right_tok, r.merged, r.n_occurrences)
        for r in bpe_merges(docs, "text", n_merges=4)
        .orderBy("merge_idx")
        .collect()
    ]
    assert got == _python_bpe(texts, 4)
