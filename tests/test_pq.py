"""Product Quantization (operators/pq.py): packing invariants, the
trained-codebook production path (quantization error + ADC recall lift
over the literal codebooks), and the IVF-PQ composition shape."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from gomaxscale_spark.catalog import load_table
from gomaxscale_spark.operators import pq as PQ


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _vecs(emb):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    return {r.vec_id: np.asarray(list(r.embedding), dtype=np.float64) for r in rows}


def _decode(code, books):
    m, k = len(books), len(books[0])
    return np.concatenate(
        [np.asarray(books[j][(code // k**j) % k]) for j in range(m)]
    )


def test_pq_encode_pack_roundtrip_and_reference(spark, emb):
    """Every packed code unpacks to the per-subspace argmin a numpy
    reference computes (ties to the lowest code), for both codebook
    sources."""
    vecs = _vecs(emb)
    for books in (PQ.pq_codebooks_lcg(), PQ.train_pq_codebooks(emb, n_iters=2)):
        m, k = len(books), len(books[0])
        d8 = len(books[0][0])
        got = {r.vec_id: r.pq_code for r in PQ.pq_encode(emb, books).collect()}
        assert set(got) == set(vecs)
        C = [np.asarray(books[j]) for j in range(m)]
        for vid in list(vecs)[:50]:
            v = vecs[vid]
            expect = 0
            for j in range(m):
                d = ((v[j * d8 : (j + 1) * d8][None, :] - C[j]) ** 2).sum(axis=1)
                expect += int(np.argmin(d)) * k**j  # argmin = first min
            assert got[vid] == expect, f"vec {vid}"
        assert all(0 <= c < k**m for c in got.values())


def test_trained_codebooks_beat_lcg_on_quantization_error(spark, emb):
    """The production path earns its keep: mean reconstruction error
    (‖v − decode(encode(v))‖²) under trained codebooks is strictly
    below the fixed-seed literal codebooks'."""
    vecs = _vecs(emb)
    lcg = PQ.pq_codebooks_lcg()
    trained = PQ.train_pq_codebooks(emb, n_iters=5)

    def mean_err(books):
        codes = {r.vec_id: r.pq_code for r in PQ.pq_encode(emb, books).collect()}
        errs = [
            float(((vecs[vid] - _decode(codes[vid], books)) ** 2).sum())
            for vid in vecs
        ]
        return sum(errs) / len(errs)

    e_lcg, e_tr = mean_err(lcg), mean_err(trained)
    assert e_tr < e_lcg, (e_tr, e_lcg)


def test_adc_shortlist_recall_with_trained_codebooks(spark, emb):
    """ADC is an approximation; the PRODUCTION contract is the
    shortlist-then-exact-re-rank pattern: the ADC top-50 shortlist
    under TRAINED codebooks must contain ≥ 0.8 of the exact-L2
    top-10 (measured 0.9 on this corpus; the fixed-seed literal
    codebooks measure 0.4 — the training step is what buys the
    recall, which is the honest division of labor between the
    oracle-exact literal entry and the production path)."""
    vecs = _vecs(emb)
    qid = min(vecs)
    q = vecs[qid]
    exact = sorted(((float(((v - q) ** 2).sum()), vid) for vid, v in vecs.items()))
    exact10 = {vid for _, vid in exact[:10]}

    trained = PQ.train_pq_codebooks(emb, n_iters=5)
    qf = [float(x) for x in q]
    short = PQ.pq_adc_topk(emb, qf, trained, topk=50).collect()
    short_ids = {r.vec_id for r in short}
    recall = len(short_ids & exact10) / 10
    assert recall >= 0.8, f"trained-ADC shortlist recall@10 = {recall}"

    lcg_ids = {
        r.vec_id for r in PQ.pq_adc_topk(emb, qf, PQ.pq_codebooks_lcg(), topk=50).collect()
    }
    assert recall > len(lcg_ids & exact10) / 10  # training lifts recall

    # self-match first + monotone rank order
    assert short[0].vec_id == qid
    dists = [r.adc_dist for r in short]
    assert dists == sorted(dists)


def test_ivf_pq_composition_shape(spark, emb, tmp_path):
    """IVF-PQ: partition-prune cells with the IVFIndex, ADC-rank the
    probed cells' codes, exact-re-rank the short list — the composed
    plan touches (id, pq_code) for ranking and raw vectors only for
    the final short list."""
    from gomaxscale_spark.operators.ivf_index import IVFIndex

    idx = IVFIndex(str(tmp_path / "ivfpq"))
    stats = idx.build(emb, n_iters=1)
    books = PQ.train_pq_codebooks(emb, n_iters=2)
    codes = PQ.pq_encode(emb, books)

    q_row = emb.orderBy("vec_id").limit(1).head()
    q = [float(x) for x in q_row.embedding]
    cells = idx._probe_cells(spark, q, n_probe=4)

    probed = (
        idx._read_vectors(spark)
        .filter(F.col("centroid_id").isin(cells))
        .select("vec_id")
    )
    short = PQ.pq_adc_topk(
        probed.join(emb, "vec_id").select("vec_id", "embedding"),
        q,
        books,
        topk=20,
    )
    assert 0 < short.count() <= 20
    # exact re-rank of the short list reproduces the query row on top
    from gomaxscale_spark.operators import vector_kernel as VK

    rer = (
        short.join(emb, "vec_id")
        .select(
            "vec_id",
            F.round(VK.cosine_vs_query(q)(F.col("embedding")), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(5)
        .collect()
    )
    assert rer[0].vec_id == q_row.vec_id or rer[0].score == 1.0


def test_pq_input_contract():
    with pytest.raises(ValueError, match="divisible"):
        PQ.pq_codebooks_lcg(dim=65, m=8)


def test_ivf_pq_index_probe_adc(spark, emb, tmp_path):
    """IVF-PQ as a first-class index mode: build stores pq_code in the
    partitioned layout, probe_adc's code scan reads only (id, pq_code,
    centroid_id) — plan-checked — and the exact re-rank of a full-cell
    shortlist reproduces probe()'s answer on the same cells."""
    from gomaxscale_spark.operators.ivf_index import IVFIndex

    books = PQ.train_pq_codebooks(emb, n_iters=2)
    idx = IVFIndex(str(tmp_path / "ivfpq_idx"), codebooks=books)
    stats = idx.build(emb, n_iters=1)

    cols = spark.read.parquet(f"{idx.path}/vectors").columns
    assert "pq_code" in cols

    q_row = emb.orderBy("vec_id").limit(1).head()
    q = [float(x) for x in q_row.embedding]

    # the ADC leg's scan schema is column-pruned to id + code (+ the
    # partition column) — the raw vector column must NOT be read
    from pyspark.sql import functions as F  # noqa: F811

    score_sql = PQ.adc_score_sql(q, books)
    adc_leg = (
        idx._read_vectors(spark)
        .filter(F.col("centroid_id").isin(idx._probe_cells(spark, q, 2)))
        .select("vec_id", F.expr(score_sql).alias("__adc"))
    )
    plan = adc_leg._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan_lines and all("embedding" not in ln for ln in scan_lines), plan

    got = idx.probe_adc(spark, q, k=5, n_probe=2, shortlist=10_000).collect()
    assert got and got[0].vec_id == q_row.vec_id or got[0].score == 1.0
    # shortlist covering the whole probed cells ≡ the exact probe()
    exact = idx.probe(spark, q, k=5, n_probe=2).collect()
    assert [(r.vec_id, r.score) for r in got] == [
        (r.vec_id, r.score) for r in exact
    ]

    # add() in IVF-PQ mode carries codes too, probe_adc sees the epoch
    extra = emb.orderBy(F.desc("vec_id")).limit(3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    idx.add(extra)
    add_dirs = idx._committed_add_dirs()
    assert add_dirs and "pq_code" in spark.read.parquet(add_dirs[0]).columns


def test_probe_adc_batch_matches_sequential_and_exact(spark, emb, tmp_path):
    """probe_adc_batch ≡ per-query probe_adc on (id, score, adc_dist)
    at identical parameters; with a cell-covering shortlist the
    re-ranked answer also equals the exact probe(). Also: empty query
    set → empty frame with the contractual schema; string query ids
    key the LUTs fine; the ADC leg's scan is column-pruned."""
    from gomaxscale_spark.operators.ivf_index import IVFIndex

    books = PQ.train_pq_codebooks(emb, n_iters=2)
    idx = IVFIndex(str(tmp_path / "ivfpq_batch"), codebooks=books)
    idx.build(emb, n_iters=1)

    qdf = (
        emb.orderBy("vec_id")
        .limit(3)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    got = idx.probe_adc_batch(qdf, k=5, n_probe=2, shortlist=10_000)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r.vec_id, r.score, r.adc_dist))
    assert set(by_q) == {r.query_id for r in qdf.select("query_id").collect()}
    for qrow in qdf.collect():
        seq = idx.probe_adc(
            spark, [float(x) for x in qrow.embedding], k=5, n_probe=2,
            shortlist=10_000,
        ).collect()
        want = [(r.vec_id, r.score, r.adc_dist) for r in seq]
        batch = sorted(
            by_q[qrow.query_id], key=lambda t: (-t[1] if t[1] == t[1] else 2, t[0])
        )
        assert sorted(batch) == sorted(want), (qrow.query_id, batch, want)
        exact = idx.probe(
            spark, [float(x) for x in qrow.embedding], k=5, n_probe=2
        ).collect()
        assert sorted((r.vec_id, r.score) for r in exact) == sorted(
            (v, s) for v, s, _ in batch
        )

    # empty input → empty frame, contractual schema
    empty = idx.probe_adc_batch(qdf.filter(F.lit(False)), k=5)
    assert empty.columns == ["query_id", "vec_id", "score", "adc_dist"]
    assert empty.count() == 0

    # string query ids
    sq = qdf.select(
        F.concat(F.lit("q"), F.col("query_id").cast("string")).alias("query_id"),
        "embedding",
    )
    srows = idx.probe_adc_batch(sq, k=3, n_probe=2).collect()
    assert srows and all(r.query_id.startswith("q") for r in srows)


def test_adc_vs_luts_kernel_matches_python_gather(spark):
    """The batched ADC kernel's unpack+gather equals a pure-Python
    recompute for mixed queries in one Arrow batch (int and string ids
    key the same tables via their string form)."""
    import numpy as np

    books = PQ.pq_codebooks_lcg(dim=8, m=4, k=4)
    vecs = [[(i * 7 + j) % 5 - 2.0 for j in range(8)] for i in range(6)]
    codes_df = PQ.pq_encode(
        spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
        ),
        books,
        id_col="vec_id",
        vec_col="embedding",
    )
    rows = {r["vec_id"]: r["pq_code"] for r in codes_df.collect()}
    q0, q1 = [0.5] * 8, [-1.0] * 8
    luts = {"7": PQ.adc_lut(q0, books), "q7": PQ.adc_lut(q1, books)}
    kern = PQ.adc_vs_luts(luts, m=4, k=4)
    pairs = [(qid, int(rows[i])) for qid in ("7", "q7") for i in rows]
    df = spark.createDataFrame(pairs, "qid string, pq_code long").select(
        "qid", "pq_code", kern(F.col("qid"), F.col("pq_code")).alias("d")
    )
    got = {(r["qid"], r["pq_code"]): r["d"] for r in df.collect()}
    for qid, code in pairs:
        sub = [(code // (4 ** j)) % 4 for j in range(4)]
        want = sum(luts[qid][j][sub[j]] for j in range(4))
        assert abs(got[(qid, code)] - want) < 1e-12, (qid, code)


def test_batch_probes_reject_duplicate_query_ids(spark, emb, tmp_path):
    """VERDICT r10 item 5: LUT/probe-table keying is per query id —
    duplicates silently collapsed last-wins (wrong distances for the
    other row's intent). Both batch probes must refuse loudly."""
    from gomaxscale_spark.operators.ivf_index import IVFIndex

    idx = IVFIndex(str(tmp_path / "ivfpq_dup"), codebooks=PQ.pq_codebooks_lcg())
    idx.build(emb, n_iters=1)
    dup = emb.orderBy("vec_id").limit(2).select(
        F.lit(7).alias("query_id"), "embedding"
    )
    with pytest.raises(ValueError, match="duplicate query ids"):
        idx.probe_adc_batch(dup, k=3, n_probe=2)
    with pytest.raises(ValueError, match="duplicate query ids"):
        idx.probe_batch(dup, k=3, n_probe=2)


def test_adc_vs_luts_null_code_and_unknown_qid_raise(spark):
    """ADVICE r10: a NULL pq_code (NaN embedding → every CASE arm
    false) and a query id missing from the LUT dict must raise a
    message naming the cause, not an opaque numpy cast error."""
    books = PQ.pq_codebooks_lcg(dim=8, m=4, k=4)
    kern = PQ.adc_vs_luts({"a": PQ.adc_lut([0.5] * 8, books)}, m=4, k=4)

    nulls = spark.createDataFrame([("a", None)], "qid string, pq_code long")
    with pytest.raises(Exception, match="NULL pq_code"):
        nulls.select(kern(F.col("qid"), F.col("pq_code")).alias("d")).collect()

    unknown = spark.createDataFrame([("b", 3)], "qid string, pq_code long")
    with pytest.raises(Exception, match="has no LUT"):
        unknown.select(kern(F.col("qid"), F.col("pq_code")).alias("d")).collect()


def test_train_codebooks_sample_cap_and_distinct_init(spark):
    """ADVICE r10 ×2: the modulus stride is the CEILING of n/cap (the
    collect stays ≤ sample_cap for dense ids), and codebook init takes
    the first k DISTINCT subvectors — leading duplicates must not
    collapse clusters."""
    import numpy as np

    # 10 rows, cap 4 → stride ceil(10/4)=3 → ids {0,3,6,9}: 4 ≤ cap.
    # Rows 0/3 are identical; rows 6/9 differ — with k=2 per subspace a
    # first-k init would be [v0, v0] (collapsed); distinct init must
    # recover two separate centroids.
    base = [1.0] * 8
    other = [5.0] * 8
    rows = []
    for i in range(10):
        v = base if i in (0, 3) else ([float(i)] * 8 if i not in (6, 9) else other)
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = PQ.train_pq_codebooks(df, dim=8, m=4, k=2, n_iters=3, sample_cap=4)
    for sub in books:
        c = np.asarray(sub)
        assert not np.allclose(c[0], c[1]), "init collapsed to duplicate centroids"


def test_pq16_two_word_layout_roundtrip_and_finer_cells(spark, emb):
    """The m=16 two-word layout (VERDICT/SCALING r10's recorded
    escalation): codes round-trip through both words, and doubling the
    subspaces strictly lowers mean reconstruction error vs m=8 at
    equal k (finer 4-d cells) — for BOTH the literal-LCG and trained
    codebooks. ADC distances under m=16 must also order the corpus at
    least as faithfully: the trained-m16 ADC top-50 shortlist recall
    of the exact top-10 is ≥ the trained-m8 recall."""
    import numpy as np

    vecs = _vecs(emb)

    def decode_wide(row, books):
        m, k = len(books), len(books[0])
        words = PQ.pq_word_cols(m)
        out = []
        for j in range(m):
            code = int(row[words[j // PQ.PQ_WORD]])
            c = (code // (k ** (j % PQ.PQ_WORD))) % k
            out.extend(books[j][c])
        return np.asarray(out)

    def mean_err(books):
        rows = {r.vec_id: r for r in PQ.pq_encode(emb, books).collect()}
        return sum(
            float(((vecs[v] - decode_wide(rows[v], books)) ** 2).sum())
            for v in vecs
        ) / len(vecs)

    lcg8, lcg16 = PQ.pq_codebooks_lcg(), PQ.pq_codebooks_lcg(m=16)
    assert mean_err(lcg16) < mean_err(lcg8)

    tr8 = PQ.train_pq_codebooks(emb, n_iters=5)
    tr16 = PQ.train_pq_codebooks(emb, m=16, n_iters=5)
    assert mean_err(tr16) < mean_err(tr8)

    qid = min(vecs)
    q = [float(x) for x in vecs[qid]]
    exact = sorted(
        ((float(((v - vecs[qid]) ** 2).sum()), vid) for vid, v in vecs.items())
    )
    exact10 = {vid for _, vid in exact[:10]}

    def recall(books):
        ids = {r.vec_id for r in PQ.pq_adc_topk(emb, q, books, topk=50).collect()}
        return len(ids & exact10) / 10

    r8, r16 = recall(tr8), recall(tr16)
    assert r16 >= r8, (r8, r16)
    assert r16 >= 0.8


def test_ivf_pq16_index_probes(spark, emb, tmp_path):
    """The IVF-PQ index composes with the m=16 two-word layout:
    build stores both code words, probe_adc ranks off them, and
    probe_adc_batch equals per-query probe_adc — same contract the
    m=8 suite pins, now on the wide layout."""
    from gomaxscale_spark.operators.ivf_index import IVFIndex

    books = PQ.pq_codebooks_lcg(m=16)
    idx = IVFIndex(str(tmp_path / "ivfpq16"), codebooks=books)
    idx.build(emb, n_iters=1)
    stored = spark.read.parquet(f"{idx.path}/vectors")
    assert {"pq_code_0", "pq_code_1"} <= set(stored.columns)

    # the m=16 ADC leg stays column-pruned: both code words + id, but
    # never the raw vector (16 B/vector scanned, the 16× cut)
    q0 = [float(x) for x in emb.orderBy("vec_id").limit(1).head().embedding]
    score_sql = PQ.adc_score_sql(q0, books)
    adc_leg = (
        idx._read_vectors(spark)
        .filter(F.col("centroid_id").isin(idx._probe_cells(spark, q0, 2)))
        .select("vec_id", F.expr(score_sql).alias("__adc"))
    )
    plan = adc_leg._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan_lines and all("embedding" not in ln for ln in scan_lines), plan

    qdf = (
        emb.orderBy("vec_id")
        .limit(3)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    got = idx.probe_adc_batch(qdf, k=5, n_probe=2, shortlist=10_000)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append((r.vec_id, r.score, r.adc_dist))
    for qrow in qdf.collect():
        seq = idx.probe_adc(
            spark, [float(x) for x in qrow.embedding], k=5, n_probe=2,
            shortlist=10_000,
        ).collect()
        want = sorted((r.vec_id, r.score, r.adc_dist) for r in seq)
        assert sorted(by_q[qrow.query_id]) == want, qrow.query_id


# --------------------------------------------------------------- OPQ (r12)

def test_opq_rotation_lcg_orthonormal_and_literal_roundtrip():
    """The fixed-seed rotation is a true isometry (R·Rᵀ = I to float
    precision — rotated-space L2 equals original-space L2, the property
    that keeps ADC meaningful) and every entry repr-round-trips, the
    plan-literal exactness precondition."""
    R = np.asarray(PQ.opq_rotation_lcg(dim=64, seed=77))
    assert abs(R @ R.T - np.eye(64)).max() < 1e-12
    for row in R.tolist():
        for x in row:
            assert float(repr(x)) == x


def test_opq_rotation_three_forms_bitexact(spark, emb):
    """The three rotation forms — rot_sql plan literals (what the
    DuckDB oracle replays), rotate_query (the driver-side query mirror
    the ADC LUT is built from), and opq_rotate_kernel (the Arrow-
    batched execution path) — must agree BIT-FOR-BIT, or codes/LUT
    drift off the oracle's."""
    import struct

    R = PQ.opq_rotation_lcg(dim=64, seed=77)
    rows = emb.orderBy("vec_id").limit(8).collect()
    sql_got = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(
            "vec_id",
            *[
                F.expr(PQ.rot_sql(PQ._spark_idx("embedding"), R[i])).alias(f"r{i}")
                for i in range(64)
            ],
        )
        .collect()
    )
    kern_got = (
        emb.orderBy("vec_id")
        .limit(8)
        .select("vec_id", PQ.opq_rotate_kernel(R)(F.col("embedding")).alias("rot"))
        .collect()
    )
    sql_by_id = {r.vec_id: [r[f"r{i}"] for i in range(64)] for r in sql_got}
    kern_by_id = {r.vec_id: list(r.rot) for r in kern_got}
    for row in rows:
        py = PQ.rotate_query(R, [float(x) for x in row.embedding])
        for i in range(64):
            want = struct.pack("<d", py[i])
            assert want == struct.pack("<d", sql_by_id[row.vec_id][i]), (
                "sql", row.vec_id, i,
            )
            assert want == struct.pack("<d", kern_by_id[row.vec_id][i]), (
                "kernel", row.vec_id, i,
            )


def test_opq_encode_kernels_agree(spark, emb):
    """kernel="numpy" (execution) and kernel="sql" (the oracle's
    reference form) produce IDENTICAL packed codes on the whole
    corpus."""
    R = PQ.opq_rotation_lcg(dim=64, seed=77)
    books = PQ.pq_codebooks_lcg()
    a = {r.vec_id: r.pq_code for r in PQ.opq_encode(emb, R, books).collect()}
    b = {
        r.vec_id: r.pq_code
        for r in PQ.opq_encode(emb, R, books, kernel="sql").collect()
    }
    assert a == b


def test_opq_encode_matches_numpy_reference(spark, emb):
    """OPQ codes = plain PQ codes of the rotated vectors: unpack every
    packed word and compare against a numpy argmin over the
    rotate_query-exact rotated sample (ties to the lowest code), for
    the single-word m=8 and two-word m=16 layouts."""
    vecs = _vecs(emb)
    R = PQ.opq_rotation_lcg(dim=64, seed=77)
    for m in (8, 16):
        books = PQ.pq_codebooks_lcg(m=m)
        k = len(books[0])
        d8 = len(books[0][0])
        C = [np.asarray(books[j]) for j in range(m)]
        cols = PQ.pq_word_cols(m)
        got = {
            r[0]: [r[c] for c in cols]
            for r in PQ.opq_encode(emb, R, books).collect()
        }
        for vid in list(vecs)[:25]:
            rv = np.asarray(PQ.rotate_query(R, [float(x) for x in vecs[vid]]))
            for j in range(m):
                d = ((rv[j * d8 : (j + 1) * d8][None, :] - C[j]) ** 2).sum(axis=1)
                word, local = j // PQ.PQ_WORD, j % PQ.PQ_WORD
                unpacked = (got[vid][word] // k**local) % k
                assert unpacked == int(np.argmin(d)), (m, vid, j)


def test_train_opq_beats_plain_pq_on_reconstruction_error(spark, emb):
    """The trained rotation earns its keep: mean reconstruction error
    under (R, books) = train_opq is strictly below plain trained PQ's
    on the same sample. R orthonormal ⇒ ‖v − Rᵀŷ‖² = ‖Rv − ŷ‖², so the
    rotated-space error IS the original-space error."""
    vecs = _vecs(emb)
    plain = PQ.train_pq_codebooks(emb, n_iters=3)
    R, books = PQ.train_opq(emb, n_iters=5, kmeans_iters=3)
    Rn = np.asarray(R)
    assert abs(Rn @ Rn.T - np.eye(64)).max() < 1e-9  # Procrustes keeps it orthonormal

    def mean_err(codes_books, rot=None):
        codes, bks = codes_books
        return sum(
            float(
                (
                    (
                        (rot @ vecs[vid] if rot is not None else vecs[vid])
                        - _decode(codes[vid], bks)
                    )
                    ** 2
                ).sum()
            )
            for vid in vecs
        ) / len(vecs)

    plain_codes = {r.vec_id: r.pq_code for r in PQ.pq_encode(emb, plain).collect()}
    opq_codes = {r.vec_id: r.pq_code for r in PQ.opq_encode(emb, R, books).collect()}
    e_plain = mean_err((plain_codes, plain))
    e_opq = mean_err((opq_codes, books), rot=Rn)
    assert e_opq < e_plain, (e_opq, e_plain)


def test_opq_adc_topk_contract(spark, emb):
    """Catalog-entry contract: self-match ranks first, distances come
    back ascending, ties to the lowest id (the oracle replays values —
    this pins the frame shape on the trained path too)."""
    row = emb.orderBy("vec_id").limit(1).head()
    q = [float(x) for x in row.embedding]
    R, books = PQ.train_opq(emb, n_iters=3, kmeans_iters=2)
    got = PQ.opq_adc_topk(emb, q, R, books, topk=20).collect()
    assert got[0].vec_id == row.vec_id
    dists = [r.adc_dist for r in got]
    assert dists == sorted(dists)


def test_ivf_opq_index_probes(spark, emb, tmp_path):
    """IVF-OPQ: the index composes the rotation into its code layer —
    stored codes equal opq_encode's, probe_adc ranks off the rotated
    query's LUT (self-match first), probe_adc_batch equals per-query
    probe_adc, and the coarse quantizer / exact re-rank stay in the
    original space (R orthonormal ⇒ same geometry)."""
    from gomaxscale_spark.operators.ivf_index import IVFIndex

    R = PQ.opq_rotation_lcg(dim=64, seed=77)
    books = PQ.pq_codebooks_lcg()
    with pytest.raises(ValueError, match="rotation requires codebooks"):
        IVFIndex(str(tmp_path / "bad"), rotation=R)

    idx = IVFIndex(str(tmp_path / "ivfopq"), codebooks=books, rotation=R)
    idx.build(emb, n_iters=1)
    stored = {
        r.vec_id: r.pq_code
        for r in spark.read.parquet(f"{idx.path}/vectors")
        .select("vec_id", "pq_code")
        .collect()
    }
    want = {r.vec_id: r.pq_code for r in PQ.opq_encode(emb, R, books).collect()}
    assert stored == want

    qrow = emb.orderBy("vec_id").limit(1).head()
    q = [float(x) for x in qrow.embedding]
    got = idx.probe_adc(spark, q, k=5, n_probe=4, shortlist=10_000).collect()
    assert got[0].vec_id == qrow.vec_id  # self-match survives the rotation
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)

    qdf = (
        emb.orderBy("vec_id")
        .limit(3)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    by_q = {}
    for r in idx.probe_adc_batch(qdf, k=5, n_probe=2, shortlist=10_000).collect():
        by_q.setdefault(r["query_id"], []).append((r.vec_id, r.score, r.adc_dist))
    for qrow in qdf.collect():
        seq = idx.probe_adc(
            spark, [float(x) for x in qrow.embedding], k=5, n_probe=2,
            shortlist=10_000,
        ).collect()
        want = sorted((r.vec_id, r.score, r.adc_dist) for r in seq)
        assert sorted(by_q[qrow.query_id]) == want, qrow.query_id


# -------------------------------------------- codebook policy (r14)


def test_variance_top_share_isotropic_vs_skewed():
    iso = [1.0] * 64
    assert abs(PQ.variance_top_share(iso) - 8 / 64) < 1e-12
    skewed = [10.0] * 8 + [1.0] * 56
    share = PQ.variance_top_share(skewed)
    assert abs(share - 80.0 / 136.0) < 1e-12
    # all-constant column: no spread signal → isotropic fallback
    assert PQ.variance_top_share([0.0] * 64) == 8 / 64
    # order must not matter (the helper sorts)
    assert PQ.variance_top_share(list(reversed(skewed))) == share


def test_choose_codebook_strategy_threshold():
    assert PQ.choose_codebook_strategy([1.0] * 64) == "pq"          # 12.5%
    assert PQ.choose_codebook_strategy([10.0] * 8 + [1.0] * 56) == "opq"
    # exactly at the dial → opq (>= threshold)
    vs = [3.0] * 8 + [1.0] * 56  # 24/(24+56) = 30% -> opq
    assert PQ.choose_codebook_strategy(vs) == "opq"
    assert PQ.choose_codebook_strategy(vs, share_threshold=0.5) == "pq"


def test_embedding_variance_card_matches_profile(spark, sf_dir, emb):
    """The helper is the dq_embedding_profile aggregation collapsed to
    a list — its variances must match the data card's var_val column
    (which rounds to 8dp)."""
    from gomaxscale_spark.plans import all_queries

    card = PQ.embedding_variance_card(emb)
    prof = {
        r.dim: r.var_val
        for r in all_queries()["dq_embedding_profile"].fn(spark, sf_dir).collect()
    }
    assert len(card) == 64
    for i, v in enumerate(card, start=1):
        assert abs(v - prof[i]) <= 5e-9, (i, v, prof[i])


def test_train_codebooks_auto_balanced_corpus_picks_pq(spark, emb):
    """The testdata embeddings profile balanced (top-8/64 share ≈ 13.9%
    < 15%) — the measured r12 'rotation is a wash' case — so the
    default build must pick plain PQ and skip the rotation."""
    books, rotation, decision = PQ.train_codebooks_auto(emb)
    assert decision["strategy"] == "pq"
    assert rotation is None
    assert decision["top_share"] < PQ.OPQ_TOP_SHARE
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8


def test_auto_ivf_index_skewed_corpus_builds_opq(spark, tmp_path):
    """On an anisotropic corpus (variance concentrated in 8 of 64
    dims — the replica-study condition) the auto build must flip to
    OPQ: rotation trained and stored, probes working end-to-end."""
    from gomaxscale_spark.operators.ivf_index import auto_ivf_index

    rng = np.random.default_rng(7)
    X = rng.normal(0.0, 0.05, size=(192, 64))
    X[:, :8] = rng.normal(0.0, 1.0, size=(192, 8))  # 8 hot dimensions
    rows = [(i, [float(x) for x in X[i]]) for i in range(192)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    idx, info = auto_ivf_index(
        str(tmp_path / "auto_idx"), e, n_centroids=4, sample_cap=192
    )
    assert info["decision"]["strategy"] == "opq"
    assert info["decision"]["top_share"] >= PQ.OPQ_TOP_SHARE
    assert idx.rotation is not None and idx.codebooks is not None
    q = [float(x) for x in X[0]]
    got = idx.probe_adc(spark, q, k=5, n_probe=2).collect()
    assert len(got) == 5
    assert got[0]["vec_id"] == 0  # the query vector itself ranks first


def test_pq_encode_kernel_bit_equal_to_sql(spark, sf_dir):
    """r14: the Arrow encode kernel must reproduce the literal-chain
    codes EXACTLY — same subdist fold order, same argmin tie, same
    packing — on the real table, for both word layouts."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books8 = PQ.pq_codebooks_lcg()
    a = {r.vec_id: r.pq_code for r in PQ.pq_encode(emb, books8).collect()}
    b = {
        r.vec_id: r.pq_code
        for r in PQ.pq_encode(emb, books8, kernel="sql").collect()
    }
    assert a == b
    books16 = PQ.pq_codebooks_lcg(m=16)
    a16 = {
        r.vec_id: (r.pq_code_0, r.pq_code_1)
        for r in PQ.pq_encode(emb, books16).collect()
    }
    b16 = {
        r.vec_id: (r.pq_code_0, r.pq_code_1)
        for r in PQ.pq_encode(emb, books16, kernel="sql").collect()
    }
    assert a16 == b16


def test_pq_encode_rejects_unknown_kernel(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError):
        PQ.pq_encode(emb, PQ.pq_codebooks_lcg(), kernel="nope")
