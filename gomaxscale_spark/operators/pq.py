"""Product Quantization (PQ) — the compression half of the standard
FAISS-style IVF-PQ serving layout (Jégou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011).

The repo's serving tiers so far keep RAW vectors everywhere (the
lakes, `IVFIndex`): a probe that scans a cell reads 64 × 4 B = 256 B
per vector. PQ splits each vector into ``m`` subvectors, quantizes
each against a per-subspace codebook of ``k`` centroids, and stores
only the code indices — with m = 8, k = 16 that is 8 × 4 bits packed
into ONE BIGINT: **8 bytes per vector, a 32× scan reduction**, and
queries rank candidates with an Asymmetric Distance Computation (ADC):
a driver-side m×k lookup table of (query-subvector ↔ centroid)
distances, so scoring a row is m integer unpacks + m table lookups —
no float vector ever read.

At 100 TB: codes are an ingest-time map (like the LSH signatures);
the ADC scan reads the 8-byte code column only (column pruning does
the rest); the LUT is an O(m·k) plan literal; composed with the
``IVFIndex`` cell layout this is IVF-PQ — partition-prune to n_probe
cells, ADC-rank inside them, exact-re-rank the short list from the
raw vectors (`pq_adc_topk(..., refine=N)` does the last step).

OPQ (Ge et al., "Optimized Product Quantization", CVPR 2013) is the
rotation escalation on top: an orthonormal R applied BEFORE the
subspace split (``opq_encode`` — a plan-literal projection layer at
ingest; probes rotate only the query, driver-side) so correlated /
unevenly-spread dimensions stop landing in the same quantization cell.
``train_opq`` is the production alternating optimization
(k-means ↔ orthogonal Procrustes); ``opq_rotation_lcg`` is the
fixed-seed orthonormal literal the oracle gate replays bit-for-bit.

Two codebook sources, honestly separated:

- ``pq_codebooks_lcg`` — fixed-seed plan LITERALS (the hyperplane
  pattern): deterministic in any engine, so the DuckDB oracle replays
  codes and ADC ranks bit-for-bit. Quantization quality is that of a
  random codebook — fine for the exactness gate, not the production
  path.
- ``train_pq_codebooks`` — per-subspace Lloyd k-means (numpy, on a
  modulus sample collected driver-side: the standard train-on-sample
  practice; the sample is quantizer-artifact-sized, never the
  corpus). The production path; pytested to reduce quantization
  error vs the LCG codebooks and to lift ADC recall.

Engine-portability contract (same discipline as the minhash family):
every distance is the SAME left-associated ``(x−c)·(x−c) + …``
expression in Spark and DuckDB over exactly-representable doubles
(float32 data promotes exactly; ``repr`` round-trips the centroid
literals), so argmin/rank decisions are IEEE-identical — no rounding
contract needed, ties break to the LOWEST code via the argmin-earliest
CASE. Distances/argmins are emitted as CHAINED projections (distance
columns → least column → CASE on columns), never nested — a CASE arm
referencing an inline ``least(d0..d15)`` would re-evaluate the 16
distance subtrees per arm (the r5 chained-projection lesson).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from .bucketing import parallelize_narrow_input


def pq_codebooks_lcg(
    dim: int = 64, m: int = 8, k: int = 16, seed: int = 99, scale: float = 0.125
) -> list[list[list[float]]]:
    """Fixed-seed codebooks as exact binary fractions (LCG / 2³⁰, the
    hyperplane trick — ``repr`` round-trips bit-exactly through both
    engines' double parsers). ``scale`` matches the component scale of
    unit-normalized embeddings (std ≈ 1/√dim)."""
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m {m}")
    state = seed & 0x7FFFFFFF
    books: list[list[list[float]]] = []
    for _ in range(m):
        book = []
        for _ in range(k):
            row = []
            for _ in range(dim // m):
                state = (1103515245 * state + 12345) & 0x7FFFFFFF
                row.append((state / 0x40000000 - 1.0) * scale)
            book.append(row)
        books.append(book)
    return books


def _sample_matrix(
    embeddings: DataFrame, sample_cap: int, id_col: str, vec_col: str
):
    """Modulus sample collected driver-side as an (n_sample, dim)
    float64 matrix — the quantizer-artifact-sized collect both training
    paths share (≤ ``sample_cap`` rows for dense 0-based integer ids;
    stride is the ceiling of n/sample_cap so the bound holds at every
    n)."""
    import numpy as np

    n = embeddings.count()
    stride = max(1, -(-n // sample_cap))  # ceil: collect stays ≤ cap
    rows = (
        embeddings.filter((F.col(id_col) % stride) == 0)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )
    return np.array([list(r[1]) for r in rows], dtype=np.float64)


def _lloyd_subspaces(X, m: int, k: int, n_iters: int):
    """Per-subspace Lloyd k-means over an (n, dim) sample: the shared
    kernel of ``train_pq_codebooks`` and ``train_opq``. Deterministic:
    init each codebook from the sample's first k distinct subvectors
    (order of first appearance; < k distinct pads with repeats, which
    collapse — ties go to the lowest index — leaving dead centroids,
    the honest cap when the data itself has < k distinct values). L2
    assignment ties to the lowest centroid. Empty clusters keep their
    previous centroid (standard fix). Returns (books, reconstruction)
    — the reconstruction assigns against the FINAL centroids (one
    extra assignment pass), which is what the OPQ Procrustes step
    needs."""
    import numpy as np

    dim = X.shape[1]
    d8 = dim // m
    books = []
    recon = np.empty_like(X)
    for j in range(m):
        S = X[:, j * d8 : (j + 1) * d8]
        # first k DISTINCT subvectors in order of first appearance —
        # duplicate initial centroids would collapse clusters from
        # iteration 1 (ties go to the lowest index)
        first_idx = np.sort(np.unique(S, axis=0, return_index=True)[1])
        init = S[first_idx][:k]
        if len(init) < k:  # < k distinct values: pad (documented cap)
            init = np.vstack([init, S[: k - len(init)]])
        C = init.copy()
        for _ in range(n_iters):
            D = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(D, axis=1)  # first min = lowest centroid
            for c in range(k):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        final = np.argmin(
            ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), axis=1
        )
        recon[:, j * d8 : (j + 1) * d8] = C[final]
        books.append([[float(x) for x in row] for row in C])
    return books, recon


def train_pq_codebooks(
    embeddings: DataFrame,
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    n_iters: int = 5,
    sample_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Per-subspace Lloyd k-means on a modulus SAMPLE (train-on-sample,
    the standard PQ practice — the collect is quantizer-artifact-sized,
    never the corpus). Determinism and tie/empty-cluster rules in
    ``_lloyd_subspaces``."""
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m {m}")
    X = _sample_matrix(embeddings, sample_cap, id_col, vec_col)
    if len(X) < k:
        raise ValueError(f"pq: sample of {len(X)} rows < k={k}")
    books, _ = _lloyd_subspaces(X, m, k, n_iters)
    return books


def train_opq(
    embeddings: DataFrame,
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    n_iters: int = 8,
    kmeans_iters: int = 3,
    sample_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Non-parametric OPQ (Ge et al., "Optimized Product Quantization",
    CVPR 2013): learn an ORTHONORMAL rotation R so the subspace split
    happens in a basis where quantization error is minimal, by
    alternating (a) per-subspace Lloyd k-means on the rotated sample
    with (b) the orthogonal-Procrustes solve
    ``A* = U·Vᵀ, (U, S, Vᵀ) = svd(Xᵀ·X̂)`` for the rotation that best
    aligns the data with its current reconstruction. Driver-side numpy
    on the same modulus sample ``train_pq_codebooks`` uses — the
    artifact is (dim² + m·k·dim/m) floats, never corpus-sized.

    Returns ``(R, codebooks)`` where row i of R is the i-th rotated
    component (``rotated[i] = R[i]·x``) — feed both straight into
    ``opq_encode`` / ``opq_adc_topk``. Deterministic for fixed input
    (numpy SVD and the k-means tie rules are deterministic)."""
    import numpy as np

    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m {m}")
    X = _sample_matrix(embeddings, sample_cap, id_col, vec_col)
    if len(X) < k:
        raise ValueError(f"pq: sample of {len(X)} rows < k={k}")
    A = np.eye(dim)  # y_row = x_row @ A  (A = Rᵀ)
    books: list[list[list[float]]] = []
    for _ in range(n_iters):
        Y = X @ A
        books, Yhat = _lloyd_subspaces(Y, m, k, kmeans_iters)
        U, _, Vt = np.linalg.svd(X.T @ Yhat)
        A = U @ Vt
    # final codebooks under the final rotation (one more k-means pass —
    # the alternation above trained them against the PREVIOUS rotation)
    books, _ = _lloyd_subspaces(X @ A, m, k, kmeans_iters)
    R = [[float(x) for x in row] for row in A.T]
    return R, books


# ---------------------------------------------------------------- SQL

def _spark_idx(vec: str):
    return lambda i: f"element_at({vec}, {i})"


def _duck_idx(vec: str):
    return lambda i: f"{vec}[{i}]"


def _subdist_sql(idx, centroid: Sequence[float], offset: int) -> str:
    """Left-associated Σ (v[i]−c)·(v[i]−c) — identical operation
    sequence in both engines, so the double result is bit-identical.
    Every operand is CAST to DOUBLE explicitly: a bare decimal literal
    parses as DECIMAL in both engines (different scales/rounding), and
    the vector elements are float32 — the casts pin the whole
    expression to IEEE double arithmetic on both sides."""
    terms = []
    for t, c in enumerate(centroid):
        e = f"CAST({idx(offset + t + 1)} AS DOUBLE)"
        lit = f"CAST({repr(float(c))} AS DOUBLE)"
        terms.append(f"(({e}) - {lit}) * (({e}) - {lit})")
    return "(" + " + ".join(terms) + ")"


#: Terms per parenthesized group in the rotation inner product — keeps
#: the left-assoc fold shallow enough for DuckDB's ~128-frame binder
#: (a flat 64-term chain binds ~6 frames/op and dies; see the CW-fold
#: lesson) while pinning ONE summation order both engines and the
#: Python query-side mirror reproduce bit-for-bit.
ROT_GROUP = 8


def rot_sql(idx, row: Sequence[float], group: int = ROT_GROUP) -> str:
    """One rotated component ``Σ_t v[t]·R[i][t]`` as SQL: grouped
    left-associated sums of CAST-disciplined products (same contract as
    ``_subdist_sql`` — element and literal both pinned to DOUBLE, the
    grouping identical in Spark, DuckDB, and ``rotate_query``, so the
    double result is bit-identical everywhere)."""
    terms = [
        f"(CAST({idx(t + 1)} AS DOUBLE) * CAST({repr(float(c))} AS DOUBLE))"
        for t, c in enumerate(row)
    ]
    groups = [
        "(" + " + ".join(terms[g : g + group]) + ")"
        for g in range(0, len(terms), group)
    ]
    return "(" + " + ".join(groups) + ")"


def rotate_query(
    R: Sequence[Sequence[float]], vec: Sequence[float], group: int = ROT_GROUP
) -> list[float]:
    """The query-side rotation, computed in pure Python with EXACTLY the
    grouped left-assoc order ``rot_sql`` emits — the ADC LUT is built
    from this rotated query, and IEEE determinism of the identical
    operation sequence keeps Spark's plan literals and the oracle's SQL
    derivation bit-equal."""
    out = []
    for row in R:
        gsums = []
        for g in range(0, len(row), group):
            acc = None
            for t in range(g, min(g + group, len(row))):
                term = float(vec[t]) * float(row[t])
                acc = term if acc is None else acc + term
            gsums.append(acc)
        total = None
        for gv in gsums:
            total = gv if total is None else total + gv
        out.append(total)
    return out


def opq_rotation_lcg(dim: int = 64, seed: int = 77) -> list[list[float]]:
    """Fixed-seed ORTHONORMAL rotation as plan literals — the exactness
    gate's rotation source (same honest split as the codebooks: the
    trained path is ``train_opq``). An LCG matrix orthonormalized by
    modified Gram-Schmidt in pure Python floats: deterministic, and
    every entry ``repr``-round-trips through both engines' double
    parsers. Orthonormality makes it a true isometry, so rotated-space
    L2 (what the codes quantize) equals original-space L2 — a random
    rotation is also the published "PQ+RR" baseline OPQ improves on."""
    state = seed & 0x7FFFFFFF
    M = []
    for _ in range(dim):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            row.append(state / 0x40000000 - 1.0)
        M.append(row)
    R: list[list[float]] = []
    for i in range(dim):
        v = list(M[i])
        for u in R:  # modified Gram-Schmidt: subtract projections
            dot = 0.0
            for t in range(dim):
                dot += v[t] * u[t]
            for t in range(dim):
                v[t] -= dot * u[t]
        norm = 0.0
        for t in range(dim):
            norm += v[t] * v[t]
        norm = norm**0.5
        R.append([x / norm for x in v])
    return R


#: Subspaces packed per BIGINT code word. 8 codes × log₂k bits stays
#: far inside a long for any k ≤ 256 (8 × 8 bits = 2⁶⁴-safe at 2⁵⁶).
PQ_WORD = 8


def pq_word_cols(m: int) -> list[str]:
    """Code column names for an m-subspace layout: the single
    ``pq_code`` for m ≤ PQ_WORD (the original 8-byte layout — nothing
    downstream changes), else ``pq_code_0 … pq_code_{w-1}``."""
    n = -(-m // PQ_WORD)
    return ["pq_code"] if n == 1 else [f"pq_code_{w}" for w in range(n)]


def pq_code_layers(
    idx, codebooks: Sequence[Sequence[Sequence[float]]]
) -> list[list[tuple[str, str]]]:
    """The encode pipeline as CHAINED projection layers of
    (alias, sql): [distances d_j_c] → [least m_j] → [argmin-earliest
    code_j] → [packed pq_code]. Emitting layers keeps every distance
    evaluated ONCE (columns), instead of 16× inside each CASE arm."""
    m, k = len(codebooks), len(codebooks[0])
    d8 = len(codebooks[0][0])
    l1 = [
        (f"__d{j}_{c}", _subdist_sql(idx, codebooks[j][c], j * d8))
        for j in range(m)
        for c in range(k)
    ]
    l2 = [
        (f"__m{j}", "least(" + ", ".join(f"__d{j}_{c}" for c in range(k)) + ")")
        for j in range(m)
    ]
    l3 = [
        (
            f"__code{j}",
            "CASE "
            + " ".join(f"WHEN __d{j}_{c} = __m{j} THEN {c}" for c in range(k))
            + " END",
        )
        for j in range(m)
    ]
    # BIGINT cast per term: k^7 = 2²⁸ and code·k^j overflows an INT32
    # multiply in DuckDB (Spark widens implicitly; DuckDB raises).
    # m > PQ_WORD packs into ⌈m/PQ_WORD⌉ words (pq_code_0, pq_code_1,
    # …) — the two-word layout that unlocks m = 16 (finer subspaces,
    # the recall escalation SCALING.md r10 recorded as not-yet-built);
    # m ≤ PQ_WORD keeps the single `pq_code` BIGINT unchanged.
    l4 = []
    for w, col in enumerate(pq_word_cols(m)):
        js = range(w * PQ_WORD, min((w + 1) * PQ_WORD, m))
        packed = " + ".join(
            f"CAST(__code{j} AS BIGINT) * {k ** (j - w * PQ_WORD)}" for j in js
        )
        l4.append((col, f"CAST({packed} AS BIGINT)"))
    return [l1, l2, l3, l4]


def pq_unpack_sql(code_col: str, j: int, k: int) -> str:
    """code_j from the packed BIGINT. ``FLOOR(a / b)`` rather than an
    integer-div operator: both engines' ``/`` on integers is double
    division (exact below 2⁵³ — pq_code < k^m = 2³²), while their
    integer-division spellings differ (``div`` vs ``//``)."""
    return f"(CAST(FLOOR({code_col} / {k ** j}) AS BIGINT) % {k})"


# ------------------------------------------------------------ operators

def pq_code_kernel(codebooks: Sequence[Sequence[Sequence[float]]]):
    """Arrow-batched PQ encode kernel: ``vector → array<long>`` of
    packed code word(s), computed in vectorized numpy with EXACTLY the
    operation sequence the SQL encode layers pin — per-centroid squared
    distance as an explicit left-associated d8-term fold of
    ``(e−c)·(e−c)`` doubles (``_subdist_sql``'s order), argmin tie →
    lowest centroid (``np.argmin`` first-minimum == the CASE chain's
    first match), word packing in exact int64 arithmetic. Bit-equality
    of kernel and SQL codes is pytested on the real tables.

    Why a kernel (the r14 instalment of the r6 codegen-ceiling /
    r9 IVF-kernel lesson): the literal encode chain is a ~180 KB
    generated expression whose ``F.expr`` PARSE alone costs ~5 s per
    plan build at m=8 — more than the sf0.1 execution — and that
    driver/JVM compile time is what made the ADC family's bench cells
    host-state-sensitive across rounds (r13 VERDICT watch item). The
    kernel ships the m·k·d8 codebook array task-local and touches the
    parser not at all; the SQL form stays selectable because it IS the
    oracle's exactness contract."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m, k = len(codebooks), len(codebooks[0])
    d8 = len(codebooks[0][0])
    B = np.asarray(codebooks, dtype=np.float64)  # (m, k, d8)
    n_words = -(-m // PQ_WORD)

    @pandas_udf("array<long>")
    def _enc(vecs):
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        X = np.array(vecs.tolist(), dtype=np.float64)  # float32 promotes exactly
        n = X.shape[0]
        codes = np.empty((n, m), dtype=np.int64)
        for j in range(m):
            sub = X[:, j * d8 : (j + 1) * d8]
            dists = np.empty((n, k), dtype=np.float64)
            for c in range(k):
                d0 = sub[:, 0] - B[j, c, 0]
                acc = d0 * d0
                for t in range(1, d8):
                    dt = sub[:, t] - B[j, c, t]
                    acc = acc + dt * dt  # left-assoc == _subdist_sql
                dists[:, c] = acc
            codes[:, j] = np.argmin(dists, axis=1)  # first min == CASE order
        words = np.zeros((n, n_words), dtype=np.int64)
        for j in range(m):
            words[:, j // PQ_WORD] += codes[:, j] * (k ** (j % PQ_WORD))
        return pd.Series([w.tolist() for w in words])

    return _enc


def _project_code_words(out: DataFrame, m: int, word_arr: str = "__w") -> DataFrame:
    """array<long> kernel output → the pq_code[_w] column contract."""
    cols = [c for c in out.columns if c != word_arr]
    return out.select(
        *cols,
        *[
            F.element_at(F.col(word_arr), i + 1).alias(c)
            for i, c in enumerate(pq_word_cols(m))
        ],
    )


def pq_encode(
    df: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "numpy",
) -> DataFrame:
    """(id, pq_code[, pq_code_1 …]): each vector quantized to packed
    BIGINT word(s) — the ingest-time map. One narrow projection chain,
    no shuffle; m > PQ_WORD subspaces emit one column per 8-subspace
    word (the m=16 layout is 16 B/vector — still a 16× scan cut).

    ``kernel="numpy"`` (default, the execution path): one Arrow-batched
    ``pq_code_kernel`` pass — same bits (pytested), none of the ~180 KB
    literal chain's parse/compile cost. ``kernel="sql"`` is the
    plan-literal reference form the DuckDB oracle replays."""
    out = parallelize_narrow_input(df.select(F.col(id_col), F.col(vec_col)))
    if kernel == "numpy":
        enc = pq_code_kernel(codebooks)
        arr = out.select(F.col(id_col), enc(F.col(vec_col)).alias("__w"))
        return _project_code_words(arr, len(codebooks))
    if kernel != "sql":
        raise ValueError(f"pq_encode: unknown kernel {kernel!r}")
    layers = pq_code_layers(_spark_idx(vec_col), codebooks)
    for layer in layers:
        out = out.select("*", *[F.expr(sql).alias(a) for a, sql in layer])
    return out.select(
        F.col(id_col), *[F.col(c) for c in pq_word_cols(len(codebooks))]
    )


def adc_lut(
    query_vec: Sequence[float], codebooks: Sequence[Sequence[Sequence[float]]]
) -> list[list[float]]:
    """The m×k ADC lookup table, computed in pure Python with the SAME
    left-associated operation order the SQL distance expression uses —
    the Spark plan embeds these values as literals while the oracle
    derives them in SQL from the query row; IEEE determinism of the
    identical sequence makes the two bit-equal."""
    m, k = len(codebooks), len(codebooks[0])
    d8 = len(codebooks[0][0])
    lut = []
    for j in range(m):
        row = []
        for c in range(k):
            acc = None
            for t in range(d8):
                q = float(query_vec[j * d8 + t])
                cv = float(codebooks[j][c][t])
                term = (q - cv) * (q - cv)
                acc = term if acc is None else acc + term
            row.append(acc)
        lut.append(row)
    return lut


def adc_score_sql(
    query_vec: Sequence[float],
    codebooks: Sequence[Sequence[Sequence[float]]],
    code_col: str = "pq_code",
) -> str:
    """Σ_j LUT[j][code_j] as one Spark SQL expression over the packed
    code column(s): m literal k-element DOUBLE arrays (driver-computed,
    see ``adc_lut``) indexed by the unpacked code — the whole rank
    cost per row is m integer unpacks + m array lookups. For
    m > PQ_WORD layouts, ``code_col`` is the column PREFIX: subspace j
    unpacks from word j // PQ_WORD at local position j % PQ_WORD
    (``{code_col}_0``, ``{code_col}_1``, …)."""
    m, k = len(codebooks), len(codebooks[0])
    words = pq_word_cols(m)
    lut = adc_lut(query_vec, codebooks)
    lookups = []
    for j in range(m):
        arr = "array(" + ", ".join(
            f"CAST({v!r} AS DOUBLE)" for v in lut[j]
        ) + ")"
        word_col = (
            code_col
            if len(words) == 1
            else f"{code_col}_{j // PQ_WORD}"
        )
        lookups.append(
            "element_at("
            f"{arr}, CAST({pq_unpack_sql(word_col, j % PQ_WORD, k)} AS INT) + 1)"
        )
    return " + ".join(lookups)


def pq_adc_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    codebooks: Sequence[Sequence[Sequence[float]]],
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: encode (ingest-time in production — composed here so
    the catalog entry is self-contained on the raw table), then rank
    by Σ_j LUT[j][code_j]. The scan side touches only the 8-byte code
    (+ id); the LUT rides as m k-element array literals; the rank is a
    TakeOrdered, never a global sort. Ascending distance, ties to the
    lowest id. Returns (id, adc_dist rounded 6dp)."""
    codes = pq_encode(embeddings, codebooks, id_col, vec_col)
    score = adc_score_sql(query_vec, codebooks)
    return (
        codes.select(F.col(id_col), F.expr(score).alias("__adc"))
        .orderBy(F.asc("__adc"), F.col(id_col))
        .limit(topk)
        .select(F.col(id_col), F.round("__adc", 6).alias("adc_dist"))
    )


def opq_rotate_kernel(R: Sequence[Sequence[float]], group: int = ROT_GROUP):
    """Arrow-batched rotation kernel: ``embedding → array<double>`` of
    rotated components, computed in vectorized numpy with EXACTLY the
    grouped left-assoc operation sequence ``rot_sql`` / ``rotate_query``
    pin (elementwise IEEE ops over float64 — bit-identical to the SQL
    literals; the bit-equality of all three forms is pytested).

    Why a kernel at all: the plan-literal rotation is 64 expressions of
    ~190 float ops each, and Janino refuses the fused stage ("Code
    grows beyond 64 KB"), leaving Spark to RE-ATTEMPT the compile on
    every action and run interpreted (~µs/op) — the r6 codegen-ceiling
    lesson hit head-on. The kernel is one ArrowEvalPython node; the
    distance chain downstream reads ``element_at(__rot, i)`` — the
    same compiled shape plain PQ runs on the raw embedding. This is
    also the r9 numpy-kernel precedent (IVF assignment 23.9×)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    Rn = np.asarray(R, dtype=np.float64)
    n_comp, dim = Rn.shape

    @pandas_udf("array<double>")
    def _rot(vecs):
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        X = np.array(vecs.tolist(), dtype=np.float64)  # float32 promotes exactly
        out = np.empty((X.shape[0], n_comp), dtype=np.float64)
        for i in range(n_comp):
            terms = X * Rn[i][None, :]  # elementwise == CAST(e)·CAST(lit)
            gparts = []
            for g in range(0, dim, group):
                acc = terms[:, g].copy()
                for t in range(g + 1, min(g + group, dim)):
                    acc = acc + terms[:, t]  # left-assoc within the group
                gparts.append(acc)
            tot = gparts[0]
            for gp in gparts[1:]:
                tot = tot + gp  # left-assoc across groups
            out[:, i] = tot
        return pd.Series(list(out))

    return _rot


def opq_encode(
    df: DataFrame,
    R: Sequence[Sequence[float]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "numpy",
) -> DataFrame:
    """OPQ encode: rotate (``rotated[i] = R[i]·x``) THEN product-
    quantize the rotated components through the unchanged
    ``pq_code_layers`` chain. Same scale shape as ``pq_encode``: an
    ingest-time map, no shuffle — the rotation runs once per vector at
    ingest; probes never touch it (they rotate only the query,
    driver-side).

    ``kernel="numpy"`` (default, the execution path): the rotation is
    one Arrow-batched vectorized kernel (``opq_rotate_kernel`` — same
    bits, compiles, see its docstring for why). ``kernel="sql"`` is the
    plan-literal reference form the DuckDB oracle twin replays — kept
    selectable because it IS the exactness contract, but at dim = 64
    it exceeds Janino's 64 KB method ceiling and runs interpreted."""
    dim = len(R)
    out = parallelize_narrow_input(df.select(F.col(id_col), F.col(vec_col)))
    if kernel == "numpy":
        # two chained Arrow passes: rotate, then encode — neither
        # touches the SQL parser or the codegen method ceiling
        rot = out.select(
            F.col(id_col), opq_rotate_kernel(R)(F.col(vec_col)).alias("__rot")
        )
        enc = pq_code_kernel(codebooks)
        arr = rot.select(F.col(id_col), enc(F.col("__rot")).alias("__w"))
        return _project_code_words(arr, len(codebooks))
    if kernel != "sql":
        raise ValueError(f"opq_encode: unknown kernel {kernel!r}")
    out = out.select(
        F.col(id_col),
        *[
            F.expr(rot_sql(_spark_idx(vec_col), R[i])).alias(f"__r{i + 1}")
            for i in range(dim)
        ],
    )
    layers = pq_code_layers(lambda i: f"__r{i}", codebooks)
    for layer in layers:
        out = out.select("*", *[F.expr(sql).alias(a) for a, sql in layer])
    return out.select(
        F.col(id_col), *[F.col(c) for c in pq_word_cols(len(codebooks))]
    )


def opq_adc_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    R: Sequence[Sequence[float]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "numpy",
) -> DataFrame:
    """OPQ ADC top-k: encode under the rotation (ingest-time in
    production — composed here so the catalog entry is self-contained),
    rotate the QUERY driver-side with the bit-identical ``rotate_query``
    mirror, and rank by the standard ADC LUT over the rotated query.
    The scan side still reads only (id, code word(s)) — the rotation
    adds ZERO probe-time cost; R is orthonormal so ADC distances remain
    estimates of original-space L2. Ascending distance, ties to the
    lowest id."""
    codes = opq_encode(embeddings, R, codebooks, id_col, vec_col, kernel=kernel)
    score = adc_score_sql(rotate_query(R, query_vec), codebooks)
    return (
        codes.select(F.col(id_col), F.expr(score).alias("__adc"))
        .orderBy(F.asc("__adc"), F.col(id_col))
        .limit(topk)
        .select(F.col(id_col), F.round("__adc", 6).alias("adc_dist"))
    )


def adc_vs_luts(luts: dict, m: int, k: int):
    """Kernel factory for BATCHED ADC scoring: a pandas_udf
    ``(query_id, pq_code) → ADC distance`` with one m×k lookup table
    per query closed over the UDF (driver-computed via ``adc_lut`` —
    serving batches are small by definition; Q×m×k doubles ≈ KBs).

    Arrow-batched numpy: codes unpack to an (n, m) sub-code matrix in
    one vectorized divmod, then a fancy-gather + row-sum per distinct
    query in the batch — the batch analogue of the per-query plan-
    literal lookup ``adc_score_sql`` emits, for the regime where Q
    literal CASE dispatches would blow the codegen budget. Query ids
    are dict-matched on their string form so integer and string id
    columns both key the same table.

    Preconditions enforced with LOUD errors (ADVICE r10): a NULL
    ``pq_code`` (possible if an embedding contains NaN — every CASE
    arm of ``pq_code_layers`` is false) and a query id absent from the
    LUT dict both raise a message naming the cause, instead of an
    opaque numpy cast failure mid-executor.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    tensors = {str(q): np.asarray(lut, dtype=np.float64) for q, lut in luts.items()}
    n_words = -(-m // PQ_WORD)
    word_lens = [min(PQ_WORD, m - w * PQ_WORD) for w in range(n_words)]
    pows = [
        np.array([k ** j for j in range(wl)], dtype=np.int64) for wl in word_lens
    ]
    cols = np.arange(m)

    @pandas_udf("double")
    def _adc(qids, *code_words):
        # one code column per packed word (m ≤ 8 → the single pq_code;
        # m = 16 → pq_code_0, pq_code_1) — the caller passes
        # pq_word_cols(m) in order
        n = len(qids)
        if n == 0:
            return pd.Series(np.empty(0, dtype=np.float64))
        subs = []
        for w, codes in enumerate(code_words):
            if codes.isna().any():
                raise ValueError(
                    "adc_vs_luts: NULL pq_code in the scan — a NaN embedding "
                    "encodes to NULL (every pq_code_layers CASE arm false); "
                    "filter or fix the encode path (non-null, non-NaN "
                    "embeddings are the documented precondition)"
                )
            C = codes.to_numpy(dtype=np.int64)
            subs.append((C[:, None] // pows[w][None, :]) % k)
        sub = np.concatenate(subs, axis=1)  # (n, m) sub-codes
        out = np.empty(n, dtype=np.float64)
        qarr = qids.astype(str).to_numpy()
        for q in np.unique(qarr):
            lut = tensors.get(q)
            if lut is None:
                raise ValueError(
                    f"adc_vs_luts: query id {q!r} has no LUT — the batch "
                    "LUT dict must cover every query id reaching the scan"
                )
            idx = np.nonzero(qarr == q)[0]
            out[idx] = lut[cols[None, :], sub[idx]].sum(axis=1)
        return pd.Series(out)

    return _adc


# -------------------------------------------------- codebook policy
# (r14, VERDICT r13 item 5): the measured OPQ trigger made executable.
# SCALING.md r13's anisotropic-replica study showed OPQ beats PQ at
# every tight shortlist once the per-dimension variance card skews —
# top-8/64 variance share ≥~15% (isotropic = 8/64 = 12.5%; the win
# grows with the eigen-ratio: +5/+6 recall pts at r=87, +11/+10 at
# r≈1000) — and is a wash on balanced corpora, where the rotation is
# pure extra machinery. These helpers read the SAME measurement
# ``dq_embedding_profile`` publishes (µ-int exact per-dimension
# variances) and pick the codebook family for a serving build.

#: Decision dial, from SCALING.md r13 ("top-8/64 share well above
#: ~15% → OPQ"). top_n scales with dim: 8 of 64 = the top eighth.
OPQ_TOP_N = 8
OPQ_TOP_SHARE = 0.15


def embedding_variance_card(
    embeddings: DataFrame, dim: int = 64, vec_col: str = "embedding"
) -> list[float]:
    """Per-dimension population variance — the ``dq_embedding_profile``
    aggregation collapsed to a list (same µ-scale BIGINT quantization,
    so the integer sums are order-immune and the result is
    deterministic). Scale: one Arrow kernel pass collapses the corpus
    to dim-row integer partials (collected: 64 rows) — no explode, no
    collect of vectors."""
    # r15: moments come from the Arrow moment_partials kernel — the
    # expression form was codegen-bound (129 agg buffers per row, the
    # dq_embedding_profile disease); the kernel's mu_quantize is
    # bit-equality-pinned to the SQL chain and partials accumulate in
    # DECIMAL(38,0) (Σ q² overflows int64 at ~5e8 vectors, r14 fix).
    from . import vector_kernel as VK

    rows = {
        r["dim"]: (int(r["n"]), int(r["s"]), int(r["ss"]))
        for r in VK.moment_partials(embeddings, vec_col, dim).collect()
    }
    if not rows:
        raise ValueError("embedding_variance_card: empty corpus")
    return [
        (
            float(rows[i][2]) / rows[i][0]
            - (rows[i][1] / rows[i][0]) ** 2
        )
        / 1e12
        for i in range(1, dim + 1)
    ]


def variance_top_share(
    variances: Sequence[float], top_n: int = OPQ_TOP_N
) -> float:
    """Fraction of total per-dimension variance carried by the top
    ``top_n`` dimensions. Isotropic corpus → top_n/len; a skewed
    encoder spectrum pushes it up."""
    vs = sorted(float(v) for v in variances)
    vs.reverse()
    total = sum(vs)
    if total <= 0.0:  # all-constant embedding column — no spread signal
        return top_n / len(vs)
    return sum(vs[:top_n]) / total


def choose_codebook_strategy(
    variances: Sequence[float],
    top_n: int = OPQ_TOP_N,
    share_threshold: float = OPQ_TOP_SHARE,
) -> str:
    """``'opq'`` when the variance card is skewed enough for the
    rotation to pay (SCALING.md r13 trigger), else ``'pq'``."""
    return (
        "opq"
        if variance_top_share(variances, top_n) >= share_threshold
        else "pq"
    )


def train_codebooks_auto(
    embeddings: DataFrame,
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    sample_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    variances: Sequence[float] | None = None,
    top_n: int = OPQ_TOP_N,
    share_threshold: float = OPQ_TOP_SHARE,
):
    """The default codebook build for a serving tier: measure the
    variance card (or take a precomputed one), apply the SCALING.md r13
    trigger, and train PQ or OPQ accordingly.

    Returns ``(codebooks, rotation_or_None, decision)`` where
    ``decision`` records strategy / top_share / threshold — pass the
    first two straight to ``IVFIndex(codebooks=..., rotation=...)``.
    """
    if variances is None:
        variances = embedding_variance_card(embeddings, dim, vec_col)
    share = variance_top_share(variances, top_n)
    strategy = choose_codebook_strategy(variances, top_n, share_threshold)
    if strategy == "opq":
        rotation, books = train_opq(
            embeddings, dim=dim, m=m, k=k,
            sample_cap=sample_cap, id_col=id_col, vec_col=vec_col,
        )
    else:
        books = train_pq_codebooks(
            embeddings, dim=dim, m=m, k=k,
            sample_cap=sample_cap, id_col=id_col, vec_col=vec_col,
        )
        rotation = None
    decision = {
        "strategy": strategy,
        "top_share": share,
        "top_n": top_n,
        "share_threshold": share_threshold,
    }
    return books, rotation, decision
