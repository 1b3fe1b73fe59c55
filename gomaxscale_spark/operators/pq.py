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
    ≤ ``sample_cap`` rows for dense 0-based integer ids, never the
    corpus; stride is the CEILING of n/sample_cap so the bound holds
    at every n). Deterministic: sample by ``id % stride == 0``, init
    each codebook from the sample's first k distinct subvectors (order
    of first appearance; if the sample holds fewer than k distinct
    subvectors the init pads with repeats, which collapse — ties go to
    the lowest index — leaving dead centroids, the honest cap when the
    data itself has < k distinct values). L2 assignment ties to the
    lowest centroid. Empty clusters keep their previous centroid
    (standard fix)."""
    import numpy as np

    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m {m}")
    n = embeddings.count()
    stride = max(1, -(-n // sample_cap))  # ceil: collect stays ≤ cap
    rows = (
        embeddings.filter((F.col(id_col) % stride) == 0)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    if len(X) < k:
        raise ValueError(f"pq: sample of {len(X)} rows < k={k}")
    d8 = dim // m
    books = []
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
        books.append([[float(x) for x in row] for row in C])
    return books


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

def pq_encode(
    df: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pq_code[, pq_code_1 …]): each vector quantized to packed
    BIGINT word(s) — the ingest-time map. One narrow projection chain,
    no shuffle; m > PQ_WORD subspaces emit one column per 8-subspace
    word (the m=16 layout is 16 B/vector — still a 16× scan cut)."""
    out = parallelize_narrow_input(df.select(F.col(id_col), F.col(vec_col)))
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
