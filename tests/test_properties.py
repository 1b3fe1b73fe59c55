"""Property-based tests (hypothesis): the framing scanner is invariant
to arbitrary chunking; the schema registry round-trips arbitrary field
sets; jaccard/minhash invariants."""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from gomaxscale_spark.sources.framing import JsonFrameScanner
from gomaxscale_spark.sources.schema_registry import ddl_to_struct

# -- framing ---------------------------------------------------------------

json_values = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**31), max_value=2**31),
        st.text(max_size=20),
    ),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8), children, max_size=4),
    ),
    max_leaves=10,
)

json_objects = st.dictionaries(st.text(max_size=8), json_values, min_size=1, max_size=5)


@given(
    objs=st.lists(json_objects, min_size=1, max_size=6),
    cuts=st.lists(st.integers(min_value=1, max_value=20), max_size=30),
)
@settings(max_examples=200, deadline=None)
def test_framing_invariant_to_chunking(objs, cuts):
    """However the byte stream is sliced into reads, the scanner emits
    exactly the original objects, in order."""
    stream = b"".join(json.dumps(o).encode() for o in objs)
    sc = JsonFrameScanner()
    frames = []
    pos = 0
    for cut in cuts:
        frames.extend(sc.feed(stream[pos : pos + cut]))
        pos += cut
        if pos >= len(stream):
            break
    frames.extend(sc.feed(stream[pos:]))
    decoded = [json.loads(f.payload) for f in frames if f.kind == "json"]
    assert decoded == objs
    assert not [f for f in frames if f.kind == "error"]


@given(
    objs=st.lists(json_objects, min_size=1, max_size=4),
    garbage=st.text(alphabet=st.characters(blacklist_characters="{}\"\\", min_codepoint=32, max_codepoint=126), min_size=1, max_size=15),
)
@settings(max_examples=100, deadline=None)
def test_framing_garbage_between_objects(objs, garbage):
    """Bare text between objects becomes error frames and never corrupts
    the JSON frames around it (single-feed delivery, like the reference's
    single-read constraint for non-JSON data)."""
    parts = [json.dumps(o).encode() for o in objs]
    stream = parts[0] + garbage.encode() + b"".join(parts[1:])
    sc = JsonFrameScanner()
    frames = sc.feed(stream)
    decoded = [json.loads(f.payload) for f in frames if f.kind == "json"]
    assert decoded == objs
    if garbage.strip():
        errs = [f.payload for f in frames if f.kind == "error"]
        assert errs == [garbage.encode()]


# -- schema registry -------------------------------------------------------

primitive = st.sampled_from(["int", "long", "float", "double", "string", "bytes", "boolean"])
field_type = st.one_of(
    primitive,
    st.tuples(primitive).map(lambda t: ["null", t[0]]),
    st.tuples(primitive).map(lambda t: [t[0], "null"]),
)
field_names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=122), min_size=1, max_size=10
)


@given(
    fields=st.lists(
        st.tuples(field_names, field_type), min_size=1, max_size=8, unique_by=lambda t: t[0]
    )
)
@settings(max_examples=200, deadline=None)
def test_registry_field_count_and_nullability(fields):
    struct = ddl_to_struct({"fields": [{"name": n, "type": t} for n, t in fields]})
    assert struct.fieldNames() == [n for n, _ in fields]
    for (name, ftype) in fields:
        expected_nullable = isinstance(ftype, list) and "null" in ftype
        assert struct[name].nullable == expected_nullable


# -- CDC snapshot fold (model-based) ---------------------------------------

import pytest

op_strategy = st.sampled_from(["insert", "update_before", "update_after", "delete"])
change_stream = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),   # key
        op_strategy,
        st.floats(min_value=0, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)


@pytest.fixture(scope="module")
def _spark_for_props(spark):
    return spark


@given(changes=change_stream)
@settings(max_examples=30, deadline=None)
def test_snapshot_fold_matches_dict_replay(_spark_for_props, changes):
    """materialize_snapshot ≡ the obvious sequential dict replay."""
    from gomaxscale_spark.operators.snapshot import materialize_snapshot

    spark = _spark_for_props
    rows = [(k, op, v, seq) for seq, (k, op, v) in enumerate(changes)]
    df = spark.createDataFrame(rows, "id int, event_type string, v double, seq long")
    got = {r.id: r.v for r in materialize_snapshot(df, ["id"], ["seq"]).collect()}

    model: dict[int, float] = {}
    for k, op, v in changes:
        if op == "update_before":
            continue
        if op == "delete":
            model.pop(k, None)
        else:
            model[k] = v
    assert got == model


# -- prefix filtering (AllPairs/PPJoin lemma) ------------------------------

@given(
    sets=st.lists(
        st.frozensets(st.integers(min_value=0, max_value=60), min_size=1, max_size=40),
        min_size=2, max_size=12,
    ),
    threshold=st.floats(min_value=0.05, max_value=0.99, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_prefix_filter_lemma_never_misses_a_pair(sets, threshold):
    """The recall-1 guarantee operators/dedup.py::prefix_filter_candidates
    rides, checked as pure math over arbitrary sets and thresholds: any
    pair with Jaccard >= t shares an element of BOTH prefixes of length
    |x| - ceil(t*|x|) + 1 under a shared global order (including the
    1e-9 float guard used in the Spark expression)."""
    import math

    def prefix(s: frozenset) -> set:
        ordered = sorted(s)  # any global total order; Spark uses (df, hash)
        plen = len(s) - int(math.ceil(threshold * len(s) - 1e-9)) + 1
        assert plen >= 1
        return set(ordered[:plen])

    for i, x in enumerate(sets):
        for y in sets[i + 1:]:
            inter = len(x & y)
            union = len(x) + len(y) - inter
            if union and inter / union >= threshold:
                assert prefix(x) & prefix(y), (
                    f"t={threshold}: J={inter/union} pair with disjoint prefixes: "
                    f"{sorted(x)} / {sorted(y)}"
                )


@given(
    sets=st.lists(
        st.frozensets(st.integers(min_value=0, max_value=60), min_size=1, max_size=40),
        min_size=2, max_size=12,
    ),
    threshold=st.floats(min_value=0.05, max_value=0.99, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_prefix_filter_pair_level_bounds_never_prune_a_true_pair(sets, threshold):
    """The r6 pair-level filters (PPJoin positional + boundary-suffix,
    operators/dedup.py::prefix_filter_candidates positional=True),
    modeled as pure math: for every pair with Jaccard >= t, both
    certifiable-overlap upper bounds must clear the
    alpha = t/(1+t)*(|x|+|y|) overlap requirement — i.e. the filters
    only ever drop FALSE candidates."""
    import math

    def ordered_prefix(s: frozenset) -> list:
        ordered = sorted(s)
        plen = len(s) - int(math.ceil(threshold * len(s) - 1e-9)) + 1
        return ordered[:plen]

    for i, x in enumerate(sets):
        for y in sets[i + 1:]:
            inter = len(x & y)
            union = len(x) + len(y) - inter
            if not union or inter / union < threshold:
                continue
            px, py = ordered_prefix(x), ordered_prefix(y)
            shared = set(px) & set(py)
            assert shared  # prefix lemma, re-asserted
            ox, oy = sorted(x), sorted(y)
            alpha = threshold / (1.0 + threshold) * (len(x) + len(y)) - 1e-9
            # positional: best (first-common-token) remaining bound
            best_rem = max(
                min(len(x) - (ox.index(h) + 1), len(y) - (oy.index(h) + 1))
                for h in shared
            )
            assert 1 + best_rem >= alpha, (
                f"t={threshold}: positional filter would drop a true pair "
                f"{sorted(x)} / {sorted(y)}"
            )
            # boundary-suffix: m + smaller-boundary side's suffix size
            m = len(shared)
            if px[-1] <= py[-1]:
                bound = m + (len(x) - len(px))
            else:
                bound = m + (len(y) - len(py))
            assert bound >= alpha, (
                f"t={threshold}: boundary-suffix filter would drop a true pair "
                f"{sorted(x)} / {sorted(y)} (m={m})"
            )


# -- portable minhash fold family ------------------------------------------

from gomaxscale_spark.operators.dedup import (  # noqa: E402
    MINHASH_P,
    MINHASH_R,
    MINHASH_R2,
    band_key_sql,
    cw_fold_sql,
    cw_hash_coefficients,
)


def _fold_ref(vals: list[int], mult: int) -> int:
    """Pure-Python reference of cw_fold_sql, asserting every
    intermediate product stays below 2⁶² (the bound that makes the SQL
    overflow-free — hence bit-identical — in Spark ANSI mode and
    DuckDB)."""
    h = vals[0]
    for v in vals[1:]:
        prod = h * mult
        assert prod < 2**62
        h = (prod + v) % MINHASH_P
    return h


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=MINHASH_P - 1), min_size=2, max_size=6
    )
)
@settings(max_examples=100, deadline=None)
def test_cw_fold_and_band_key_sql_match_python_in_duckdb(vals):
    """The fold strings the Spark plan AND the oracle both embed
    (cw_fold_sql / band_key_sql) evaluate in DuckDB to the pure-Python
    reference on arbitrary in-range inputs, and the packed band key
    stays below 2⁶³ (BIGINT-safe). This is the arithmetic backbone the
    portable-LSH oracle replay rides — pinned independently of any
    corpus."""
    import duckdb

    names = [f"v{i}" for i in range(len(vals))]
    sel = ", ".join(f"CAST({v} AS BIGINT) AS v{i}" for i, v in enumerate(vals))
    fold, bk = cw_fold_sql(names, MINHASH_R), band_key_sql(names)
    got_fold, got_bk = duckdb.sql(
        f"SELECT {fold} AS f, {bk} AS k FROM (SELECT {sel})"
    ).fetchone()
    assert got_fold == _fold_ref(vals, MINHASH_R)
    expected_key = _fold_ref(vals, MINHASH_R) * MINHASH_P + _fold_ref(vals, MINHASH_R2)
    assert got_bk == expected_key and expected_key < 2**63


@given(tok=st.text(min_size=1, max_size=24))
@settings(max_examples=150, deadline=None)
def test_portable_token_hash_duckdb_matches_md5_reference(tok):
    """DuckDB's side of the portable token hash — ('0x' ||
    substr(md5(t),1,15))::BIGINT % P — equals the definitional md5
    60-bit prefix on arbitrary unicode tokens. (The Spark side of the
    same identity is pinned corpus-wide by tests/test_oracle_parity.py;
    together they fix both engines to one function.)"""
    import duckdb
    import hashlib

    got = duckdb.execute(
        f"SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT % {MINHASH_P}", [tok]
    ).fetchone()[0]
    ref = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16) % MINHASH_P
    assert got == ref


def test_cw_coefficients_are_overflow_free():
    """max(aᵢ)·max(h) + max(bᵢ) for the fixed-seed family stays below
    2⁶² — the signature min-agg never overflows in either engine."""
    coeffs = cw_hash_coefficients(64)
    for a, b in coeffs:
        assert 1 <= a < MINHASH_P and 0 <= b < MINHASH_P
        assert a * (MINHASH_P - 1) + b < 2**62


@given(
    w=st.integers(min_value=0, max_value=100_000),
    h=st.integers(min_value=0, max_value=100_000),
    max_dim=st.integers(min_value=1, max_value=4096),
)
@settings(max_examples=500, deadline=None)
def test_fit_dims_bounds_aspect_and_idempotence(w, h, max_dim):
    """operators/multimodal.py::fit_dims — the integer fit program the
    resize oracle replays: outputs bounded by max_dim, aspect preserved
    to within integer truncation, already-fitting inputs untouched, and
    the fit is idempotent (resizing a resized image is a no-op)."""
    from gomaxscale_spark.operators.multimodal import fit_dims

    ow, oh = fit_dims(w, h, max_dim)
    if max(w, h) <= max_dim:
        assert (ow, oh) == (w, h)
    else:
        assert 1 <= max(ow, oh) <= max_dim
        assert min(ow, oh) >= 1
        # aspect: out_w/out_h ≈ w/h within floor truncation of the scale
        m = max(w, h)
        assert ow == max(1, (w * max_dim) // m)
        assert oh == max(1, (h * max_dim) // m)
    assert fit_dims(ow, oh, max_dim) == (ow, oh)
