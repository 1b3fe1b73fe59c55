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
