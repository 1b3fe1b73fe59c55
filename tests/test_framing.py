"""Framing unit tests — the scenario matrix of the reference's stream
tests (FIXTURES.md B3): split objects, multi-object reads, garbage
interleave, whitespace, error sniffing."""

from __future__ import annotations

import json

import pytest

from gomaxscale_spark.sources.framing import Frame, JsonFrameScanner, is_error_response


def feed_all(chunks: list[bytes]) -> list[Frame]:
    sc = JsonFrameScanner()
    out: list[Frame] = []
    for ch in chunks:
        out.extend(sc.feed(ch))
    return out


def test_single_object_one_read():
    frames = feed_all([b'{"domain": 0, "sequence": 1}'])
    assert [f.kind for f in frames] == ["json"]
    assert json.loads(frames[0].payload) == {"domain": 0, "sequence": 1}


def test_object_split_across_reads():
    frames = feed_all([b'{"domain": 0, "seq', b'uence": 1}{"domain":', b" 1}"])
    assert [f.kind for f in frames] == ["json", "json"]
    assert json.loads(frames[1].payload) == {"domain": 1}


def test_multiple_objects_one_read():
    frames = feed_all([b'{"a":1}{"b":2}{"c":3}'])
    assert [json.loads(f.payload) for f in frames] == [{"a": 1}, {"b": 2}, {"c": 3}]


def test_nested_objects():
    payload = b'{"a": {"b": {"c": 1}}, "d": [{"e": 2}]}'
    frames = feed_all([payload[:10], payload[10:]])
    assert len(frames) == 1
    assert json.loads(frames[0].payload)["a"]["b"]["c"] == 1


def test_braces_inside_strings_do_not_break_framing():
    payload = b'{"msg": "a } inside { a string", "n": 1}'
    frames = feed_all([payload])
    assert len(frames) == 1
    assert json.loads(frames[0].payload)["n"] == 1


def test_escaped_quote_inside_string():
    payload = b'{"msg": "quote \\" and brace }", "n": 2}'
    frames = feed_all([payload])
    assert len(frames) == 1
    assert json.loads(frames[0].payload)["n"] == 2


def test_garbage_before_object_is_error_frame():
    frames = feed_all([b'ERR something bad{"a":1}'])
    assert [f.kind for f in frames] == ["error", "json"]
    assert frames[0].payload == b"ERR something bad"
    assert is_error_response(frames[0].payload)


def test_trailing_garbage_flushed_per_read():
    # non-JSON must fit one read (reference stream.go:85-96)
    frames = feed_all([b"server exploded"])
    assert [f.kind for f in frames] == ["error"]


def test_whitespace_between_objects_dropped():
    frames = feed_all([b'{"a":1}\n   {"b":2}\n'])
    assert [f.kind for f in frames] == ["json", "json"]


def test_carry_over_pending_bytes():
    sc = JsonFrameScanner()
    assert sc.feed(b'{"a"') == []
    assert sc.pending == 4
    frames = sc.feed(b":1}")
    assert len(frames) == 1 and sc.pending == 0


@pytest.mark.parametrize(
    ("payload", "expected"),
    [(b"OK", False), (b"ERR bad", True), (b"Internal Error", True), (b"fine", False)],
)
def test_error_sniff(payload, expected):
    assert is_error_response(payload) is expected
