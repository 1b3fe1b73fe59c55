"""Byte-stream framing for the MaxScale CDC wire format.

The CDC listener sends a stream of newline-free JSON objects (one per
event) with occasional bare error text between them. The reference
splits this with a brace-depth scanner carrying partial objects across
reads (/root/reference/stream.go:28-117). This is the same algorithm as
an incremental, feed-based generator, with one deliberate improvement:
brace counting is JSON-string-aware (a ``{`` inside a string value no
longer corrupts the depth), which is strictly a superset of the
reference's accepted inputs.

Behavioral parity points (tested in tests/test_framing.py):
- an object split across N reads is emitted once complete;
- multiple objects in one read emit in order;
- bare non-JSON text at depth 0 becomes an *error* frame; like the
  reference, a bare-text run must fit within one feed() call — at the
  end of each feed, pending non-JSON bytes are flushed (stream.go:85-96);
- whitespace-only garbage is dropped (stream.go:63);
- the liveness guard (abort after too many empty reads,
  stream.go:102-105) lives in the client loop, not here.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Frame:
    kind: str  # "json" | "error"
    payload: bytes


class JsonFrameScanner:
    """Incremental splitter: ``feed(chunk)`` returns completed frames."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._depth = 0
        self._in_string = False
        self._escaped = False

    @property
    def pending(self) -> int:
        """Bytes buffered awaiting completion (carry-over across reads)."""
        return len(self._buf)

    def feed(self, chunk: bytes) -> list[Frame]:
        frames: list[Frame] = []
        for byte in chunk:
            ch = chr(byte)
            if self._depth > 0:
                # inside an object: track strings so braces in values
                # don't disturb the depth
                self._buf.append(byte)
                if self._in_string:
                    if self._escaped:
                        self._escaped = False
                    elif ch == "\\":
                        self._escaped = True
                    elif ch == '"':
                        self._in_string = False
                elif ch == '"':
                    self._in_string = True
                elif ch == "{":
                    self._depth += 1
                elif ch == "}":
                    self._depth -= 1
                    if self._depth == 0:
                        self._emit(frames, "json")
            else:
                if ch == "{":
                    # bare text accumulated before this object is a
                    # server error message
                    if self._buf:
                        self._emit(frames, "error")
                    self._buf.append(byte)
                    self._depth = 1
                    self._in_string = False
                    self._escaped = False
                else:
                    self._buf.append(byte)
        if self._depth == 0 and self._buf:
            # non-JSON data can't be length-delimited — it must fit one
            # read; flush whatever bare text this chunk left behind
            self._emit(frames, "error")
        return frames

    def _emit(self, frames: list[Frame], kind: str) -> None:
        payload = bytes(self._buf)
        self._buf.clear()
        if payload.strip():
            frames.append(Frame(kind, payload))


def is_error_response(payload: bytes) -> bool:
    """The reference's error sniff: any case-insensitive 'err' substring
    (stream.go:143-148) — handshake replies are 'OK' / 'ERR ...'."""
    return b"err" in payload.lower()
