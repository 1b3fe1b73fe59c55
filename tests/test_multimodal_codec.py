"""Dependency-free real-codec path: BMP / PPM parsing through the same
Arrow mapInPandas plumbing the fake path uses (VERDICT r4 item 5 — the
one hot path that had never executed on real pixel data)."""

from __future__ import annotations

import struct

from gomaxscale_spark.operators.multimodal import (
    decode_image_real,
    decode_media,
    fake_decode_features,
)


def make_ppm_p6(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    header = f"P6\n# test fixture\n{width} {height}\n255\n".encode()
    return header + bytes(rgb) * (width * height)


def make_ppm_p3(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    header = f"P3\n{width} {height}\n255\n"
    body = " ".join(" ".join(str(c) for c in rgb) for _ in range(width * height))
    return (header + body + "\n").encode()


def make_bmp24(width: int, height: int, bgr: tuple[int, int, int]) -> bytes:
    stride = ((width * 3 + 3) // 4) * 4
    pixel_bytes = (bytes(bgr) * width + b"\x00" * (stride - width * 3)) * height
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(pixel_bytes)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return file_header + dib + pixel_bytes


def test_ppm_p6_parsed_exactly():
    img = make_ppm_p6(5, 4, (10, 20, 30))
    got = decode_image_real(img)
    assert (got["width"], got["height"]) == (5, 4)
    assert got["mean_intensity"] == 20.0
    assert got["byte_len"] == len(img)


def test_ppm_p3_matches_p6_semantics():
    p6 = decode_image_real(make_ppm_p6(3, 2, (0, 0, 90)))
    p3 = decode_image_real(make_ppm_p3(3, 2, (0, 0, 90)))
    assert (p3["width"], p3["height"], p3["mean_intensity"]) == (
        p6["width"], p6["height"], p6["mean_intensity"],
    )


def test_bmp24_parsed_with_row_padding():
    # width 5 → 15 pixel bytes per row, stride 16: the padding byte must
    # not contaminate the mean
    img = make_bmp24(5, 3, (200, 100, 0))
    got = decode_image_real(img)
    assert (got["width"], got["height"]) == (5, 3)
    assert got["mean_intensity"] == 100.0


def test_unknown_format_raises_not_implemented():
    import pytest

    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG\r\n\x1a\nrest-of-a-png")


def test_decode_media_real_codec_end_to_end(spark):
    """The real-decode path through the actual mapInPandas stage: real
    formats decode to true dimensions, unsupported payloads fall back to
    the deterministic fake — one mixed Arrow batch, no failures."""
    ppm = make_ppm_p6(8, 2, (60, 60, 60))
    bmp = make_bmp24(4, 4, (30, 60, 90))
    fake = b"not-an-image-payload"
    df = spark.createDataFrame(
        [(1, bytearray(ppm), "image/x-portable-pixmap"),
         (2, bytearray(bmp), "image/bmp"),
         (3, bytearray(fake), "application/octet-stream")],
        "doc_id long, media binary, mime string",
    )
    rows = {r.doc_id: r for r in decode_media(df, use_real_codec=True).collect()}
    assert (rows[1].width, rows[1].height, rows[1].mean_intensity) == (8, 2, 60.0)
    assert (rows[2].width, rows[2].height, rows[2].mean_intensity) == (4, 4, 60.0)
    expected_fake = fake_decode_features(fake)
    assert (rows[3].width, rows[3].height) == (expected_fake["width"], expected_fake["height"])
    assert rows[3].mean_intensity == expected_fake["mean_intensity"]


def make_ppm_p6_quadrants(width: int, height: int) -> bytes:
    """P6 with four solid-color quadrants — distinguishes nearest-
    neighbor sampling positions."""
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    rows = bytearray()
    for y in range(height):
        for x in range(width):
            q = (1 if x >= width // 2 else 0) + (2 if y >= height // 2 else 0)
            rows += bytes(colors[q])
    return f"P6\n{width} {height}\n255\n".encode() + bytes(rows)


def test_resize_real_nearest_neighbor_quadrants():
    from gomaxscale_spark.operators.multimodal import resize_image_real

    src = make_ppm_p6_quadrants(32, 32)
    out = resize_image_real(src, max_dim=4)
    assert (out["in_w"], out["in_h"], out["out_w"], out["out_h"]) == (32, 32, 4, 4)
    media = out["out_media"]
    assert media.startswith(b"P6\n4 4\n255\n")
    raster = media[len(b"P6\n4 4\n255\n"):]
    assert len(raster) == 4 * 4 * 3 == out["out_payload_bytes"]

    def px(x, y):
        o = (y * 4 + x) * 3
        return tuple(raster[o:o + 3])

    # each output pixel must be its quadrant's solid color
    assert px(0, 0) == (255, 0, 0) and px(3, 0) == (0, 255, 0)
    assert px(0, 3) == (0, 0, 255) and px(3, 3) == (255, 255, 0)


def test_resize_real_preserves_aspect_and_handles_small_inputs():
    from gomaxscale_spark.operators.multimodal import fit_dims, resize_image_real

    out = resize_image_real(make_ppm_p6(128, 32, (10, 20, 30)), max_dim=64)
    assert (out["out_w"], out["out_h"]) == (64, 16)
    # already-fitting images pass through unresized
    out2 = resize_image_real(make_ppm_p6(8, 2, (1, 2, 3)), max_dim=64)
    assert (out2["out_w"], out2["out_h"]) == (8, 2)
    # BMP goes through the same raster path (bottom-up flip + BGR->RGB)
    out3 = resize_image_real(make_bmp24(16, 16, (30, 60, 90)), max_dim=4)
    assert (out3["out_w"], out3["out_h"]) == (4, 4)
    assert out3["out_media"][len(b"P6\n4 4\n255\n"):][:3] == bytes((90, 60, 30))
    assert fit_dims(0, 0, 64) == (0, 0)
    assert fit_dims(1000, 1, 64) == (64, 1)


def test_resize_media_mixed_batch(spark):
    """The mapInPandas resize stage on one mixed Arrow batch: real
    payloads resize for real, non-images fall back to the deterministic
    dimension arithmetic with NULL media — no failures."""
    from gomaxscale_spark.operators.multimodal import fake_decode_features, fit_dims, resize_media

    ppm = make_ppm_p6_quadrants(32, 16)
    fake = b"not-an-image-payload-" * 40
    df = spark.createDataFrame(
        [(1, bytearray(ppm), "image/x-portable-pixmap"),
         (2, bytearray(fake), "application/octet-stream")],
        "doc_id long, media binary, mime string",
    )
    rows = {r.doc_id: r for r in resize_media(df, max_dim=8, use_real_codec=True).collect()}
    assert (rows[1].in_w, rows[1].in_h, rows[1].out_w, rows[1].out_h) == (32, 16, 8, 4)
    assert bytes(rows[1].out_media).startswith(b"P6\n8 4\n255\n")
    feats = fake_decode_features(fake)
    ow, oh = fit_dims(feats["width"], feats["height"], 8)
    assert (rows[2].in_w, rows[2].in_h, rows[2].out_w, rows[2].out_h) == (
        feats["width"], feats["height"], ow, oh)
    assert rows[2].out_media is None
    assert rows[2].out_payload_bytes == ow * oh * 3


def test_resize_media_default_path_ignores_netpbm_lookalikes(spark):
    """use_real_codec defaults to False on EVERY multimodal stage: a
    text payload that happens to parse as netpbm ('P3 2 2 255 ...')
    must ride the deterministic arithmetic, not silently take the real
    decoder and diverge from the SQL oracle."""
    from gomaxscale_spark.operators.multimodal import (
        fake_decode_features,
        fit_dims,
        resize_media,
    )

    lookalike = b"P3 2 2 255 " + b"7 " * 12  # valid ascii PPM, but it's "text"
    df = spark.createDataFrame(
        [(1, bytearray(lookalike), "text/plain")], "doc_id long, media binary, mime string"
    )
    row = resize_media(df, max_dim=8).collect()[0]
    feats = fake_decode_features(lookalike)
    ow, oh = fit_dims(feats["width"], feats["height"], 8)
    assert (row.in_w, row.in_h, row.out_w, row.out_h) == (
        feats["width"], feats["height"], ow, oh,
    )
    assert row.out_media is None
    # and with the gate on, the same payload resizes for real
    real = resize_media(df, max_dim=8, use_real_codec=True).collect()[0]
    assert (real.in_w, real.in_h) == (2, 2)
    assert bytes(real.out_media).startswith(b"P6\n2 2\n255\n")


def test_sample_frames_survives_lying_riff_header(spark):
    """A malformed AVI whose avih/chunk sizes run past the buffer must
    fall back per payload (struct.error caught), never fail the stage —
    the mixed-batch contract."""
    import struct as _struct

    from gomaxscale_spark.operators.multimodal import sample_frames

    # RIFF/AVI magic + an avih chunk whose declared size lies: body
    # truncated before the dims at offset +32
    lying = b"RIFF" + _struct.pack("<I", 200) + b"AVI " + b"avih" + _struct.pack("<I", 56) + b"\x00" * 8
    df = spark.createDataFrame(
        [(1, bytearray(lying), "video/avi")], "doc_id long, media binary, mime string"
    )
    rows = sample_frames(df, every_n=5, use_real_codec=True).collect()
    assert len(rows) > 0
    assert all(r.frame_media is None for r in rows)  # fallback pseudo-frames


def make_wav(sample_rate: int, channels: int, bits: int, frames: list,
             extra_chunk: bool = False) -> bytes:
    """RIFF/WAVE PCM fixture; `frames` is a list of per-frame tuples
    (one int per channel). Optionally inserts a LIST metadata chunk
    before data to exercise chunk-walking."""
    block_align = channels * bits // 8
    if bits == 16:
        payload = b"".join(struct.pack("<h", s) for fr in frames for s in fr)
    else:
        payload = bytes(s for fr in frames for s in fr)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:
        meta = b"INFOsoft"
        chunks += b"LIST" + struct.pack("<I", len(meta)) + meta
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_16bit_parsed_exactly():
    from gomaxscale_spark.operators.multimodal import decode_audio_real

    # constant half-amplitude stereo: RMS = 0.5
    frames = [(16384, -16384)] * 8000
    out = decode_audio_real(make_wav(16000, 2, 16, frames, extra_chunk=True))
    assert out["sample_rate"] == 16000 and out["channels"] == 2
    assert out["bits"] == 16 and out["n_frames"] == 8000
    assert out["duration_ms"] == 500
    assert out["rms"] == 0.5


def test_wav_8bit_and_rejections():
    from gomaxscale_spark.operators.multimodal import decode_audio_real

    out = decode_audio_real(make_wav(8000, 1, 8, [(128 + 64,)] * 4000))
    assert (out["bits"], out["n_frames"], out["duration_ms"]) == (8, 4000, 500)
    assert out["rms"] == 0.5
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        decode_audio_real(b"ID3\x03not-a-wav-at-all" * 4)


def test_audio_features_mixed_batch(spark):
    from gomaxscale_spark.operators.multimodal import audio_features, fake_audio_features

    wav = make_wav(16000, 1, 16, [(0,)] * 1600)
    fake = b"plain text payload standing in for opaque media"
    df = spark.createDataFrame(
        [(1, bytearray(wav), "audio/wav"), (2, bytearray(fake), "text/plain")],
        "doc_id long, media binary, mime string",
    )
    rows = {r.doc_id: r for r in audio_features(df, use_real_codec=True).collect()}
    assert (rows[1].sample_rate, rows[1].n_frames, rows[1].duration_ms) == (16000, 1600, 100)
    assert rows[1].rms == 0.0
    exp = fake_audio_features(fake)
    assert (rows[2].sample_rate, rows[2].channels, rows[2].n_frames) == (
        exp["sample_rate"], exp["channels"], exp["n_frames"])


def make_avi(width: int, height: int, frame_colors: list) -> bytes:
    """Minimal uncompressed RIFF/AVI fixture: avih header + one 00db
    DIB frame (bottom-up BGR, 4-byte-aligned rows) per color."""
    stride = ((width * 3 + 3) // 4) * 4

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<8I", 33333, 0, 0, 0, len(frame_colors), 0, 1, 0)
    avih += struct.pack("<II", width, height) + b"\x00" * 16
    hdrl = lst(b"hdrl", chunk(b"avih", avih))
    movi_frames = b""
    for bgr in frame_colors:
        row = (bytes(bgr) * width + b"\x00" * (stride - width * 3))
        movi_frames += chunk(b"00db", row * height)
    movi = lst(b"movi", movi_frames)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_frame_extraction_exact_pixels():
    from gomaxscale_spark.operators.multimodal import extract_frames_real

    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]  # BGR
    out = extract_frames_real(make_avi(4, 2, colors), every_n=2)
    assert (out["width"], out["height"], out["n_frames"]) == (4, 2, 4)
    assert [fn for fn, _ in out["frames"]] == [0, 2]
    header = b"P6\n4 2\n255\n"
    # frame 0 was solid BGR (255,0,0) -> RGB (0,0,255)
    assert out["frames"][0][1][len(header):][:3] == bytes((0, 0, 255))
    assert out["frames"][1][1][len(header):][:3] == bytes((255, 0, 0))


def test_avi_compressed_rejected():
    import struct as _s

    from gomaxscale_spark.operators.multimodal import extract_frames_real

    avi = make_avi(2, 2, [(1, 2, 3)])
    avi = avi.replace(b"00db", b"00dc")
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        extract_frames_real(avi)
    with _pytest.raises(NotImplementedError):
        extract_frames_real(b"not media at all")


def test_sample_frames_mixed_batch(spark):
    from gomaxscale_spark.operators.multimodal import sample_frames

    avi = make_avi(4, 4, [(9, 9, 9)] * 6)
    fake = b"opaque payload " * 40
    df = spark.createDataFrame(
        [(1, bytearray(avi), "video/x-msvideo"), (2, bytearray(fake), "text/plain")],
        "doc_id long, media binary, mime string",
    )
    rows = sample_frames(df, every_n=3, use_real_codec=True).collect()
    real = sorted((r.frame_no, r.frame_w, r.frame_h, r.frame_media is not None)
                  for r in rows if r.doc_id == 1)
    assert real == [(0, 4, 4, True), (3, 4, 4, True)]
    pseudo = [r for r in rows if r.doc_id == 2]
    assert pseudo and all(r.frame_media is None and r.frame_w == 0 for r in pseudo)
    assert [r.frame_no for r in pseudo] == [k * 3 for k in range(len(pseudo))]
