"""Real multimodal decoders (pipeline/multimodal.py): pure-numpy BMP
and PCM-WAV parsing, routed through the Arrow decode stage.

Golden payloads are built by hand here byte-for-byte (struct.pack), so
a decode result can be checked against arithmetic on the pixel/sample
values we wrote — no codec library on either side.
"""

from __future__ import annotations

import math
import struct

import pytest

from ocsf_validator_spark.pipeline import multimodal


# ---------------------------------------------------------------------------
# golden encoders (test-side only)
# ---------------------------------------------------------------------------

def bmp_bytes(rows, bpp=24, topdown=False):
    """Uncompressed BITMAPINFOHEADER BMP. ``rows`` is a list of pixel
    rows, each pixel a (B, G, R[, A]) tuple — the format's own order,
    bottom row first unless topdown."""
    height, width = len(rows), len(rows[0])
    channels = bpp // 8
    stride = (width * channels + 3) & ~3
    body = b""
    stored = rows if not topdown else rows  # row content; order via height sign
    for r in stored:
        line = b"".join(bytes(px) for px in r)
        body += line + b"\x00" * (stride - len(line))
    pixel_off = 14 + 40
    file_size = pixel_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, -height if topdown else height,
        1, bpp, 0, len(body), 2835, 2835, 0, 0,
    )
    return header + dib + body


def wav_bytes(frames, rate=8000, bits=16, prepend_junk_chunk=False):
    """PCM RIFF/WAVE. ``frames`` is a list of per-frame tuples (one
    value per channel): ints in [-32768, 32767] for 16-bit, [0, 255]
    for 8-bit."""
    n_ch = len(frames[0])
    width = bits // 8
    if bits == 16:
        data = b"".join(struct.pack(f"<{n_ch}h", *f) for f in frames)
    else:
        data = b"".join(bytes(f) for f in frames)
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * width,
                      n_ch * width, bits)
    chunks = b""
    if prepend_junk_chunk:
        chunks += b"JUNK" + struct.pack("<I", 3) + b"xyz\x00"  # odd, padded
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ---------------------------------------------------------------------------
# decoder unit goldens (driver-side, no Spark)
# ---------------------------------------------------------------------------

def test_bmp_golden_2x2_means():
    rows = [
        [(0, 0, 255), (0, 255, 0)],      # bottom row: red, green (BGR)
        [(255, 0, 0), (255, 255, 255)],  # top row: blue, white
    ]
    d = multimodal.decode_bmp(bmp_bytes(rows))
    assert (d["width"], d["height"], d["channels"]) == (2, 2, 3)
    assert d["n_samples"] == 4
    # channel means over the 4 pixels, BGR order, /255
    want = [
        (0 + 0 + 255 + 255) / 4 / 255.0,
        (0 + 255 + 0 + 255) / 4 / 255.0,
        (255 + 0 + 0 + 255) / 4 / 255.0,
    ]
    assert d["feature"] == pytest.approx(want)


def test_bmp_row_padding_and_topdown_ignored_by_means():
    # width 3 → 9-byte rows padded to 12; padding must not leak into means
    rows = [[(10, 20, 30)] * 3, [(50, 60, 70)] * 3]
    d = multimodal.decode_bmp(bmp_bytes(rows))
    assert d["width"] == 3 and d["height"] == 2
    assert d["feature"] == pytest.approx(
        [30 / 255.0, 40 / 255.0, 50 / 255.0]
    )
    # top-down storage (negative height) decodes to the same summary
    t = multimodal.decode_bmp(bmp_bytes(rows, topdown=True))
    assert (t["width"], t["height"]) == (3, 2)
    assert t["feature"] == pytest.approx(d["feature"])


def test_bmp_32bit_alpha_channel():
    rows = [[(0, 0, 0, 255), (255, 255, 255, 255)]]
    d = multimodal.decode_bmp(bmp_bytes(rows, bpp=32))
    assert d["channels"] == 4
    assert d["feature"] == pytest.approx([0.5, 0.5, 0.5, 1.0])


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"BM" + b"\x00" * 10,                      # truncated header
        b"PNG not a bmp at all, padded out to fifty-four bytes!!!",
        bmp_bytes([[(1, 2, 3)]])[:-1],             # truncated pixel block
    ],
)
def test_bmp_rejects_non_bmp(payload):
    with pytest.raises(ValueError):
        multimodal.decode_bmp(payload)


def test_wav_golden_stereo_rms():
    # L channel constant 16384 (≈0.5), R channel ±8192 (≈0.25)
    frames = [(16384, 8192), (16384, -8192), (16384, 8192), (16384, -8192)]
    d = multimodal.decode_wav(wav_bytes(frames, rate=44100))
    assert (d["channels"], d["sample_rate"], d["n_samples"]) == (2, 44100, 4)
    assert d["feature"] == pytest.approx([16384 / 32768, 8192 / 32768])


def test_wav_8bit_and_chunk_walk():
    # 8-bit unsigned, midpoint 128: values 128±64 → RMS 0.5; a JUNK
    # chunk (odd size, word-aligned) precedes fmt/data
    frames = [(192,), (64,), (192,), (64,)]
    d = multimodal.decode_wav(
        wav_bytes(frames, rate=8000, bits=8, prepend_junk_chunk=True)
    )
    assert (d["channels"], d["sample_rate"], d["n_samples"]) == (1, 8000, 4)
    assert d["feature"] == pytest.approx([0.5])


def test_wav_rejects_non_pcm():
    raw = wav_bytes([(1, 1)], rate=8000)
    non_pcm = raw.replace(b"fmt " + struct.pack("<I", 16) + struct.pack("<H", 1),
                          b"fmt " + struct.pack("<I", 16) + struct.pack("<H", 3))
    with pytest.raises(ValueError):
        multimodal.decode_wav(non_pcm)
    with pytest.raises(ValueError):
        multimodal.decode_wav(b"RIFFxxxxWAVE")  # no chunks


# ---------------------------------------------------------------------------
# routed Arrow stage (Spark)
# ---------------------------------------------------------------------------

def test_decode_media_routes_and_degrades(spark):
    bmp = bmp_bytes([[(0, 0, 255), (0, 255, 0)], [(255, 0, 0), (0, 0, 0)]])
    wav = wav_bytes([(16384, 8192), (-16384, -8192)], rate=16000)
    rows = [
        (1, "image/bmp", bytearray(bmp)),
        (2, "audio/wav", bytearray(wav)),
        (3, "image/bmp", bytearray(b"corrupt-not-a-bmp-padded-to-length....")),
        (4, "video/mp4", bytearray(b"\x00\x01\x02\x03" * 8)),
    ]
    media = spark.createDataFrame(
        rows, "id long, media_type string, payload binary"
    )
    got = {r["id"]: r for r in multimodal.decode_media(media).collect()}
    assert len(got) == 4

    img = got[1]
    assert img["decoded"] and (img["width"], img["height"]) == (2, 2)
    assert img["channels"] == 3 and img["sample_rate"] is None

    aud = got[2]
    assert aud["decoded"] and aud["sample_rate"] == 16000
    assert aud["n_samples"] == 2 and aud["channels"] == 2
    assert aud["feature"] == pytest.approx([16384 / 32768, 8192 / 32768])

    # declared BMP that fails to parse: visible, not fatal, fallback
    # feature is the deterministic byte-fold of the payload
    bad = got[3]
    assert bad["decoded"] is False and bad["width"] is None
    assert bad["feature"] == pytest.approx(
        multimodal._fake_feature(bytes(rows[2][2]), 8)
    )

    # undeclared format: routed straight to the fallback
    vid = got[4]
    assert vid["decoded"] is False
    assert vid["feature"] == pytest.approx(
        multimodal._fake_feature(bytes(rows[3][2]), 8)
    )
