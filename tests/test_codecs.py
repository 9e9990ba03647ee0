"""PNG codec: spec-vector unfiltering (decoder validated independently
of the encoder), roundtrip, malformed-input rejection, and the Spark
decode pipeline over real PNG bytes."""

import struct
import zlib

import pytest

from metastore_spark.codecs import PNG_MAGIC, _chunk, png_decode, png_encode


def _gray_png(width, height, raw_scanlines: bytes, idat_split=None) -> bytes:
    """Hand-assemble a PNG from pre-filtered scanline bytes — bypasses
    our encoder entirely so decoder bugs can't cancel encoder bugs."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    comp = zlib.compress(raw_scanlines)
    if idat_split:
        idats = _chunk(b"IDAT", comp[:idat_split]) + _chunk(
            b"IDAT", comp[idat_split:]
        )
    else:
        idats = _chunk(b"IDAT", comp)
    return PNG_MAGIC + _chunk(b"IHDR", ihdr) + idats + _chunk(b"IEND", b"")


# Hand-computed PNG-spec filter vectors (stride 2, greyscale):
# each case is (filtered scanline stream, expected unfiltered pixels).
SPEC_VECTORS = [
    # Up then Sub: row0 Up over zero-prev passes through; row1 Sub
    # wraps 250+9 mod 256 = 3
    (bytes([2, 5, 7, 1, 9, 250]), bytes([5, 7, 9, 3])),
    # Paeth both rows: predictors resolve to a, b, b per the
    # tie-breaking rules (pa<=pb<=pc order)
    (bytes([4, 10, 20, 4, 7, 200]), bytes([10, 30, 17, 230])),
    # Average both rows: floor((a+b)/2) per spec
    (bytes([3, 8, 10, 3, 6, 100]), bytes([8, 14, 10, 112])),
]


@pytest.mark.parametrize("raw,expected", SPEC_VECTORS)
def test_unfilter_spec_vectors(raw, expected):
    w, h, c, px = png_decode(_gray_png(2, 2, raw))
    assert (w, h, c) == (2, 2, 1)
    assert px == expected


def test_idat_split_across_chunks():
    raw = bytes([2, 5, 7, 1, 9, 250])
    data = _gray_png(2, 2, raw, idat_split=3)
    assert png_decode(data)[3] == bytes([5, 7, 9, 3])


@pytest.mark.parametrize(
    "w,h,ch", [(1, 1, 1), (5, 7, 1), (32, 24, 1), (17, 3, 3), (64, 64, 3)]
)
def test_roundtrip(w, h, ch):
    import hashlib

    # deterministic pseudo-random pixels
    n = w * h * ch
    seed = hashlib.sha256(f"{w}x{h}x{ch}".encode()).digest()
    px = (seed * (n // 32 + 1))[:n]
    dec = png_decode(png_encode(w, h, px, ch))
    assert dec == (w, h, ch, px)


def test_crc_corruption_rejected():
    data = bytearray(_gray_png(2, 2, bytes([0, 1, 2, 0, 3, 4])))
    data[20] ^= 0xFF  # flip a byte inside IHDR body
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(data))


def test_interlaced_rejected():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)  # Adam7 flag
    data = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(6)))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlaced"):
        png_decode(data)


def test_not_a_png_rejected():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF not a png")


def test_spark_pipeline_decodes_real_pngs(spark):
    """End-to-end: real PNG bytes through the Arrow mapInPandas decode
    kernel — dims from IHDR, mean over inflate+unfiltered pixels."""
    from metastore_spark import multimodal as mm

    ids = [1, 2, 3, 9, 40]
    rows = [
        {
            "media_id": i,
            "content": mm.synth_png_bytes(i, 16 + i % 32, 16 + (i * 7) % 32),
        }
        for i in ids
    ]
    df = spark.createDataFrame(rows, "media_id bigint, content binary")
    feats = {r["media_id"]: r for r in mm.decode_image_features(df).collect()}
    for i in ids:
        w, h = 16 + i % 32, 16 + (i * 7) % 32
        px = mm.synth_pixels(i, w * h)
        assert feats[i]["width"] == w and feats[i]["height"] == h
        assert feats[i]["mean_intensity"] == pytest.approx(
            sum(px) / len(px), abs=1e-12
        )
        # n_bytes is the ENCODED length — PNG, not raw payload
        assert feats[i]["n_bytes"] == len(rows[ids.index(i)]["content"])


def test_roundtrip_property():
    """Hypothesis: any pixel buffer survives encode→decode for both
    colour types and arbitrary small dims."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        ch=st.sampled_from([1, 3]),
        data=st.binary(min_size=0, max_size=64),
    )
    def prop(w, h, ch, data):
        n = w * h * ch
        px = (data * (n // max(len(data), 1) + 1))[:n] if data else bytes(n)
        assert png_decode(png_encode(w, h, px, ch)) == (w, h, ch, px)

    prop()


def test_resize_media_real_nearest_neighbor(spark):
    """resize_media: decode real PNGs, nearest-neighbor to 8x6,
    re-encode — output pixels must equal the numpy reference gather."""
    import numpy as np

    from metastore_spark import multimodal as mm
    from metastore_spark.codecs import png_decode

    ids = [3, 11]
    rows = [
        {"media_id": i, "content": mm.synth_png_bytes(i, 20, 14)}
        for i in ids
    ]
    df = spark.createDataFrame(rows, "media_id bigint, content binary")
    out = {
        r["media_id"]: r for r in mm.resize_media(df, 8, 6).collect()
    }
    for i in ids:
        r = out[i]
        assert (r["width"], r["height"]) == (8, 6)
        w, h, ch, px = png_decode(bytes(r["content"]))
        assert (w, h, ch) == (8, 6, 1)
        src = np.frombuffer(
            mm.synth_pixels(i, 20 * 14), dtype="uint8"
        ).reshape(14, 20)
        yi = np.minimum((np.arange(6) * 14) // 6, 13)
        xi = np.minimum((np.arange(8) * 20) // 8, 19)
        ref = src[yi][:, xi]
        assert np.frombuffer(px, dtype="uint8").reshape(6, 8).tolist() == ref.tolist()


def test_resize_media_synthetic_format(spark):
    """The synthetic format flows through the same real resize kernel
    (its payload is its pixel buffer)."""
    from metastore_spark import multimodal as mm
    from metastore_spark.codecs import png_decode

    df = spark.createDataFrame(
        [{"media_id": 5, "content": mm.synth_image_bytes(5, 16, 16)}],
        "media_id bigint, content binary",
    )
    r = mm.resize_media(df, 4, 4).first()
    w, h, ch, px = png_decode(bytes(r["content"]))
    assert (w, h, ch) == (4, 4, 1) and len(px) == 16


# --------------------------------------------------------------------------
# JPEG (baseline T.81) — see metastore_spark/codecs.py


def test_jpeg_flat_blocks_roundtrip_exactly():
    """Flat 8x8 tiles under a unit quant table are the lossless subset
    of a lossy codec: lone integral DC, zero AC — the property the
    multimodal value-hash oracle rests on."""
    import random

    from metastore_spark.codecs import jpeg_decode, jpeg_encode

    rng = random.Random(7)
    w, h = 40, 24
    vals = [rng.randrange(256) for _ in range((h // 8) * (w // 8))]
    px = bytes(
        vals[(r // 8) * (w // 8) + (c // 8)]
        for r in range(h)
        for c in range(w)
    )
    enc = jpeg_encode(w, h, px, 1, quant=[1] * 64)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    ww, hh, ch, out = jpeg_decode(enc)
    assert (ww, hh, ch) == (w, h, 1)
    assert out == px


@pytest.mark.parametrize("w,h,ch", [(16, 16, 1), (24, 16, 3), (23, 17, 1)])
def test_jpeg_entropy_roundtrip_within_dct_envelope(w, h, ch):
    """Full-entropy content exercises every AC path (run lengths, ZRL,
    EOB, all bit categories); with quant=1 the only loss is FDCT/IDCT
    float rounding — max per-sample error a few LSBs (grayscale) plus
    the color-transform roundtrip (RGB)."""
    import random

    from metastore_spark.codecs import jpeg_decode, jpeg_encode

    rng = random.Random(w * 1000 + h * 10 + ch)
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    enc = jpeg_encode(w, h, px, ch, quant=[1] * 64)
    ww, hh, cc, out = jpeg_decode(enc)
    assert (ww, hh, cc) == (w, h, ch)
    err = max(abs(a - b) for a, b in zip(px, out))
    assert err <= (4 if ch == 3 else 2), f"max sample error {err}"


def test_jpeg_standard_quant_table_psnr():
    """Default (Annex K quality-50) tables on smooth content: lossy but
    recognizable — mean absolute error well under 10/255 on a smooth
    gradient. Pins that quantization/dequantization are inverses."""
    from metastore_spark.codecs import jpeg_decode, jpeg_encode

    w, h = 32, 32
    px = bytes(((r * 5 + c * 3) // 2) % 256 for r in range(h) for c in range(w))
    enc = jpeg_encode(w, h, px, 1)  # standard tables
    ww, hh, _, out = jpeg_decode(enc)
    assert (ww, hh) == (w, h)
    mae = sum(abs(a - b) for a, b in zip(px, out)) / len(px)
    assert mae < 10.0, f"MAE {mae}"


def test_jpeg_decodes_real_in_repo_file():
    """A real-world camera JPEG committed as a fixture (Apache Spark's
    mllib test image, Apache-2.0): 4:2:0 subsampled, multi-DHT,
    produced by a real encoder — none of our encoder's choices."""
    import os

    import numpy as np

    from metastore_spark.codecs import jpeg_decode

    path = os.path.join(os.path.dirname(__file__), "data", "chr30.4.184.jpg")
    w, h, ch, px = jpeg_decode(open(path, "rb").read())
    assert (w, h, ch) == (300, 215, 3)
    mean = float(np.frombuffer(px, dtype=np.uint8).mean())
    # JVM ImageIO decodes this file to mean 138.95 (test below checks
    # live); decoder variance allowance is the JPEG spec's own
    assert abs(mean - 138.95) < 1.0


def test_jpeg_matches_jvm_imageio_on_real_corpus(spark):
    """Independent-decoder cross-check: every baseline JPEG in Spark's
    bundled image test data must decode to identical dimensions and a
    mean within 0.5/255 of the JVM ImageIO decoder (spark.read.format
    ('image'))."""
    import glob
    import os

    import numpy as np

    from metastore_spark.codecs import jpeg_decode

    root = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin"
    files = sorted(glob.glob(f"{root}/**/*.jpg", recursive=True))
    if not files:
        pytest.skip("Spark image test data not present")
    ref = {}
    df = spark.read.format("image").load([f"file://{f}" for f in files])
    for r in df.select("image.*").collect():
        name = os.path.basename(r["origin"])
        arr = np.frombuffer(bytes(r["data"]), dtype=np.uint8)
        ref[name] = (r["width"], r["height"], r["nChannels"], float(arr.mean()))
    checked = 0
    for f in files:
        name = os.path.basename(f)
        data = open(f, "rb").read()
        try:
            w, h, ch, px = jpeg_decode(data)
        except ValueError:
            continue  # progressive etc. — deliberately unsupported
        rw, rh, rch, rmean = ref[name]
        assert (w, h) == (rw, rh), name
        mean = float(np.frombuffer(px, dtype=np.uint8).mean())
        assert abs(mean - rmean) < 0.5, (name, mean, rmean)
        checked += 1
    assert checked >= 4  # the corpus ships >=4 baseline JPEGs


def test_jpeg_progressive_rejected():
    from metastore_spark.codecs import jpeg_decode

    path = (
        "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
        "multi-channel/grayscale.jpg"
    )
    import os

    if not os.path.exists(path):
        pytest.skip("progressive sample not present")
    with pytest.raises(ValueError, match="SOF2"):
        jpeg_decode(open(path, "rb").read())


def test_jpeg_garbage_rejected():
    from metastore_spark.codecs import jpeg_decode

    with pytest.raises(ValueError):
        jpeg_decode(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        jpeg_decode(b"\xff\xd8" + b"\x00" * 10)  # SOI then junk


# --- WAV (RIFF/PCM) ---------------------------------------------------------


def test_wav_roundtrip_16bit_mono():
    from metastore_spark.codecs import wav_decode, wav_encode

    s = [0, 1, -1, 32767, -32768, 1234, -999, 7]
    rate, ch, sw, out = wav_decode(wav_encode(s, 44100, 1, 2))
    assert (rate, ch, sw) == (44100, 1, 2)
    assert out == s


def test_wav_roundtrip_8bit_stereo_and_pad_byte():
    from metastore_spark.codecs import wav_decode, wav_encode

    s = [-128, 127, 0, 64, 5, -5]  # 3 frames x 2 channels
    rate, ch, sw, out = wav_decode(wav_encode(s, 8000, 2, 1))
    assert (rate, ch, sw, out) == (8000, 2, 1, s)
    # odd data length (3 samples, 8-bit mono) forces the RIFF pad byte
    b = wav_encode([1, 2, 3], 8000, 1, 1)
    assert len(b) % 2 == 0
    assert wav_decode(b)[3] == [1, 2, 3]


def test_wav_skips_unknown_chunks():
    import struct

    from metastore_spark.codecs import wav_decode, wav_encode

    b = bytearray(wav_encode([10, -10, 20], 16000, 1, 2))
    # inject a LIST chunk (with pad byte: 5-byte body) between WAVE
    # and fmt — decoders must walk past it
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    b[12:12] = extra
    struct.pack_into("<I", b, 4, len(b) - 8)  # fix RIFF length
    assert wav_decode(bytes(b))[3] == [10, -10, 20]


def test_wav_malformed_rejected():
    import struct

    import pytest

    from metastore_spark.codecs import wav_decode, wav_encode

    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"RIFX" + b"\x00" * 20)
    with pytest.raises(ValueError, match="WAVE"):
        wav_decode(b"RIFF" + struct.pack("<I", 4) + b"AVI ")
    good = wav_encode([1, 2], 8000, 1, 2)
    # truncate inside the data chunk -> chunk overrun
    with pytest.raises(ValueError, match="overruns"):
        wav_decode(good[:-3] + b"")
    # non-PCM format tag
    b = bytearray(good)
    struct.pack_into("<H", b, 20, 3)  # fmt chunk body starts at 20
    with pytest.raises(ValueError, match="format tag"):
        wav_decode(bytes(b))
    # data not a multiple of the frame size (RIFF length = 45-8 = 37)
    with pytest.raises(ValueError, match="frame size"):
        wav_decode(
            b"RIFF" + struct.pack("<I", 37) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", 1) + b"\x00"
        )


def test_wav_encode_validates():
    import pytest

    from metastore_spark.codecs import wav_encode

    with pytest.raises(ValueError, match="sampwidth"):
        wav_encode([0], 8000, 1, 3)
    with pytest.raises(ValueError, match="out of range"):
        wav_encode([300], 8000, 1, 1)
    with pytest.raises(ValueError, match="multiple"):
        wav_encode([1, 2, 3], 8000, 2, 2)


# --- Y4M (YUV4MPEG2) --------------------------------------------------------


def test_y4m_roundtrip_and_param_tolerance():
    from metastore_spark.codecs import y4m_decode, y4m_encode

    fr = [bytes(range(12)), bytes(range(100, 112)), bytes(12)]
    w, h, fn, fd, out = y4m_decode(y4m_encode(4, 3, fr, 30, 1))
    assert (w, h, fn, fd, out) == (4, 3, 30, 1, fr)
    # frame-level parameters after FRAME are tolerated per the spec
    b = b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 Cmono Xcustom\nFRAME Ix\n" + bytes(4)
    assert y4m_decode(b)[4] == [bytes(4)]


def test_y4m_malformed_rejected():
    import pytest

    from metastore_spark.codecs import y4m_decode, y4m_encode

    with pytest.raises(ValueError, match="YUV4MPEG2"):
        y4m_decode(b"JUNKSTREAM W2 H2\nFRAME\n")
    with pytest.raises(ValueError, match="W/H"):
        y4m_decode(b"YUV4MPEG2 F25:1 Cmono\n")
    with pytest.raises(ValueError, match="colour"):
        y4m_decode(b"YUV4MPEG2 W2 H2 C420jpeg\nFRAME\n" + bytes(6))
    good = y4m_encode(2, 2, [bytes(4)])
    with pytest.raises(ValueError, match="truncated"):
        y4m_decode(good[:-1])
    with pytest.raises(ValueError, match="FRAME marker"):
        y4m_decode(good + b"JUNK")
    with pytest.raises(ValueError, match="bytes"):
        y4m_encode(2, 2, [bytes(5)])  # plane size mismatch
