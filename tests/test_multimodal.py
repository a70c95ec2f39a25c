"""Multimodal plumbing: binary columns + Arrow-batched decode with an
injected deterministic fake codec (real codecs are stubbed)."""

from __future__ import annotations

import pytest

from de_realtime_voting_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    decode_media,
    to_media_frame,
)
from de_realtime_voting_spark.sources import load_table


def _make_fake_decode():
    # nested so cloudpickle ships it by value to executors (a
    # module-level function in tests/ is not importable worker-side)
    def fake_decode(payload: bytes) -> list[float]:
        n = max(len(payload), 1)
        return [
            len(payload) / 1000.0,
            sum(payload) / (255.0 * n),
            payload[0] / 255.0 if payload else 0.0,
        ]

    return fake_decode


def test_to_media_frame_schema(spark, sf_dir):
    media = to_media_frame(load_table(spark, sf_dir, "documents"))
    assert [f.name for f in media.schema.fields] == [
        "doc_id",
        "media_type",
        "payload",
        "byte_len",
    ]
    row = media.where("doc_id = 1").first()
    assert row["byte_len"] == len(row["payload"])
    assert row["media_type"] == "text/plain"


def test_decode_media_with_fake_codec(spark, sf_dir):
    fake = _make_fake_decode()
    docs = load_table(spark, sf_dir, "documents").limit(50)
    feats = decode_media(to_media_frame(docs), decode_fn=fake)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 50
    assert all(r["feature_dim"] == 3 for r in rows)
    # determinism: run twice, same feature norms
    again = {r["doc_id"]: r["feature_norm"] for r in decode_media(
        to_media_frame(docs), decode_fn=fake).collect()}
    assert {r["doc_id"]: r["feature_norm"] for r in rows} == again


def test_decode_media_stub_raises(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    stub = decode_media(to_media_frame(docs))  # no codec injected
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        stub.collect()


def test_sample_frames_with_fake_codec(spark, sf_dir):
    from de_realtime_voting_spark.constants import MEDIA_CHUNK_BYTES
    from de_realtime_voting_spark.operators.multimodal import sample_frames

    def fake_keyframe(chunk: bytes) -> bytes:
        return chunk[: max(len(chunk) // 2, 1)]  # "decode" = downsample

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = to_media_frame(docs)
    frames = sample_frames(media, decode_fn=fake_keyframe).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    lens = {r["doc_id"]: r["byte_len"] for r in media.collect()}
    assert set(by_doc) == set(lens)
    for doc_id, doc_frames in by_doc.items():
        expect_n = -(-lens[doc_id] // MEDIA_CHUNK_BYTES)  # ceil-div
        assert sorted(r["frame_idx"] for r in doc_frames) == list(range(expect_n))
        # every full stride decodes to half the chunk width
        full = [r for r in doc_frames if r["frame_idx"] < expect_n - 1]
        assert all(r["frame_bytes"] == MEDIA_CHUNK_BYTES // 2 for r in full)


def test_sample_frames_stub_raises(spark, sf_dir):
    from de_realtime_voting_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents").limit(3)
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        sample_frames(to_media_frame(docs)).collect()


def _make_wav(rate: int, samples) -> bytes:
    import struct

    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def test_decode_media_real_wav_pcm(spark):
    """The WAV/PCM decode path is REAL (pure-numpy RIFF parse), not a
    stub: synthesized sine payloads run through the full Spark
    decode_media pipeline and yield exact channel/rate/sample counts
    and the analytic RMS."""
    import numpy as np

    from de_realtime_voting_spark.operators.multimodal import decode_wav_pcm

    rate, n, amp = 8000, 800, 12000
    sine = (np.sin(2 * np.pi * 440 * np.arange(n) / rate) * amp).astype(np.int16)
    silent = np.zeros(200, dtype=np.int16)
    media = spark.createDataFrame(
        [
            (1, "audio/wav", bytearray(_make_wav(rate, sine)), 0),
            (2, "audio/wav", bytearray(_make_wav(16000, silent)), 0),
        ],
        "doc_id long, media_type string, payload binary, byte_len int",
    )
    got = {r["doc_id"]: r for r in decode_media(media, decode_wav_pcm).collect()}
    assert got[1]["feature_dim"] == 5
    # feature_norm is sum of squares of [ch, rate, n, rms, peak]
    assert float(got[1]["feature_norm"]) > 0
    assert got[2]["feature_dim"] == 5


def test_decode_wav_pcm_rejects_non_pcm():
    """Compressed/non-RIFF payloads must fail loudly, not mis-decode."""
    from de_realtime_voting_spark.operators.multimodal import decode_wav_pcm

    with pytest.raises(ValueError):
        decode_wav_pcm(b"\xff\xd8\xff\xe0 not a wav")


def _make_bmp(pixels):
    """Minimal 24-bit bottom-up BMP from an H x W x 3 RGB array."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytes(
            int(v) for x in range(w) for v in (arr[y, x, 2], arr[y, x, 1], arr[y, x, 0])
        )
        rows += row + b"\x00" * (stride - len(row))
    pix_off = 14 + 40
    size = pix_off + len(rows)
    file_hdr = b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00" + pix_off.to_bytes(4, "little")
    info_hdr = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(rows).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return file_hdr + info_hdr + rows


def test_decode_bmp_rgb_known_image():
    """A synthesized 3x2 BMP (odd width -> padded rows) must decode to
    exact dimensions and channel means."""
    from de_realtime_voting_spark.operators.multimodal import decode_bmp_rgb

    # 2 rows x 3 cols: red, green, blue / white, black, gray
    img = [
        [[255, 0, 0], [0, 255, 0], [0, 0, 255]],
        [[255, 255, 255], [0, 0, 0], [128, 128, 128]],
    ]
    w, h, mr, mg, mb, sd = decode_bmp_rgb(_make_bmp(img))
    assert (w, h) == (3.0, 2.0)
    assert mr == (255 + 0 + 0 + 255 + 0 + 128) / 6
    assert mg == (0 + 255 + 0 + 255 + 0 + 128) / 6
    assert mb == (0 + 0 + 255 + 255 + 0 + 128) / 6
    assert sd > 0


def test_decode_bmp_through_decode_media(spark):
    """BMP payloads run through the full Spark decode_media pipeline."""
    import numpy as np

    from de_realtime_voting_spark.operators.multimodal import (
        decode_bmp_rgb,
        decode_media,
    )

    img1 = np.full((4, 5, 3), 200, dtype=np.uint8)
    img2 = np.zeros((2, 2, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (1, "image/bmp", bytearray(_make_bmp(img1)), 0),
            (2, "image/bmp", bytearray(_make_bmp(img2)), 0),
        ],
        "doc_id long, media_type string, payload binary, byte_len int",
    )
    got = {r["doc_id"]: r for r in decode_media(media, decode_bmp_rgb).collect()}
    assert got[1]["feature_dim"] == 6 and got[2]["feature_dim"] == 6
    assert float(got[1]["feature_norm"]) > 0


def test_decode_bmp_rejects_compressed():
    """Compressed/palette/non-BMP payloads must fail loudly."""
    from de_realtime_voting_spark.operators.multimodal import decode_bmp_rgb

    with pytest.raises(ValueError):
        decode_bmp_rgb(b"\x89PNG not a bmp")
    # RLE-compressed BMP header (compression=1)
    bad = bytearray(_make_bmp([[[0, 0, 0]]]))
    bad[30] = 1
    with pytest.raises(ValueError):
        decode_bmp_rgb(bytes(bad))


def _make_png(pixels, filters=None, color_type=2):
    """Minimal non-interlaced 8-bit PNG from an H x W x ch array,
    filtering each row with the given filter type (exercises the
    decoder's unfilter paths with encoder-side filtering that is
    exact by construction)."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = arr.shape
    assert ch == (3 if color_type == 2 else 4)
    filters = filters if filters is not None else [0] * h
    raw = bytearray()
    prior = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = arr[y].reshape(-1).astype(np.int64)
        f = filters[y]
        if f == 0:
            enc = cur
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]])
            enc = (cur - left) % 256
        elif f == 2:  # Up
            enc = (cur - prior) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]])
            enc = (cur - ((left + prior) >> 1)) % 256
        elif f == 4:  # Paeth
            left = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]])
            ul = np.concatenate([np.zeros(ch, dtype=np.int64), prior[:-ch]])
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
            )
            enc = (cur - pred) % 256
        raw.append(f)
        raw.extend(int(v) for v in enc)
        prior = cur

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_rgb_known_image_all_filters():
    """A synthesized RGB PNG must decode to exact dimensions and
    channel means under every scanline filter type (None, Sub, Up,
    Average, Paeth) -- same image, five encodings, one answer."""
    import numpy as np

    from de_realtime_voting_spark.operators.multimodal import decode_png_rgb

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    want_r = float(np.mean(img[:, :, 0].astype(np.float64)))
    want_g = float(np.mean(img[:, :, 1].astype(np.float64)))
    want_b = float(np.mean(img[:, :, 2].astype(np.float64)))
    for f in range(5):
        w, h, mr, mg, mb, sd = decode_png_rgb(_make_png(img, filters=[f] * 5))
        assert (w, h) == (4.0, 5.0), f"filter {f}"
        assert mr == want_r and mg == want_g and mb == want_b, f"filter {f}"
        assert sd > 0
    # mixed filters in one image
    w, h, mr, mg, mb, sd = decode_png_rgb(_make_png(img, filters=[0, 1, 2, 3, 4]))
    assert (mr, mg, mb) == (want_r, want_g, want_b)


def test_decode_png_rgba_drops_alpha():
    import numpy as np

    from de_realtime_voting_spark.operators.multimodal import decode_png_rgb

    img = np.zeros((2, 2, 4), dtype=np.uint8)
    img[:, :, 0] = 10  # r
    img[:, :, 1] = 20  # g
    img[:, :, 2] = 30  # b
    img[:, :, 3] = 255  # alpha (must not contaminate the means)
    w, h, mr, mg, mb, sd = decode_png_rgb(
        _make_png(img, filters=[4, 4], color_type=6)
    )
    assert (w, h, mr, mg, mb) == (2.0, 2.0, 10.0, 20.0, 30.0)


def test_decode_png_rejects_unsupported():
    from de_realtime_voting_spark.operators.multimodal import decode_png_rgb

    with pytest.raises(ValueError):
        decode_png_rgb(b"BM not a png")
    # palette PNG (color type 3) must refuse, not mis-decode
    import struct
    import zlib

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    pal = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png_rgb(pal)


def test_decode_auto_dispatches_by_magic(spark):
    """The decode table routes mixed-media payloads to the right real
    decoder and raises BY NAME for stubbed codecs."""
    import numpy as np

    from de_realtime_voting_spark.operators.multimodal import (
        decode_auto,
        decode_media,
    )

    img = np.full((2, 3, 3), 50, dtype=np.uint8)
    png = _make_png(img, filters=[1, 2])
    bmp = _make_bmp(img.tolist())
    wav = _make_wav(8000, np.zeros(16, dtype=np.int16))
    assert decode_auto(png)[:2] == [3.0, 2.0]
    assert decode_auto(bmp)[:2] == [3.0, 2.0]
    assert decode_auto(wav)[0] == 1.0  # n_channels
    # mp3 header metadata is REAL now: an ID3 tag with no sync frame
    # behind it fails loudly instead of raising NotImplementedError
    with pytest.raises(ValueError):
        decode_auto(b"ID3\x04\x00 mp3 header")
    with pytest.raises(ValueError):  # jpeg is real now: garbage fails loudly
        decode_auto(b"\xff\xd8\xff\xe0 jpeg header")
    with pytest.raises(ValueError):
        decode_auto(b"no such magic")

    # end-to-end through the Spark pipeline with a MIXED media table
    media = spark.createDataFrame(
        [
            (1, "image/png", bytearray(png), 0),
            (2, "image/bmp", bytearray(bmp), 0),
            (3, "audio/wav", bytearray(wav), 0),
        ],
        "doc_id long, media_type string, payload binary, byte_len int",
    )
    got = {r["doc_id"]: r for r in decode_media(media, decode_auto).collect()}
    assert got[1]["feature_dim"] == 6
    assert got[2]["feature_dim"] == 6
    assert got[3]["feature_dim"] == 5


def _pack_lzw(codes_widths):
    """LSB-first GIF bit packing of (code, width) pairs -> sub-blocked
    image data bytes."""
    buf = bits = 0
    out = bytearray()
    for code, width in codes_widths:
        buf |= code << bits
        bits += width
        while bits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            bits -= 8
    if bits:
        out.append(buf & 0xFF)
    blocks = bytearray()
    for i in range(0, len(out), 255):
        piece = out[i : i + 255]
        blocks.append(len(piece))
        blocks += piece
    blocks.append(0)
    return bytes(blocks)


def _make_gif(pixels, palette, w, h, min_code=2):
    """Hand-built GIF89a using the 'uncompressed' LZW trick: CLEAR
    before every root code keeps the dictionary fixed-width."""
    import struct

    n = len(palette)
    assert n == 4  # 2-bit color table for these tests
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    codes = []
    for p in pixels:
        codes.append((clear, width))
        codes.append((p, width))
    codes.append((end, width))
    gct = b"".join(bytes(c) for c in palette)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | 0x01, 0, 0)  # GCT, 4 entries
        + gct
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code])
        + _pack_lzw(codes)
        + b"\x3b"
    )


def test_decode_gif_rgb_known_image():
    """A hand-encoded 2x2 GIF (one pixel per palette entry) must
    decode to exact channel means."""
    from de_realtime_voting_spark.operators.multimodal import decode_gif_rgb

    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    payload = _make_gif([0, 1, 2, 3], palette, 2, 2)
    w, h, mr, mg, mb, sd = decode_gif_rgb(payload)
    assert (w, h) == (2.0, 2.0)
    assert (mr, mg, mb) == (255.0 / 4, 255.0 / 4, 255.0 / 4)
    assert sd > 0


def test_decode_gif_lzw_dictionary_growth_and_kwkwk():
    """Real LZW compression path: the code stream [CLEAR, 0, 6, 0]
    exercises the KwKwK case (code == next table slot) and the width
    bump at table size 8 -- decodes to four black pixels."""
    import struct

    from de_realtime_voting_spark.operators.multimodal import decode_gif_rgb

    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    gct = b"".join(bytes(c) for c in palette)
    codes = [(4, 3), (0, 3), (6, 3), (0, 3), (5, 4)]  # END read at 4 bits
    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)
        + gct
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2])
        + _pack_lzw(codes)
        + b"\x3b"
    )
    w, h, mr, mg, mb, sd = decode_gif_rgb(payload)
    assert (w, h, mr, mg, mb, sd) == (2.0, 2.0, 0.0, 0.0, 0.0, 0.0)


def test_decode_gif_skips_extensions_and_rejects_interlace():
    import struct

    from de_realtime_voting_spark.operators.multimodal import decode_gif_rgb

    palette = [(9, 9, 9), (255, 255, 255), (0, 0, 0), (1, 2, 3)]
    base = _make_gif([1, 1, 1, 1], palette, 2, 2)
    # splice a graphics-control extension between header+GCT and the
    # image descriptor (0x21 0xf9, one 4-byte sub-block, terminator)
    head, img = base[: 13 + 12], base[13 + 12 :]
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    w, h, mr, mg, mb, sd = decode_gif_rgb(head + ext + img)
    assert (w, h, mr, mg, mb) == (2.0, 2.0, 255.0, 255.0, 255.0)

    interlaced = bytearray(base)
    # image descriptor flags byte: offset 13+12 (header+GCT) + 9
    interlaced[13 + 12 + 9] |= 0x40
    with pytest.raises(ValueError):
        decode_gif_rgb(bytes(interlaced))


def test_decode_auto_handles_gif():
    from de_realtime_voting_spark.operators.multimodal import decode_auto

    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    out = decode_auto(_make_gif([2, 2, 2, 2], palette, 2, 2))
    assert out[2:5] == [0.0, 255.0, 0.0]


def _lzw_encode(seq, min_code):
    """Reference GIF-LZW encoder.  Width-bump rule: the decoder's
    append for the encoder's k-th dictionary add happens one code
    LATER (while reading code k+1), so the encoder widens when
    next_code - 1 reaches 2^width -- one add after the decoder's
    table hits the boundary.  Getting this off by one emits codes the
    decoder reads at the wrong width (the classic GIF LZW bug)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table = {(i,): i for i in range(clear)}
    next_code = clear + 2
    codes = [(clear, width)]
    w = ()

    def bumped(width, next_code):
        return width + 1 if next_code - 1 == (1 << width) and width < 12 else width

    for s in seq:
        wk = w + (s,)
        if wk in table:
            w = wk
            continue
        codes.append((table[w], width))
        table[wk] = next_code
        next_code += 1
        width = bumped(width, next_code)
        w = (s,)
    if w:
        codes.append((table[w], width))
        next_code += 1  # the decoder appends after this code too
        width = bumped(width, next_code)
    codes.append((end, width))
    buf = bits = 0
    out = bytearray()
    for code, cw in codes:
        buf |= code << bits
        bits += cw
        while bits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            bits -= 8
    if bits:
        out.append(buf & 0xFF)
    return bytes(out)


def test_lzw_roundtrip_hypothesis():
    """Property: encode(seq) then decode == seq for arbitrary 2-bit
    pixel streams -- exercises dictionary growth, width bumps, and
    run-heavy inputs far beyond the handcrafted cases."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from de_realtime_voting_spark.operators.multimodal import _lzw_decode

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=300))
    def check(seq):
        data = _lzw_encode(seq, 2)
        assert _lzw_decode(data, 2, len(seq)) == seq

    check()


def test_lzw_roundtrip_long_runs():
    """Deterministic stress: kilopixel runs and periodic patterns push
    the dictionary through several width bumps."""
    from de_realtime_voting_spark.operators.multimodal import _lzw_decode

    for seq in (
        [0] * 2000,
        [0, 1, 2, 3] * 500,
        [0, 0, 1, 1, 2, 2, 3, 3] * 250,
        list(range(4)) * 3 + [0] * 100 + [3, 2, 1, 0] * 50,
    ):
        assert _lzw_decode(_lzw_encode(seq, 2), 2, len(seq)) == seq


# --- baseline JPEG: from-scratch encoder -> decode_jpeg_rgb roundtrip ----


class _JBitWriter:
    """MSB-first bit writer with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, nbits):
        for i in reversed(range(nbits)):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def byte_align(self):
        while self.n:
            self.write(1, 1)


def _j_put_sym(bw, s):
    # encoder Huffman table: symbol s<255 -> code s at 9 bits;
    # symbol 255 -> code 510 at 10 bits (canonical continuation)
    if s < 255:
        bw.write(s, 9)
    else:
        bw.write(510, 10)


def _j_category(v):
    return abs(v).bit_length()


def _j_write_val(bw, v, s):
    bw.write(v if v >= 0 else v + (1 << s) - 1, s)


def _j_encode_block(bw, coefs_zz, pred):
    """coefs_zz: 64 ints in zigzag order; returns new DC predictor."""
    diff = coefs_zz[0] - pred
    s = _j_category(diff)
    _j_put_sym(bw, s)
    _j_write_val(bw, diff, s)
    run = 0
    for k in range(1, 64):
        v = coefs_zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            _j_put_sym(bw, 0xF0)  # ZRL
            run -= 16
        s = _j_category(v)
        _j_put_sym(bw, (run << 4) | s)
        _j_write_val(bw, v, s)
        run = 0
    if run:
        _j_put_sym(bw, 0x00)  # EOB
    return coefs_zz[0]


def _j_fdct_quant_zz(block):
    """Forward orthonormal DCT of a level-shifted 8x8 block, quant=1,
    rounded, returned in zigzag order."""
    import numpy as np

    from de_realtime_voting_spark.operators.multimodal import _ZIGZAG, _dct_matrix

    c = _dct_matrix()
    coef = c @ (block - 128.0) @ c.T
    flat = np.rint(coef).astype(np.int64).reshape(64)
    return [int(flat[_ZIGZAG[k]]) for k in range(64)]


def _make_jpeg(rgb, subsample=False, restart_interval=0, grayscale=False):
    """From-scratch baseline JPEG encoder (quant tables all ones, one
    shared 9/10-bit Huffman table): 4:4:4, 4:2:0 or single-component
    grayscale, optional DRI/RST markers."""
    import numpy as np

    rgb = np.asarray(rgb, dtype=np.float64)
    h, w = rgb.shape[:2]
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    if grayscale:
        comps = [(1, 1, 1, y)]
    elif subsample:
        cb2 = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cr2 = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        comps = [(1, 2, 2, y), (2, 1, 1, cb2), (3, 1, 1, cr2)]
    else:
        comps = [(1, 1, 1, y), (2, 1, 1, cb), (3, 1, 1, cr)]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")
    # DQT id 0: all ones
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes([1] * 64)
    # SOF0
    ncomp = len(comps)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for cid, hs, vs, _ in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    # DHT: same code lengths for DC (class 0) and AC (class 1), id 0
    counts = bytes([0] * 8 + [255, 1] + [0] * 6)
    symbols = bytes(range(255)) + bytes([255])
    for cls in (0, 1):
        body = bytes([cls << 4]) + counts + symbols
        out += b"\xff\xc4" + (2 + len(body)).to_bytes(2, "big") + body
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") + restart_interval.to_bytes(2, "big")
    # SOS
    sos = bytes([ncomp])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos

    bw = _JBitWriter()
    pred = {cid: 0 for cid, *_ in comps}
    rst = 0
    n_mcus = mcux * mcuy
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            bw.byte_align()
            out += bytes(bw.buf) + bytes([0xFF, 0xD0 + (rst & 7)])
            bw = _JBitWriter()
            rst += 1
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(m, mcux)
        for cid, hs, vs, plane in comps:
            import numpy as np

            ph = mcuy * vs * 8
            pw = mcux * hs * 8
            padded = np.zeros((ph, pw))
            padded[: plane.shape[0], : plane.shape[1]] = plane
            for by in range(vs):
                for bx in range(hs):
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    blk = padded[y0 : y0 + 8, x0 : x0 + 8]
                    pred[cid] = _j_encode_block(bw, _j_fdct_quant_zz(blk), pred[cid])
    bw.byte_align()
    out += bytes(bw.buf) + b"\xff\xd9"
    return bytes(out)


def _gradient_rgb(h, w):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 255.0 * xx / max(w - 1, 1)
    g = 255.0 * yy / max(h - 1, 1)
    b = np.full((h, w), 96.0)
    return np.stack([r, g, b], axis=2)


def _true_features(rgb):
    import numpy as np

    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    gray = 0.299 * r + 0.587 * g + 0.114 * b
    return (
        float(np.mean(r)),
        float(np.mean(g)),
        float(np.mean(b)),
        float(np.std(gray)),
    )


def test_decode_jpeg_444_roundtrip():
    from de_realtime_voting_spark.operators.multimodal import decode_jpeg_rgb

    img = _gradient_rgb(16, 16)
    w, h, mr, mg, mb, sd = decode_jpeg_rgb(_make_jpeg(img))
    tr, tg, tb, tsd = _true_features(img)
    assert (w, h) == (16.0, 16.0)
    # quant=1: only DCT-coefficient rounding noise survives
    assert abs(mr - tr) < 1.0 and abs(mg - tg) < 1.0 and abs(mb - tb) < 1.0
    assert abs(sd - tsd) < 1.5


def test_decode_jpeg_420_subsampled_roundtrip():
    from de_realtime_voting_spark.operators.multimodal import decode_jpeg_rgb

    img = _gradient_rgb(16, 16)
    w, h, mr, mg, mb, sd = decode_jpeg_rgb(_make_jpeg(img, subsample=True))
    tr, tg, tb, tsd = _true_features(img)
    assert (w, h) == (16.0, 16.0)
    # chroma is 2x2-averaged then nearest-neighbor upsampled: smooth
    # gradients survive within a couple of gray levels
    assert abs(mr - tr) < 3.0 and abs(mg - tg) < 3.0 and abs(mb - tb) < 3.0


def test_decode_jpeg_grayscale_and_odd_size():
    """Single-component scan + non-multiple-of-8 dims (12x10 pads to
    two MCUs wide; the pad must be cropped, not averaged in)."""
    import numpy as np

    from de_realtime_voting_spark.operators.multimodal import decode_jpeg_rgb

    img = np.zeros((10, 12, 3))
    img[:, :, :] = 200.0
    w, h, mr, mg, mb, sd = decode_jpeg_rgb(_make_jpeg(img, grayscale=True))
    assert (w, h) == (12.0, 10.0)
    assert abs(mr - 200.0) < 1.5 and abs(sd) < 1.5
    assert abs(mr - mg) < 1e-9 and abs(mr - mb) < 1e-9  # gray: R=G=B


def test_decode_jpeg_restart_markers():
    from de_realtime_voting_spark.operators.multimodal import decode_jpeg_rgb

    img = _gradient_rgb(16, 24)  # 6 MCUs at 4:4:4 -> RSTs every 2
    plain = decode_jpeg_rgb(_make_jpeg(img))
    with_rst = decode_jpeg_rgb(_make_jpeg(img, restart_interval=2))
    assert plain == with_rst


def test_decode_jpeg_rejects_progressive():
    import pytest

    from de_realtime_voting_spark.operators.multimodal import decode_jpeg_rgb

    img = _gradient_rgb(8, 8)
    payload = bytearray(_make_jpeg(img))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_rgb(bytes(payload))


def test_decode_auto_handles_jpeg():
    from de_realtime_voting_spark.operators.multimodal import decode_auto

    img = _gradient_rgb(8, 8)
    feats = decode_auto(_make_jpeg(img))
    assert feats[0] == 8.0 and feats[1] == 8.0


# ---------------------------------------------------------------- mp3


def _mp3_frame(br_idx, sr_idx=0, padding=0, version=3):
    """Hand-build one MPEG Layer III frame (header + zero body) with
    the exact length the header implies."""
    from de_realtime_voting_spark.operators.multimodal import (
        _MP3_BITRATES_V1,
        _MP3_BITRATES_V2,
        _MP3_RATES,
    )

    b1 = 0xE0 | (version << 3) | (1 << 1) | 1  # sync tail|version|layerIII|no-crc
    b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    rate = _MP3_RATES[version][sr_idx]
    if version == 3:
        kbps, coef = _MP3_BITRATES_V1[br_idx], 144
    else:
        kbps, coef = _MP3_BITRATES_V2[br_idx], 72
    n = (coef * kbps * 1000) // rate + padding
    return bytes([0xFF, b1, b2, 0x00]) + b"\x00" * (n - 4)


def test_mp3_meta_cbr_stream():
    from de_realtime_voting_spark.operators.multimodal import parse_mp3_meta

    payload = b"".join(_mp3_frame(9) for _ in range(5))  # 128kbps@44100 x5
    kbps, rate, n, dur, vbr = parse_mp3_meta(payload)
    assert (kbps, rate, n, vbr) == (128.0, 44100.0, 5.0, 0.0)
    assert abs(dur - 5 * 1152 / 44100) < 1e-12


def test_mp3_meta_vbr_and_id3v2_skip():
    from de_realtime_voting_spark.operators.multimodal import parse_mp3_meta

    frames = _mp3_frame(9) + _mp3_frame(11) + _mp3_frame(9, padding=1)
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x01" * 20
    kbps, rate, n, dur, vbr = parse_mp3_meta(tag + frames)
    assert n == 3.0 and vbr == 1.0 and rate == 44100.0
    assert abs(kbps - (128 + 192 + 128) / 3) < 1e-12


def test_mp3_meta_mpeg2_and_truncation():
    from de_realtime_voting_spark.operators.multimodal import parse_mp3_meta

    full = _mp3_frame(8, version=2)  # 64kbps@22050, 576 samples/frame
    payload = full * 4 + full[:-10]  # truncated 5th frame
    kbps, rate, n, dur, vbr = parse_mp3_meta(payload)
    assert (kbps, rate, n) == (64.0, 22050.0, 4.0)
    assert abs(dur - 4 * 576 / 22050) < 1e-12


def test_mp3_meta_garbage_fails_loudly():
    import pytest

    from de_realtime_voting_spark.operators.multimodal import parse_mp3_meta

    with pytest.raises(ValueError):
        parse_mp3_meta(b"\xff\xfb")  # sync but no room for a frame
    with pytest.raises(ValueError):
        parse_mp3_meta(b"not audio at all")
    # valid sync frames of UNSUPPORTED codec variants are reported as
    # NotImplementedError naming the format (decode_auto's contract),
    # not conflated with garbage:
    with pytest.raises(NotImplementedError, match="free-format"):
        parse_mp3_meta(bytes([0xFF, 0xFB, 0x00, 0x00]) + b"\x00" * 100)
    with pytest.raises(NotImplementedError, match="Layer II"):  # layer bits 10
        parse_mp3_meta(bytes([0xFF, 0xFD, 0x40, 0x00]) + b"\x00" * 100)
    with pytest.raises(NotImplementedError, match="Layer I\\b"):  # layer bits 11
        parse_mp3_meta(bytes([0xFF, 0xFF, 0x40, 0x00]) + b"\x00" * 100)


def test_mp3_meta_property_frame_walk():
    """Any hand-built (bitrate, padding) frame sequence parses back to
    its own frame count and mean bitrate."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from de_realtime_voting_spark.operators.multimodal import (
        _MP3_BITRATES_V1,
        parse_mp3_meta,
    )

    @given(
        st.lists(
            st.tuples(st.integers(1, 14), st.integers(0, 1)), min_size=1, max_size=12
        )
    )
    @settings(max_examples=40, deadline=None)
    def check(specs):
        payload = b"".join(_mp3_frame(b, padding=p) for b, p in specs)
        kbps, rate, n, dur, vbr = parse_mp3_meta(payload)
        want = [_MP3_BITRATES_V1[b] for b, _ in specs]
        assert n == float(len(specs))
        assert abs(kbps - sum(want) / len(want)) < 1e-9
        assert vbr == (1.0 if len(set(want)) > 1 else 0.0)
        assert rate == 44100.0

    check()


def test_mp3_meta_id3v24_footer_flag():
    """An ID3v2.4 tag with the footer flag (0x10) occupies
    10 + size + 10 bytes; the sync walk must start past the footer,
    not on the b'3DI' footer identifier."""
    from de_realtime_voting_spark.operators.multimodal import parse_mp3_meta

    frames = _mp3_frame(9) * 2
    body = b"\x02" * 30
    tag = (b"ID3\x04\x00\x10" + bytes([0, 0, 0, len(body)]) + body
           + b"3DI\x04\x00\x10" + bytes([0, 0, 0, len(body)]))
    kbps, rate, n, dur, vbr = parse_mp3_meta(tag + frames)
    assert (kbps, rate, n) == (128.0, 44100.0, 2.0)
