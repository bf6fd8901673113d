"""Multimodal (binary-payload) processing stages.

Images/audio/video are opaque ``binary`` columns with typed metadata
(mime, width/height, duration) — exactly how the 100 TB corpus carries
them. The decode kernel is REAL for baseline JPEG (any DQT/DHT, 4:4:4
and 4:2:0, restart intervals — ``stages/jpeg.py``), PNG (8-bit, all
five scanline filters — DEFLATE is stdlib zlib), uncompressed 24-bit
BMP images, 16-bit PCM WAV audio, and MPEG-1 Layer I compressed audio
(``stages/mpeg_audio.py`` — reference analog: essentia/music21
decoders, ``loader.py:69-83``). The remaining boundary is Layer II/III
(MP3 proper): those need the ISO allocation/Huffman tables (pages of
tabulated standard data) and raise a precise ``ValueError`` naming the
missing piece. The Ray-side plumbing — actor-pool signature, schema,
small batch sizes for large payloads, output layout — is identical for
every codec.

Set ``use_fake_decoder=True`` to force the deterministic fake decode
(payload byte statistics) for any payload regardless of magic bytes.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from lsh_ray.config import PipelineConfig

# ----------------------------------------------------------- BMP codec ----
# Minimal BI_RGB 24-bpp codec (BITMAPFILEHEADER + BITMAPINFOHEADER): rows
# are bottom-up, BGR, padded to 4 bytes. Pure numpy — the decode kernel a
# worker runs needs no external library for this container format.


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> uncompressed 24-bpp BMP bytes."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp expects (H, W, 3) RGB")
    row_bytes = (w * 3 + 3) & ~3
    image_size = row_bytes * h
    # rows bottom-up, channels BGR, right-padded to 4-byte multiples
    padded = np.zeros((h, row_bytes), dtype=np.uint8)
    padded[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    header = struct.pack("<2sIHHI", b"BM", 54 + image_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size,
                      2835, 2835, 0, 0)
    return header + dib + padded.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bpp BMP bytes -> (H, W, 3) uint8 RGB.

    Supports bottom-up (height > 0) and top-down (height < 0) rows;
    rejects compressed / non-24-bpp variants explicitly.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_offset = struct.unpack_from("<I", payload, 10)[0]
    (dib_size, w, h, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if dib_size < 40 or compression != 0 or bpp != 24:
        raise ValueError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    if w < 0 or pix_offset + row_bytes * h > len(payload):
        raise ValueError("truncated BMP payload (declared dimensions "
                         "exceed the available bytes)")
    data = np.frombuffer(payload, dtype=np.uint8,
                         count=row_bytes * h, offset=pix_offset)
    rows = data.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    img = rows if top_down else rows[::-1]
    return np.ascontiguousarray(img[:, :, ::-1])  # BGR -> RGB


# ----------------------------------------------------- frame container ----
# Minimal multi-frame container for video-shaped payloads: a "BMPV"
# header (frame count + fps) followed by length-prefixed BMP frames.
# The uncompressed stand-in for real video codecs (absent from this
# environment): the frame-sampling plumbing — stride selection, per-frame
# decode, feature layout — is identical for any codec.


def encode_bmpv(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """List of (H, W, 3) uint8 RGB frames -> BMPV container bytes."""
    parts = [struct.pack("<4sII", b"BMPV", len(frames), fps)]
    for f in frames:
        payload = encode_bmp(f)
        parts.append(struct.pack("<I", len(payload)))
        parts.append(payload)
    return b"".join(parts)


def sample_frames(payload: bytes, every_nth: int = 1,
                  max_frames: int | None = None) -> list[np.ndarray]:
    """BMPV bytes -> every ``every_nth``-th decoded frame (bounded by
    ``max_frames``). Skips (seeks past) unsampled frames without
    decoding them — the property that matters when one frame decode is
    expensive."""
    if len(payload) < 12 or payload[:4] != b"BMPV":
        raise ValueError("not a BMPV payload")
    n_frames, _fps = struct.unpack_from("<II", payload, 4)
    out: list[np.ndarray] = []
    pos = 12
    for i in range(n_frames):
        # bounds-check declared sizes: a truncated or size-lying payload
        # must raise the documented ValueError, not struct.error
        if pos + 4 > len(payload):
            raise ValueError("truncated BMPV payload (frame length "
                             "prefix past end of data)")
        (size,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if pos + size > len(payload):
            raise ValueError("truncated BMPV payload (declared frame "
                             "size exceeds the available bytes)")
        if i % every_nth == 0:
            out.append(decode_bmp(payload[pos:pos + size]))
            if max_frames is not None and len(out) >= max_frames:
                break
        pos += size
    return out


def video_features(payload: bytes, every_nth: int = 2,
                   max_frames: int = 8) -> np.ndarray:
    """BMPV bytes -> 16 float32 features: frame count, fps, sampled
    count, then the mean over sampled frames of the leading 13 image
    features (dims, aspect, luma, channel means...)."""
    if len(payload) < 12 or payload[:4] != b"BMPV":
        raise ValueError("not a BMPV payload")
    n_frames, fps = struct.unpack_from("<II", payload, 4)
    frames = sample_frames(payload, every_nth, max_frames)
    if not frames:
        return np.zeros(16, dtype=np.float32)
    per = np.stack([image_features(f) for f in frames]).mean(axis=0)
    head = np.array([n_frames, fps, len(frames)], dtype=np.float32)
    return np.concatenate([head, per[:13]]).astype(np.float32)


# ----------------------------------------------------------- WAV codec ----
# Minimal RIFF/WAVE PCM codec (16-bit integer samples): a chunk walk over
# the container plus one frombuffer — pure numpy, no audio library. The
# reference decodes audio via essentia/music21 (loader.py:69-83); WAV is
# the uncompressed container those decoders bottom out in.


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono samples (float in [-1, 1] or int16) -> 16-bit PCM WAV bytes."""
    if samples.dtype != np.int16:
        samples = np.round(np.clip(samples.astype(np.float64), -1.0, 1.0)
                           * 32767.0).astype(np.int16)
    data = samples.tobytes()
    return struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data)) + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> (mono float32 samples in [-1, 1], rate).

    Walks the chunk list (fmt may not be adjacent to data); rejects
    non-PCM encodings and bit depths other than 16 explicitly;
    multi-channel audio is averaged to mono.
    """
    if len(payload) < 44 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8: pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAV payload (declared chunk "
                             "size exceeds the available bytes)")
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV variant (format={audio_format}, bits={bits})")
    raw = np.frombuffer(data, dtype="<i2",
                        count=(len(data) // (2 * n_channels)) * n_channels)
    x = raw.astype(np.float32) / 32768.0
    if n_channels > 1:
        x = x.reshape(-1, n_channels).mean(axis=1)
    return x, sample_rate


def audio_features(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    """Mono samples -> 16 float32 features: length, rate, duration, RMS,
    peak, zero-crossing rate, and a 10-segment energy envelope
    (tempo-robust shape summary, reference analog: the rescaled pitch
    vectors fed to the matching kernels)."""
    n = len(samples)
    if n == 0:
        return np.zeros(16, dtype=np.float32)
    rms = float(np.sqrt(np.mean(samples ** 2)))
    peak = float(np.abs(samples).max())
    zcr = float(np.mean(np.signbit(samples[1:]) !=
                        np.signbit(samples[:-1])))
    seg = np.array_split(np.abs(samples), 10)
    envelope = np.array([s.mean() if len(s) else 0.0 for s in seg],
                        dtype=np.float32)
    head = np.array([n, sample_rate, n / sample_rate, rms, peak, zcr],
                    dtype=np.float32)
    return np.concatenate([head, envelope]).astype(np.float32)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index arithmetic (no loops)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return img[ri[:, None], ci[None, :]]


def image_features(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> 16 float32 features: dims, aspect, luma mean,
    per-channel mean/std/min/max over a 16x16 thumbnail (scale-stable)."""
    thumb = resize_nearest(img, 16, 16).astype(np.float32)
    mean = thumb.mean(axis=(0, 1))
    std = thumb.std(axis=(0, 1))
    mn = thumb.min(axis=(0, 1))
    mx = thumb.max(axis=(0, 1))
    h, w = img.shape[:2]
    luma = float(mean @ np.array([0.299, 0.587, 0.114], dtype=np.float32))
    head = np.array([h, w, w / max(h, 1), luma], dtype=np.float32)
    return np.concatenate([head, mean, std, mn, mx]).astype(np.float32)


# ----------------------------------------------------------- PNG codec ----
# Real PNG decode with zero external deps: the only compression inside a
# PNG is DEFLATE (stdlib zlib); everything else is byte plumbing + the
# five scanline filters, vectorized where the spec allows (None/Up fully;
# Sub/Average/Paeth are sequential in the pixel dimension by definition,
# looped per-pixel-column over whole-row numpy lanes). Covers the
# non-interlaced 8-bit color types (gray / RGB / palette / gray+alpha /
# RGBA) — the overwhelming majority of web-crawl PNGs. Interlaced
# (Adam7) and 1/2/4/16-bit depths are rejected with ValueError.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    """Yield (type, data) chunks, bounds-checking declared lengths."""
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4: pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk (declared length "
                             "exceeds payload)")
        yield ctype, payload[pos + 8: pos + 8 + length]
        if ctype == b"IEND":
            return
        pos += 12 + length
    raise ValueError("truncated PNG payload (no IEND)")


def _png_unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters -> (h, w*bpp) uint8.

    ``raw`` is the inflated stream reshaped to (h, 1 + w*bpp): one filter
    byte then the filtered scanline. Arithmetic is mod-256 (uint8 wrap),
    exactly as the spec defines."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].copy()
        if ftype == 0:                      # None
            pass
        elif ftype == 2:                    # Up — vectorized whole-row
            line += prev
        elif ftype == 1:                    # Sub — cumsum mod 256 per
            # channel lane (addition mod 256 distributes over the scan)
            lanes = line.astype(np.int64).reshape(-1, bpp)
            line = (np.cumsum(lanes, axis=0) & 0xFF).astype(
                np.uint8).reshape(stride)
        elif ftype == 3:                    # Average
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:                    # Paeth
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = line
        prev = line
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8 RGB. Pure numpy + stdlib zlib."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace \
                = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG format (bit depth {bit_depth}, "
                         f"color type {color_type}); 8-bit gray/RGB/"
                         "palette/gray+alpha/RGBA supported")
    bpp = _PNG_CHANNELS[color_type]
    try:
        stream = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    expect = height * (1 + width * bpp)
    if len(stream) != expect:
        raise ValueError("PNG pixel stream length mismatch (truncated or "
                         "size-lying IHDR)")
    raw = np.frombuffer(stream, dtype=np.uint8).reshape(
        height, 1 + width * bpp)
    flat = _png_unfilter(raw, height, width, bpp)
    px = flat.reshape(height, width, bpp)
    if color_type == 2:                     # RGB
        return px
    if color_type == 6:                     # RGBA -> drop alpha
        return np.ascontiguousarray(px[:, :, :3])
    if color_type == 0:                     # gray
        return np.repeat(px, 3, axis=2)
    if color_type == 4:                     # gray+alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    if palette is None:
        raise ValueError("palette PNG missing PLTE chunk")
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("PNG palette index out of range")
    return palette[idx]


def encode_png(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> PNG bytes (filter 0 rows, one IDAT)."""
    import zlib

    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_png expects (H, W, 3) RGB")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * 3)],
        axis=1).tobytes()
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _decompress_payload(payload: bytes, max_depth: int = 2) -> bytes:
    """Strip stdlib compression wrappers (gzip/zlib/xz/bz2, detected by
    magic bytes) before codec dispatch — the most common Common-Crawl
    payload wrapping, handled with zero external deps. ``max_depth``
    bounds pathological nesting. Corrupt streams raise ValueError."""
    import bz2
    import gzip
    import lzma
    import zlib

    for _ in range(max_depth):
        try:
            if payload[:2] == b"\x1f\x8b":
                payload = gzip.decompress(payload)
            elif payload[:6] == b"\xfd7zXZ\x00":
                payload = lzma.decompress(payload)
            elif payload[:3] == b"BZh" and len(payload) > 4 \
                    and payload[4:10] == b"1AY&SY":
                payload = bz2.decompress(payload)
            elif len(payload) >= 2 and payload[0] == 0x78 \
                    and payload[1] in (0x01, 0x5E, 0x9C, 0xDA):
                payload = zlib.decompress(payload)
            else:
                return payload
        except (OSError, lzma.LZMAError, zlib.error, EOFError) as e:
            raise ValueError(f"corrupt compressed payload: {e}") from e
    return payload


class BinaryDecodeStage:
    """Actor-pool stage: decode binary payloads into fixed-size features.

    Compression wrappers (gzip/zlib/xz/bz2) are stripped by magic bytes
    first (stdlib — ``_decompress_payload``); JPEG / PNG / BMP /
    PCM-WAV / MPEG-1-Layer-I / SMF-MIDI / BMPV payloads then decode for
    real via the numpy codecs. The remaining boundary is MPEG Layer
    II/III inside ``mpeg_audio`` (ISO tables not reproducible) — a
    heavier codec library would load once per actor in ``__init__``.
    """

    FEATURE_DIM = 16

    def __init__(self, use_fake_decoder: bool = False):
        self.use_fake_decoder = use_fake_decoder
        # real compressed-codec load (PIL/torchvision/essentia) would
        # happen here, once per actor; the BMP path needs none

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if not self.use_fake_decoder:
            payload = _decompress_payload(payload)
            if payload[:2] == b"\xff\xd8":
                from lsh_ray.stages.jpeg import decode_jpeg
                return image_features(decode_jpeg(payload))
            if payload[:8] == _PNG_SIG:
                return image_features(decode_png(payload))
            if payload[:4] == b"BMPV":  # before "BM": shared prefix
                return video_features(payload)
            if payload[:2] == b"BM":
                return image_features(decode_bmp(payload))
            if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                return audio_features(*decode_wav(payload))
            if payload[:3] == b"ID3" or (
                    len(payload) >= 2 and payload[0] == 0xFF
                    and payload[1] & 0xE0 == 0xE0):
                # MPEG audio (Layers I + II native; III raises inside
                # with the precise missing standard table — mpeg_audio)
                from lsh_ray.stages.mpeg_audio import decode_mpeg1
                return audio_features(*decode_mpeg1(payload))
            if payload[:4] == b"MThd":
                # Standard MIDI File: structured score parse (the
                # reference's song loader, loader.py:85-126)
                from lsh_ray.stages.midi import midi_features, parse_midi
                return midi_features(*parse_midi(payload))
            raise NotImplementedError(
                "unrecognized payload format; gzip/zlib/xz/bz2 wrappers "
                "and JPEG / PNG / BMP / PCM WAV / MPEG-1 Layer I+II audio "
                "/ SMF MIDI / BMPV payloads decode natively, or construct "
                "with use_fake_decoder=True for the stand-in")
        # deterministic fake: md5-seeded byte statistics as "features"
        digest = hashlib.md5(payload).digest()
        base = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
        stats = np.array([len(payload) % 251, payload[0] if payload else 0,
                          payload[-1] if payload else 0,
                          sum(payload[:64]) % 255], dtype=np.float32)
        feat = np.concatenate([base, stats])[: self.FEATURE_DIM]
        return feat / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([
            self._decode_one(p if p is not None else b"") for p in payloads])
        return pa.table({
            "doc_id": batch["doc_id"],
            "mime": batch["mime"] if "mime" in batch.column_names
            else pa.array(["application/octet-stream"] * batch.num_rows),
            "n_bytes": pa.array(
                np.array([len(p) if p else 0 for p in payloads],
                         dtype=np.int64)),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), type=pa.float32()),
                self.FEATURE_DIM),
        })


def decode_binary(ds, config: PipelineConfig | None = None,
                  use_fake_decoder: bool = False, batch_size: int = 64):
    """(doc_id, payload[, mime]) -> (doc_id, mime, n_bytes, features).

    Small ``batch_size`` by design: batch bytes = batch_size x payload size
    must fit the worker heap (large binary rows, see ray_guide 'Memory-
    aware'); concurrency x num_cpus sized to the node by the caller.
    """
    return ds.map_batches(
        BinaryDecodeStage, fn_constructor_args=(use_fake_decoder,),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=(1, 8))
