"""Native MPEG-1 audio (Layer I + II) decode — pure numpy + stdlib.

Closes the last declared codec boundary in ``BinaryDecodeStage``
(reference analog: the audio loader at ``/root/reference/loader.py:69-77``
decodes compressed audio via an external library; this container has
none, so the bitstream layer is implemented natively like the JPEG /
PNG / BMP / WAV codecs).

Scope and honesty about the boundary:

- **MPEG-1 Layer I** frames (``.mp1``, and the Layer I frames that some
  ``.mp3``-named files actually carry) decode natively: full header
  parse, bit allocation, scalefactors, sample dequantization and the
  ISO-structured polyphase synthesis filterbank. All four channel
  modes: mono, stereo, dual-channel, and joint (intensity) stereo —
  shared allocation + sample codes above the ``(mode_extension+1)*4``
  bound with per-channel scalefactors.
- **Layer II** (``.mp2``) decodes natively: Table B.2a-d allocation
  (selected per ISO's sampling-frequency x bitrate-per-channel rule),
  scfsi scalefactor sharing, grouped (3/5/9-step) and ungrouped sample
  codes, and the unified midrise dequantizer — Table B.4's per-class
  ``C``/``D`` constants reduce algebraically to the closed form
  ``s'' = (2c + 1 - steps) / steps`` (verify: steps=7, C=8/7, D=1/4,
  s'''=c/4-1 gives C*(s'''+D) = (2c-6)/7), so no constant table is
  transcribed. All four channel modes including joint (intensity)
  stereo (shared allocation + sample codes above the bound,
  per-channel scfsi/scalefactors).
- **Layer III** needs the ISO Huffman code tables + IMDCT — pages of
  tabulated standard data with no closed form — so it raises a precise
  ``ValueError`` naming the missing piece rather than shipping an
  unverifiable transcription.
- The ISO tables 3-B.2 (analysis window C) and 3-B.3 (synthesis window
  D) are likewise tabulated data. This module uses a COMPUTED near-PR
  prototype of the identical structure (512-tap windowed sinc, cutoff
  swept to maximize reconstruction SNR; the per-64-block sign folding
  the ISO tables carry falls out of the pseudo-QMF algebra). Measured
  analysis->synthesis reconstruction: **71 dB SNR** on white noise at
  the standard 481-sample filterbank delay — the delay matching ISO's
  published value is structural evidence the flowgraph is conformant.
  Decoding a frame produced by a REAL encoder therefore differs from a
  conformance decoder only by the (near-PR vs ISO-PR) window mismatch
  — inaudible-scale error, but NOT bit-exact; documented, not hidden.

Dequantization derivation (Layer I, nb-bit code c, midrise symmetric,
no zero code): ``s'' = (2c + 1 - 2^nb) / (2^nb - 1)`` — maps c=0 to -1,
c=2^nb-1 to +1, c=2^(nb-1) to +1/(2^nb-1). Scalefactors follow ISO
Table B.1's closed form ``sf[i] = 2 * 2^(-i/3)`` (index 0..62).

The companion ``encode_mpeg1_layer1`` exists so tests can exercise the
decoder on REAL Layer I bitstreams end-to-end (same role as
``encode_jpeg`` for the JPEG decoder): ISO-structured analysis
filterbank, per-subband scalefactor choice, uniform bit allocation,
zero-stuffed ancillary bits.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------ tables ----

# MPEG-1 bitrate (kbit/s) per layer, index 1..14 (0 = free format,
# 15 = forbidden) — ISO 11172-3 Table B.1 header tables
_BITRATES = {
    1: (None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
        384, 416, 448),
    2: (None, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
        320, 384),
    3: (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
        256, 320),
}
_SAMPLE_RATES = (44100, 48000, 32000)   # sampling_frequency code 0/1/2

# ISO Table B.1 scalefactors: sf[i] = 2 * 2^(-i/3), indices 0..62
_SCALEFACTORS = 2.0 * np.exp2(-np.arange(63) / 3.0)

# --------------------------------------------------- polyphase window ----

# Near-PR prototype: 512-tap windowed sinc, cutoff 1.1475/128 x Kaiser
# beta=11.3 (swept for max reconstruction SNR — 71 dB on white noise);
# the (-1)^(n//64) factor is the sign folding ISO's C/D tables carry so
# that the 8x64 fold + 32x64 cosine matrix realize the full 512-tap
# cosine modulation.
_PROTO_CUT = 1.1475
_PROTO_BETA = 11.3
# broadband analysis->synthesis gain of the C/D pair below (measured by
# least squares on seeded white noise at delay 481); folded into D so
# the decoder's round-trip gain is unity
_SYNTH_GAIN = 0.18964880512814825
FILTERBANK_DELAY = 481


def _windows() -> tuple[np.ndarray, np.ndarray]:
    n = np.arange(512)
    h = (np.sinc((n - 256) / 64.0 * _PROTO_CUT) / 64.0
         * np.kaiser(512, _PROTO_BETA))
    c = h * (-1.0) ** (n // 64)
    d = 32.0 * c / _SYNTH_GAIN
    return c, d


_C, _D = _windows()
# analysis matrixing M(k,j) = cos((2k+1)(j-16)pi/64)  (ISO encoder)
_M = np.cos((2 * np.arange(32)[:, None] + 1)
            * (np.arange(64)[None, :] - 16) * np.pi / 64)
# synthesis matrixing N(i,k) = cos((16+i)(2k+1)pi/64)  (ISO decoder)
_N = np.cos((16 + np.arange(64)[:, None])
            * (2 * np.arange(32)[None, :] + 1) * np.pi / 64)


# ------------------------------------------------------------- header ----

def parse_frame_header(word: int) -> dict:
    """32-bit MPEG audio frame header -> field dict (ISO 11172-3
    2.4.1.3). Raises ValueError on non-MPEG-1 / reserved values."""
    if (word >> 20) & 0xFFF != 0xFFF:
        raise ValueError("bad MPEG sync word")
    if (word >> 19) & 1 != 1:
        raise ValueError("MPEG-2/2.5 audio not supported (ID bit 0)")
    layer_code = (word >> 17) & 3
    if layer_code == 0:
        raise ValueError("reserved MPEG layer code")
    layer = 4 - layer_code                     # 3->I, 2->II, 1->III
    bidx = (word >> 12) & 0xF
    if bidx == 15:
        raise ValueError("forbidden bitrate index")
    if bidx == 0:
        raise ValueError("free-format bitrate not supported")
    sidx = (word >> 10) & 3
    if sidx == 3:
        raise ValueError("reserved sampling frequency")
    return {
        "layer": layer,
        "protection": (word >> 16) & 1,        # 0 => 16-bit CRC follows
        "bitrate": _BITRATES[layer][bidx] * 1000,
        "sample_rate": _SAMPLE_RATES[sidx],
        "padding": (word >> 9) & 1,
        "mode": (word >> 6) & 3,               # 0 st,1 joint,2 dual,3 mono
        "mode_extension": (word >> 4) & 3,
    }


def _frame_bytes(h: dict) -> int:
    if h["layer"] == 1:
        return 4 * (12 * h["bitrate"] // h["sample_rate"] + h["padding"])
    return 144 * h["bitrate"] // h["sample_rate"] + h["padding"]


def _skip_id3v2(payload: bytes) -> int:
    """Return the offset of the first audio byte (past an ID3v2 tag)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    sz = ((payload[6] & 0x7F) << 21 | (payload[7] & 0x7F) << 14
          | (payload[8] & 0x7F) << 7 | (payload[9] & 0x7F))
    return 10 + sz


# ---------------------------------------------------------- synthesis ----

def _synthesis(subbands: np.ndarray) -> np.ndarray:
    """(n_hops, 32) subband samples -> (n_hops*32,) PCM float.

    ISO 2.4.3.3 structure, vectorized across hops: the V-fifo matrixing
    is ONE (n_hops, 32) @ (32, 64) matmul; the U/W window-sum is 16
    shifted-row multiply-adds (fifo block i at hop t is matrix row t-i;
    even blocks contribute their first 32 lanes, odd blocks lanes
    32..63 — the V[i*128+j] / V[i*128+96+j] mapping in fifo space)."""
    n_hops = subbands.shape[0]
    v = subbands @ _N.T                                   # (n_hops, 64)
    vpad = np.vstack([np.zeros((15, 64)), v])
    out = np.zeros((n_hops, 32))
    for i in range(16):
        rows = vpad[15 - i: 15 - i + n_hops]
        lane = rows[:, :32] if i % 2 == 0 else rows[:, 32:64]
        out += _D[32 * i: 32 * i + 32] * lane
    return out.reshape(-1)


def _analysis(sig: np.ndarray) -> np.ndarray:
    """(n,) PCM float -> (n//32, 32) subband samples (ISO encoder
    flowchart: 512 FIFO newest-first, window C, 8x64 fold, matrix M).
    Vectorized: each hop's FIFO is a reversed sliding window."""
    n_hops = len(sig) // 32
    sig = sig[: n_hops * 32]
    padded = np.concatenate([np.zeros(480), sig])
    # FIFO at hop t: X[m] = sig[t*32 + 31 - m], m = 0..511
    wins = np.lib.stride_tricks.sliding_window_view(padded, 512)[::32]
    x = wins[:n_hops, ::-1]                               # (n_hops, 512)
    z = (x * _C).reshape(n_hops, 8, 64).sum(axis=1)
    return z @ _M.T                                       # (n_hops, 32)


# -------------------------------------------------------------- decode ---

def _read_bits_vec(bits: np.ndarray, starts: np.ndarray,
                   width: int) -> np.ndarray:
    """Gather ``width``-bit MSB-first codes at each start offset."""
    acc = np.zeros(len(starts), dtype=np.int64)
    for j in range(width):
        acc = (acc << 1) | bits[starts + j]
    return acc


def _joint_bound(h: dict, sblimit: int) -> int:
    """First subband of the shared (intensity) region: all subbands for
    non-joint modes; ``(mode_extension + 1) * 4`` for joint stereo
    (ISO 2.4.2.3), clamped to the table's sblimit."""
    if h["mode"] != 1:
        return sblimit
    return min((h["mode_extension"] + 1) * 4, sblimit)


def _decode_frame_l1(bits: np.ndarray, pos: int, h: dict,
                     ) -> tuple[np.ndarray, int]:
    """One Layer I frame's payload bits -> (12*32, n_ch) subband
    samples. ``bits`` is the frame's unpacked bit array; ``pos`` is the
    first bit after header+CRC. Joint (intensity) stereo shares one
    allocation + one sample code per subband above the bound, with
    per-channel scalefactors."""
    n_ch = 1 if h["mode"] == 3 else 2
    bound = _joint_bound(h, 32)
    alloc = np.zeros((n_ch, 32), dtype=np.int64)
    for sb in range(32):
        vals = []
        for _ in range(n_ch if sb < bound else 1):
            a = _read_bits_vec(bits, np.array([pos]), 4)[0]
            pos += 4
            if a == 15:
                raise ValueError("forbidden Layer I allocation 15")
            vals.append(0 if a == 0 else a + 1)        # nb bits (2..15)
        for ch in range(n_ch):
            alloc[ch, sb] = vals[ch if sb < bound else 0]
    sf = np.zeros((n_ch, 32))
    for sb in range(32):
        for ch in range(n_ch):
            if alloc[ch, sb]:
                i = _read_bits_vec(bits, np.array([pos]), 6)[0]
                pos += 6
                if i == 63:
                    raise ValueError("forbidden scalefactor index 63")
                sf[ch, sb] = _SCALEFACTORS[i]
    # samples: 12 groups x (sb-major, channel-minor; one shared slot
    # above the joint bound) with constant per-group stride ->
    # vectorized gather of all 12 codes per slot
    stride = int(alloc[:, :bound].sum()) + int(alloc[0, bound:].sum())
    out = np.zeros((12 * 32, n_ch))
    off = 0
    groups = np.arange(12) * stride
    for sb in range(32):
        chans = range(n_ch) if sb < bound else (None,)
        for ch in chans:
            nb = int(alloc[0 if ch is None else ch, sb])
            if nb == 0:
                continue
            codes = _read_bits_vec(bits, pos + off + groups, nb)
            s2 = (2 * codes + 1 - (1 << nb)) / float((1 << nb) - 1)
            for c in range(n_ch) if ch is None else (ch,):
                out[sb::32, c] = sf[c, sb] * s2
            off += nb
    return out, pos + 12 * stride


# ------------------------------------------------------ Layer II tables ---

# ISO 11172-3 Tables B.2a-d: per-subband (nbal, steps-per-allocation-index).
# Allocation code 0 means "no samples"; code a >= 1 selects steps[a - 1].
_L2_ROW_A1 = (4, (3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
                  8191, 16383, 32767, 65535))
_L2_ROW_A2 = (4, (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047,
                  4095, 8191, 65535))
_L2_ROW_A3 = (3, (3, 5, 7, 9, 15, 31, 65535))
_L2_ROW_A4 = (2, (3, 5, 65535))
_L2_ROW_C1 = (4, (3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
                  8191, 16383, 32767))
_L2_ROW_C2 = (3, (3, 5, 9, 15, 31, 63, 127))

_L2_TABLES = {
    "B.2a": [_L2_ROW_A1] * 3 + [_L2_ROW_A2] * 8 + [_L2_ROW_A3] * 12
            + [_L2_ROW_A4] * 4,                          # sblimit 27
    "B.2b": [_L2_ROW_A1] * 3 + [_L2_ROW_A2] * 8 + [_L2_ROW_A3] * 12
            + [_L2_ROW_A4] * 7,                          # sblimit 30
    "B.2c": [_L2_ROW_C1] * 2 + [_L2_ROW_C2] * 6,         # sblimit 8
    "B.2d": [_L2_ROW_C1] * 2 + [_L2_ROW_C2] * 10,        # sblimit 12
}


def _l2_table_name(sample_rate: int, bitrate: int, n_ch: int) -> str:
    """ISO's Table B.2 selection rule (sampling frequency x bitrate per
    channel): <= 48 kbit/s/ch uses the low-rate tables (B.2d at 32 kHz,
    else B.2c); 56-80 uses B.2a everywhere; >= 96 uses B.2a at 48 kHz
    and B.2b at 44.1 / 32 kHz."""
    per_ch = bitrate // n_ch
    if per_ch <= 48_000:
        return "B.2d" if sample_rate == 32000 else "B.2c"
    if per_ch <= 80_000:
        return "B.2a"
    return "B.2a" if sample_rate == 48000 else "B.2b"


def _l2_cw_bits(steps: int) -> int:
    """Codeword bits per granule for one (subband, channel): grouped
    classes (3/5/9 steps) pack three samples into one base-``steps``
    code; ungrouped classes carry three nb-bit codes."""
    if steps == 3:
        return 5
    if steps == 5:
        return 7
    if steps == 9:
        return 10
    return 3 * ((steps + 1).bit_length() - 1)


def _decode_frame_l2(bits: np.ndarray, pos: int, h: dict,
                     ) -> np.ndarray:
    """One Layer II frame's payload bits -> (36*32, n_ch) subband
    samples (hop-major, matching ``_decode_frame_l1``'s layout). Joint
    (intensity) stereo shares one allocation + one sample code per
    subband above the bound, with per-channel scfsi/scalefactors."""
    n_ch = 1 if h["mode"] == 3 else 2
    rows = _L2_TABLES[_l2_table_name(h["sample_rate"], h["bitrate"],
                                     n_ch)]
    sblimit = len(rows)
    bound = _joint_bound(h, sblimit)
    one = np.zeros(1, dtype=np.int64)   # scalar read helper
    steps_of = np.zeros((n_ch, 32), dtype=np.int64)
    for sb in range(sblimit):
        nbal, steps_list = rows[sb]
        vals = []
        for _ in range(n_ch if sb < bound else 1):
            a = int(_read_bits_vec(bits, one + pos, nbal)[0])
            pos += nbal
            if a > len(steps_list):
                raise ValueError(
                    f"Layer II allocation {a} out of range for subband "
                    f"{sb} (table row has {len(steps_list)} classes)")
            vals.append(steps_list[a - 1] if a else 0)
        for ch in range(n_ch):
            steps_of[ch, sb] = vals[ch if sb < bound else 0]
    scfsi = np.zeros((n_ch, 32), dtype=np.int64)
    for sb in range(sblimit):
        for ch in range(n_ch):
            if steps_of[ch, sb]:
                scfsi[ch, sb] = int(_read_bits_vec(bits, one + pos, 2)[0])
                pos += 2
    # scalefactors: one per 12-hop part (3 parts); scfsi selects how
    # many are transmitted and how they spread across parts
    sf = np.zeros((n_ch, 32, 3))
    for sb in range(sblimit):
        for ch in range(n_ch):
            if not steps_of[ch, sb]:
                continue
            n_tx = (3, 2, 1, 2)[scfsi[ch, sb]]
            vals = []
            for _ in range(n_tx):
                i = int(_read_bits_vec(bits, one + pos, 6)[0])
                pos += 6
                if i == 63:
                    raise ValueError("forbidden scalefactor index 63")
                vals.append(_SCALEFACTORS[i])
            code = scfsi[ch, sb]
            if code == 0:
                parts = vals
            elif code == 1:
                parts = [vals[0], vals[0], vals[1]]
            elif code == 2:
                parts = [vals[0]] * 3
            else:
                parts = [vals[0], vals[1], vals[1]]
            sf[ch, sb] = parts
    # samples: 12 granules x 3 hops; constant per-granule bit stride
    # (one shared slot per subband above the joint bound)
    slots: list[tuple[int, tuple[int, ...], int]] = []  # sb, chans, off
    gbits = 0
    for sb in range(sblimit):
        for chans in ([(ch,) for ch in range(n_ch)] if sb < bound
                      else [tuple(range(n_ch))]):
            s = int(steps_of[chans[0], sb])
            if s:
                slots.append((sb, chans, gbits))
                gbits += _l2_cw_bits(s)
    groups = np.arange(12) * gbits
    out = np.zeros((36, 32, n_ch))
    for sb, chans, off in slots:
        s = int(steps_of[chans[0], sb])
        w = _l2_cw_bits(s)
        if s in (3, 5, 9):
            v = _read_bits_vec(bits, pos + off + groups, w)
            c = np.stack([v % s, (v // s) % s, (v // (s * s)) % s],
                         axis=1)                          # (12, 3)
        else:
            nb = w // 3
            c = np.stack([_read_bits_vec(bits, pos + off + k * nb
                                         + groups, nb)
                          for k in range(3)], axis=1)     # (12, 3)
        s2 = (2 * c + 1 - s) / float(s)
        for ch in chans:
            out[:, sb, ch] = (s2 * np.repeat(sf[ch, sb], 4)[:, None]) \
                .reshape(-1)
    return out.reshape(36 * 32, n_ch)


def decode_mpeg1(payload: bytes) -> tuple[np.ndarray, int]:
    """MPEG-1 audio bytes -> (mono float64 samples in [-1, 1],
    sample_rate). Layers I and II decode natively; Layer III raises
    with the precise missing piece (see module docstring).
    Multi-channel is averaged to mono (same contract as
    ``decode_wav``)."""
    start = _skip_id3v2(payload)
    pos = start
    frames = []
    sample_rate = None
    while pos + 4 <= len(payload):
        (word,) = struct.unpack_from(">I", payload, pos)
        if (word >> 20) & 0xFFF != 0xFFF:
            if frames:
                break                  # trailing junk / ID3v1 after audio
            raise ValueError("no MPEG audio sync word found")
        h = parse_frame_header(word)
        if h["layer"] == 3:
            raise ValueError(
                "MPEG-1 Layer III (MP3) decode requires the ISO Huffman "
                "code tables + IMDCT; Layers I and II decode natively")
        if sample_rate is None:
            sample_rate = h["sample_rate"]
        elif h["sample_rate"] != sample_rate:
            raise ValueError("inconsistent sample rate across frames")
        nbytes = _frame_bytes(h)
        if pos + nbytes > len(payload):
            break                                    # truncated last frame
        frame = payload[pos: pos + nbytes]
        bits = np.unpackbits(np.frombuffer(frame, dtype=np.uint8)) \
            .astype(np.int64)
        bit0 = 32 + (16 if h["protection"] == 0 else 0)
        try:
            if h["layer"] == 1:
                sub, _ = _decode_frame_l1(bits, bit0, h)
            else:
                sub = _decode_frame_l2(bits, bit0, h)
        except IndexError:
            # corrupt payload whose declared allocation consumes more
            # bits than the frame carries — keep the module's ValueError
            # contract (skip-on-fail wrappers catch ValueError)
            raise ValueError(
                "corrupt MPEG frame: declared bit allocation exceeds "
                "the frame payload") from None
        frames.append(sub)
        pos += nbytes
    if not frames:
        raise ValueError("no decodable MPEG audio frames")
    sub = np.vstack(frames)                       # (hops*32? , n_ch)
    n_ch = sub.shape[1]
    chans = [_synthesis(sub[:, ch].reshape(-1, 32))
             for ch in range(n_ch)]
    mono = np.mean(chans, axis=0)
    return np.clip(mono, -1.0, 1.0), sample_rate


# -------------------------------------------------------------- encode ---

def _put_bits(bits: list[int], v: int, w: int) -> None:
    for j in range(w - 1, -1, -1):
        bits.append((v >> j) & 1)


def encode_mpeg1_layer2(samples: np.ndarray, sample_rate: int = 44100,
                        bitrate_kbps: int = 192, max_steps: int = 15,
                        stereo: bool = False,
                        joint: bool = False) -> bytes:
    """Float samples in [-1, 1] -> MPEG-1 Layer II bitstream (the test
    -fixture encoder, same role as ``encode_mpeg1_layer1``): per
    subband the largest Table B.2 quantization class with
    ``steps <= max_steps`` is allocated, per-part scalefactors are the
    smallest covering max|s|, and scfsi is chosen adaptively (2 when
    all three parts share a scalefactor, 1/3 when adjacent pairs do,
    else 0) so every decoder sharing path is exercised by real
    signals. ``stereo=True`` duplicates the signal on both channels."""
    if sample_rate not in _SAMPLE_RATES:
        raise ValueError(f"sample_rate must be one of {_SAMPLE_RATES}")
    try:
        bidx = _BITRATES[2].index(bitrate_kbps)
    except ValueError:
        raise ValueError(
            f"bitrate_kbps must be one of {_BITRATES[2][1:]}") from None
    if joint and not stereo:
        raise ValueError("joint=True requires stereo=True")
    n_ch = 2 if stereo else 1
    mode = 1 if joint else 0 if stereo else 3
    mode_ext = 2                       # joint bound = (2 + 1) * 4 = 12
    sidx = _SAMPLE_RATES.index(sample_rate)
    rows = _L2_TABLES[_l2_table_name(sample_rate, bitrate_kbps * 1000,
                                     n_ch)]
    sblimit = len(rows)
    bound = min(12, sblimit) if joint else sblimit
    # per-subband allocation: largest class with steps <= max_steps
    # (every row starts at 3 steps, so index 1 always exists)
    alloc_idx = []
    for sb in range(sblimit):
        _nbal, steps_list = rows[sb]
        k = max(i for i, s in enumerate(steps_list) if s <= max_steps
                or i == 0) + 1
        alloc_idx.append(k)
    n_frames = -(-len(samples) // 1152)
    sig = np.concatenate([np.asarray(samples, dtype=np.float64),
                          np.zeros(n_frames * 1152 - len(samples))])
    sub = _analysis(sig)                              # (hops, 32)
    frame_bytes = 144 * bitrate_kbps * 1000 // sample_rate
    header = (0xFFF << 20 | 1 << 19 | 2 << 17 | 1 << 16 | bidx << 12
              | sidx << 10 | mode << 6
              | (mode_ext << 4 if joint else 0))
    out = bytearray()
    for f in range(n_frames):
        s = sub[f * 36: f * 36 + 36]                  # (36, 32)
        bits: list[int] = []
        for sb in range(sblimit):
            for _ch in range(n_ch if sb < bound else 1):
                _put_bits(bits, alloc_idx[sb], rows[sb][0])
        # per-part scalefactor indices (smallest sf covering max|s|)
        sf_idx = np.zeros((32, 3), dtype=np.int64)
        for sb in range(sblimit):
            for p in range(3):
                m = np.abs(s[p * 12: p * 12 + 12, sb]).max()
                i = int(np.searchsorted(-_SCALEFACTORS, -m))
                i = min(max(i - 1, 0), 62) if m > 0 else 62
                while _SCALEFACTORS[i] < m and i > 0:
                    i -= 1
                sf_idx[sb, p] = i
        scfsi = np.zeros(32, dtype=np.int64)
        for sb in range(sblimit):
            a, b, c = sf_idx[sb]
            scfsi[sb] = (2 if a == b == c else 1 if a == b
                         else 3 if b == c else 0)
        for sb in range(sblimit):
            for _ch in range(n_ch):
                _put_bits(bits, int(scfsi[sb]), 2)
        for sb in range(sblimit):
            tx = {0: [0, 1, 2], 1: [0, 2], 2: [0], 3: [0, 1]}[
                int(scfsi[sb])]
            for _ch in range(n_ch):
                for p in tx:
                    _put_bits(bits, int(sf_idx[sb, p]), 6)
        for g in range(12):
            for sb in range(sblimit):
                steps = rows[sb][1][alloc_idx[sb] - 1]
                sf = _SCALEFACTORS[sf_idx[sb, g // 4]]
                c3 = []
                for j in range(3):
                    s2 = s[g * 3 + j, sb] / sf
                    c = int(round((s2 * steps + steps - 1) / 2.0))
                    c3.append(min(max(c, 0), steps - 1))
                w = _l2_cw_bits(steps)
                for _ch in range(n_ch if sb < bound else 1):
                    if steps in (3, 5, 9):
                        _put_bits(bits, c3[0] + steps * c3[1]
                                  + steps * steps * c3[2], w)
                    else:
                        for c in c3:
                            _put_bits(bits, c, w // 3)
        total_bits = frame_bytes * 8 - 32
        if len(bits) > total_bits:
            raise ValueError(
                f"frame overflow: {len(bits)} payload bits > "
                f"{total_bits} (raise bitrate_kbps or lower max_steps)")
        bits.extend([0] * (total_bits - len(bits)))
        out += struct.pack(">I", header)
        out += np.packbits(np.array(bits, dtype=np.uint8)).tobytes()
    return bytes(out)


def encode_mpeg1_layer1(samples: np.ndarray, sample_rate: int = 44100,
                        bitrate_kbps: int = 448, nbits: int = 9,
                        stereo: bool = False,
                        joint: bool = False) -> bytes:
    """Float samples in [-1, 1] -> MPEG-1 Layer I bitstream (the test
    -fixture encoder, same role as ``encode_jpeg``): ISO analysis
    filterbank, smallest-covering scalefactor per (channel, subband),
    uniform ``nbits``-bit allocation, zero-stuffed ancillary bits.
    ``stereo=True`` duplicates the signal on both channels (exercises
    the 2-channel bitstream layout)."""
    if sample_rate not in _SAMPLE_RATES:
        raise ValueError(f"sample_rate must be one of {_SAMPLE_RATES}")
    if not 2 <= nbits <= 15:
        raise ValueError("nbits must be in [2, 15]")
    try:
        bidx = _BITRATES[1].index(bitrate_kbps)
    except ValueError:
        raise ValueError(
            f"bitrate_kbps must be one of {_BITRATES[1][1:]}") from None
    if joint and not stereo:
        raise ValueError("joint=True requires stereo=True")
    n_ch = 2 if stereo else 1
    mode = 1 if joint else 0 if stereo else 3
    bound = 12 if joint else 32        # mode_extension 2 -> bound 12
    sidx = _SAMPLE_RATES.index(sample_rate)
    n_frames = -(-len(samples) // 384)
    sig = np.concatenate([np.asarray(samples, dtype=np.float64),
                          np.zeros(n_frames * 384 - len(samples))])
    sub = _analysis(sig)                              # (hops, 32)
    frame_bytes = 4 * (12 * bitrate_kbps * 1000 // sample_rate)
    header = (0xFFF << 20 | 1 << 19 | 3 << 17 | 1 << 16 | bidx << 12
              | sidx << 10 | mode << 6 | (2 << 4 if joint else 0))
    alloc_code = nbits - 1
    out = bytearray()
    for f in range(n_frames):
        s = sub[f * 12: f * 12 + 12]                  # (12, 32)
        bits: list[int] = []

        def put(v: int, w: int):
            for j in range(w - 1, -1, -1):
                bits.append((v >> j) & 1)

        for sb in range(32):
            for _ch in range(n_ch if sb < bound else 1):
                put(alloc_code, 4)
        sf_idx = np.zeros(32, dtype=np.int64)
        for sb in range(32):
            m = np.abs(s[:, sb]).max()
            # smallest sf (largest index) still covering max|s|
            i = int(np.searchsorted(-_SCALEFACTORS, -m))
            sf_idx[sb] = min(max(i - 1, 0), 62) if m > 0 else 62
            while _SCALEFACTORS[sf_idx[sb]] < m and sf_idx[sb] > 0:
                sf_idx[sb] -= 1
        for sb in range(32):
            for _ch in range(n_ch):
                put(int(sf_idx[sb]), 6)
        full = (1 << nbits) - 1
        for g in range(12):
            for sb in range(32):
                s2 = s[g, sb] / _SCALEFACTORS[sf_idx[sb]]
                c = int(round((s2 * full + full) / 2.0))
                c = min(max(c, 0), full)
                for _ch in range(n_ch if sb < bound else 1):
                    put(c, nbits)
        payload_bits = len(bits)
        total_bits = frame_bytes * 8 - 32
        if payload_bits > total_bits:
            raise ValueError(
                f"frame overflow: {payload_bits} payload bits > "
                f"{total_bits} (raise bitrate_kbps or lower nbits)")
        bits.extend([0] * (total_bits - payload_bits))
        arr = np.array(bits, dtype=np.uint8)
        out += struct.pack(">I", header)
        out += np.packbits(arr).tobytes()
    return bytes(out)
