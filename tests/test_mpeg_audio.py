"""MPEG-1 Layer I audio codec: header parse, real-bitstream round-trip
fidelity, channel modes, boundary errors, actor-stage dispatch.

The encoder produces REAL ISO-framed Layer I bitstreams (header, bit
allocation, scalefactors, quantized subband samples), so the decoder is
exercised end-to-end on the actual wire format — the same test strategy
as the JPEG codec (encode_jpeg fixtures)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from lsh_ray.stages.mpeg_audio import (FILTERBANK_DELAY, decode_mpeg1,
                                       encode_mpeg1_layer1,
                                       encode_mpeg1_layer2,
                                       parse_frame_header)


def _tone(n=11025, sr=44100):
    t = np.arange(n)
    return (0.6 * np.sin(2 * np.pi * 440 * t / sr)
            + 0.2 * np.sin(2 * np.pi * 2500 * t / sr))


def _snr_db(ref, out):
    d = FILTERBANK_DELAY
    a = ref[: len(ref) - d]
    b = out[d: d + len(a)]
    return -20 * np.log10(np.linalg.norm(b - a) / np.linalg.norm(a))


def test_roundtrip_tone_mono():
    sig = _tone()
    dec, sr = decode_mpeg1(encode_mpeg1_layer1(sig))
    assert sr == 44100
    assert len(dec) >= len(sig)
    assert _snr_db(sig, dec) > 40.0


def test_roundtrip_stereo_layout():
    sig = _tone(n=4096)
    dec, sr = decode_mpeg1(encode_mpeg1_layer1(sig, stereo=True,
                                               nbits=4))
    # 4-bit quantization: coarse but clearly the same signal
    assert sr == 44100 and _snr_db(sig, dec) > 18.0


@pytest.mark.parametrize("sr", [44100, 48000, 32000])
def test_sample_rates_survive_header(sr):
    sig = _tone(n=2000, sr=sr)
    # 48 kHz frames carry fewer bytes at fixed bitrate: 8-bit fits all
    dec, got = decode_mpeg1(encode_mpeg1_layer1(sig, sample_rate=sr,
                                                nbits=8))
    assert got == sr


def test_quantizer_depth_improves_snr():
    sig = _tone(n=4096)
    coarse = _snr_db(sig, decode_mpeg1(
        encode_mpeg1_layer1(sig, nbits=4))[0])
    fine = _snr_db(sig, decode_mpeg1(
        encode_mpeg1_layer1(sig, nbits=9))[0])
    assert fine > coarse + 10.0


def test_id3v2_tag_skipped():
    sig = _tone(n=2000)
    data = encode_mpeg1_layer1(sig)
    # minimal ID3v2 tag: "ID3", version, flags, syncsafe size 100
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) + b"\x00" * 100
    a, _ = decode_mpeg1(data)
    b, _ = decode_mpeg1(tag + data)
    assert np.array_equal(a, b)


def test_header_parse_fields():
    data = encode_mpeg1_layer1(_tone(n=500), bitrate_kbps=448)
    (word,) = struct.unpack_from(">I", data, 0)
    h = parse_frame_header(word)
    assert h["layer"] == 1 and h["bitrate"] == 448_000
    assert h["sample_rate"] == 44100 and h["mode"] == 3


def test_layer_3_raises_with_named_boundary():
    # rewrite the layer bits of a real frame header: 0b01 = III
    data = bytearray(encode_mpeg1_layer1(_tone(n=500)))
    data[1] = (data[1] & ~0b110) | (0b01 << 1)
    with pytest.raises(ValueError, match="Huffman"):
        decode_mpeg1(bytes(data))


# ------------------------------------------------------------ Layer II ----

def test_l2_roundtrip_tone_mono():
    sig = _tone(n=22050)
    dec, sr = decode_mpeg1(encode_mpeg1_layer2(sig))
    assert sr == 44100
    assert len(dec) >= len(sig)
    assert _snr_db(sig, dec) > 18.0


def test_l2_quantizer_depth_improves_snr():
    sig = _tone(n=11520)
    coarse = _snr_db(sig, decode_mpeg1(
        encode_mpeg1_layer2(sig, max_steps=3, bitrate_kbps=96))[0])
    fine = _snr_db(sig, decode_mpeg1(
        encode_mpeg1_layer2(sig, max_steps=511, bitrate_kbps=384))[0])
    assert fine > 45.0 and fine > coarse + 15.0


def test_l2_stereo_layout():
    sig = _tone(n=8192)
    dec, sr = decode_mpeg1(encode_mpeg1_layer2(sig, stereo=True,
                                               bitrate_kbps=384))
    assert sr == 44100 and _snr_db(sig, dec) > 18.0


@pytest.mark.parametrize("sr,kbps,max_steps", [
    (44100, 192, 15),    # Table B.2b (>= 96 kbit/s/ch at 44.1 kHz)
    (48000, 192, 15),    # Table B.2a (48 kHz)
    (32000, 192, 15),    # Table B.2b (32 kHz high-rate)
    (44100, 48, 9),      # Table B.2c (low-rate, grouped 9-step class)
    (32000, 48, 5),      # Table B.2d (32 kHz low-rate, grouped)
])
def test_l2_all_allocation_tables_roundtrip(sr, kbps, max_steps):
    sig = _tone(n=5760, sr=sr)
    dec, got = decode_mpeg1(encode_mpeg1_layer2(
        sig, sample_rate=sr, bitrate_kbps=kbps, max_steps=max_steps))
    assert got == sr
    assert _snr_db(sig, dec) > 10.0


def test_l2_scfsi_sharing_paths_roundtrip():
    """An amplitude ramp makes the three scalefactor parts differ, so
    the adaptive encoder emits scfsi 0/1/3 alongside 2; the decoded
    signal must still track the original."""
    sr = 44100
    t = np.arange(11520)
    sig = np.linspace(0.05, 0.9, len(t)) * np.sin(2 * np.pi * 440 * t / sr)
    from lsh_ray.stages.mpeg_audio import _read_bits_vec
    data = encode_mpeg1_layer2(sig, bitrate_kbps=384, max_steps=63)
    dec, _ = decode_mpeg1(data)
    assert _snr_db(sig, dec) > 25.0
    # at least two distinct scfsi codes must appear in the first frame
    # (B.2b mono: allocation = 94 bits after the 32-bit header)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8)[:700]) \
        .astype(np.int64)
    pos = 32 + 3 * 4 + 8 * 4 + 12 * 3 + 7 * 2
    codes = {int(_read_bits_vec(bits, np.array([pos + 2 * i]), 2)[0])
             for i in range(30)}
    assert len(codes) >= 2


def test_l2_sblimit_respected():
    """Low-rate Table B.2c streams carry only 8 subbands; content above
    the sblimit must decode to (filterbank-shaped) near-silence even
    though the source had energy there."""
    sr = 44100
    t = np.arange(5760)
    hi = 0.5 * np.sin(2 * np.pi * 15000 * t / sr)     # subband ~21
    dec, _ = decode_mpeg1(encode_mpeg1_layer2(
        hi, sample_rate=sr, bitrate_kbps=48, max_steps=9))
    assert np.abs(dec).max() < 0.05


def test_l1_joint_stereo_roundtrip():
    """Joint (intensity) stereo: shared allocation + sample codes above
    the bound, per-channel scalefactors — the broadcast channel mode."""
    sig = _tone(n=8192)
    data = encode_mpeg1_layer1(sig, stereo=True, joint=True, nbits=6)
    (word,) = struct.unpack_from(">I", data, 0)
    h = parse_frame_header(word)
    assert h["mode"] == 1 and h["mode_extension"] == 2
    dec, sr = decode_mpeg1(data)
    assert sr == 44100 and _snr_db(sig, dec) > 25.0
    # shared codes above the bound: the joint payload fits the frame
    # at a quantizer depth where full stereo overflows it
    with pytest.raises(ValueError, match="overflow"):
        encode_mpeg1_layer1(sig, stereo=True, nbits=6)


def test_l2_joint_stereo_roundtrip():
    sig = _tone(n=11520)
    data = encode_mpeg1_layer2(sig, stereo=True, joint=True,
                               bitrate_kbps=320, max_steps=15)
    (word,) = struct.unpack_from(">I", data, 0)
    h = parse_frame_header(word)
    assert h["mode"] == 1 and h["layer"] == 2
    dec, sr = decode_mpeg1(data)
    assert sr == 44100 and _snr_db(sig, dec) > 18.0


def test_l2_stereo_equals_mono_on_duplicated_channels():
    """A stereo stream carrying the same signal on both channels must
    decode (mono-averaged) to exactly the mono stream's output."""
    sig = _tone(n=5760)
    a, _ = decode_mpeg1(encode_mpeg1_layer2(sig, bitrate_kbps=192))
    b, _ = decode_mpeg1(encode_mpeg1_layer2(sig, stereo=True,
                                            bitrate_kbps=384))
    assert np.allclose(a, b[: len(a)], atol=1e-12)


def test_l2_allocation_table_invariants():
    """Structural ISO 11172-3 invariants of the transcribed B.2 tables
    (guards transcription slips that a shared-table round trip cannot
    catch): sblimits 27/30/8/12, nbal in {2,3,4}, strictly increasing
    steps per row, every row starting at 3 steps, class counts filling
    the nbal code space minus the zero code."""
    from lsh_ray.stages.mpeg_audio import _L2_TABLES, _l2_table_name
    assert {k: len(v) for k, v in _L2_TABLES.items()} == {
        "B.2a": 27, "B.2b": 30, "B.2c": 8, "B.2d": 12}
    for name, rows in _L2_TABLES.items():
        for nbal, steps in rows:
            assert nbal in (2, 3, 4)
            assert steps[0] == 3 and steps[-1] in (127, 32767, 65535)
            assert all(a < b for a, b in zip(steps, steps[1:]))
            # every row fills its nbal code space exactly (codes 1..
            # 2^nbal-1 select a class; 0 = silent) — this caught a
            # 16-class transcription of the B.2c/d row 0-1 list
            assert len(steps) == (1 << nbal) - 1
            assert all(s in (3, 5, 9) or (s + 1) & s == 0
                       for s in steps)   # grouped or 2^nb - 1
    # selection rule: low rate -> C (D at 32 kHz); mid -> A; high ->
    # B except at 48 kHz
    assert _l2_table_name(44100, 48_000, 1) == "B.2c"
    assert _l2_table_name(32000, 96_000, 2) == "B.2d"
    assert _l2_table_name(48000, 64_000, 1) == "B.2a"
    assert _l2_table_name(44100, 80_000, 1) == "B.2a"
    assert _l2_table_name(44100, 192_000, 1) == "B.2b"
    assert _l2_table_name(48000, 384_000, 2) == "B.2a"
    assert _l2_table_name(32000, 192_000, 1) == "B.2b"


def test_l2_header_and_frame_size():
    data = encode_mpeg1_layer2(_tone(n=1152), bitrate_kbps=192)
    (word,) = struct.unpack_from(">I", data, 0)
    h = parse_frame_header(word)
    assert h["layer"] == 2 and h["bitrate"] == 192_000
    assert len(data) == 144 * 192_000 // 44100


def test_malformed_payloads_raise():
    with pytest.raises(ValueError):
        decode_mpeg1(b"\x00\x01\x02\x03" * 100)
    data = bytearray(encode_mpeg1_layer1(_tone(n=500)))
    data[2] |= 0xF0                   # bitrate index 15: forbidden
    with pytest.raises(ValueError):
        decode_mpeg1(bytes(data))


def test_corrupt_allocation_raises_valueerror_not_indexerror():
    """A frame with a valid header whose allocation nibbles demand more
    bits than the frame carries must raise the module's contractual
    ValueError (skip-on-fail wrappers catch ValueError), never a raw
    numpy IndexError."""
    # 32 kbps mono Layer I at 44.1 kHz: 4*(12*32000//44100) = 32 bytes
    header = (0xFFF << 20 | 1 << 19 | 3 << 17 | 1 << 16 | 1 << 12
              | 0 << 10 | 3 << 6)
    frame = struct.pack(">I", header) + b"\xee" * 28   # alloc=14 -> nb 15
    with pytest.raises(ValueError, match="exceeds the frame payload"):
        decode_mpeg1(frame)


def test_truncated_final_frame_is_dropped_not_fatal():
    sig = _tone(n=3 * 384)
    data = encode_mpeg1_layer1(sig)
    dec_full, _ = decode_mpeg1(data)
    dec_cut, _ = decode_mpeg1(data[:-10])
    assert len(dec_cut) == len(dec_full) - 384


def test_stage_dispatches_mpeg_audio(ray_session):
    """BinaryDecodeStage routes MPEG sync bytes to the native decoder
    and emits the standard 16-dim audio feature vector."""
    import ray.data

    from lsh_ray.stages.multimodal import (BinaryDecodeStage,
                                           decode_binary)
    sig = _tone(n=4096)
    payload = encode_mpeg1_layer1(sig)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "payload": pa.array([payload], type=pa.binary()),
    }))
    out = decode_binary(ds).to_pandas()
    feats = np.asarray(out.features.iloc[0], dtype=np.float32)
    assert feats.shape == (16,)
    assert feats[1] == 44100.0          # sample_rate feature slot
    assert feats[3] > 0.1               # RMS of a -4 dBFS-ish tone
    # parity with the in-process decode path
    direct = BinaryDecodeStage()._decode_one(payload)
    assert np.allclose(feats, direct)
