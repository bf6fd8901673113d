"""Baseline JPEG codec: roundtrip fidelity, sampling modes, restart
intervals, malformed-payload rejection, actor-stage dispatch."""

import numpy as np
import pyarrow as pa
import pytest

from lsh_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _gradient(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 3) % 256, (xx * 2) % 256,
                     ((yy + xx) * 2) % 256], axis=2).astype(np.uint8)


@pytest.mark.parametrize("subsample", [False, True])
@pytest.mark.parametrize("restart", [0, 3])
def test_roundtrip_gradient(subsample, restart):
    img = _gradient()
    out = decode_jpeg(encode_jpeg(img, subsample=subsample,
                                  restart_interval=restart))
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() <= 30


def test_fill_bytes_and_standalone_markers_between_segments():
    """T.81 allows 0xFF fill/padding bytes between segments and
    standalone length-less markers (TEM); real crawled JPEGs contain
    both — decode must skip them, not read a bogus segment length
    (round-5 ADVICE item)."""
    img = _gradient(24, 24)
    data = encode_jpeg(img)
    base = decode_jpeg(data)
    # splice after SOI (bytes 0-1): fill run + TEM + more fill
    padded = data[:2] + b"\xff\xff\xff" + b"\xff\x01" + b"\xff" + data[2:]
    out = decode_jpeg(padded)
    assert np.array_equal(out, base)


def test_roundtrip_flat_color_is_near_exact():
    img = np.full((16, 16, 3), 137, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert np.abs(out.astype(int) - 137).max() <= 2


def test_roundtrip_nonmultiple_of_mcu_dimensions():
    # 13x11 with 4:2:0 forces edge-padded MCUs that must crop back
    rng = np.random.default_rng(4)
    base = rng.integers(60, 196, (1, 1, 3), dtype=np.uint8)
    img = np.tile(base, (13, 11, 1)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, subsample=True))
    assert out.shape == (13, 11, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_noise_roundtrip_is_lossy_but_bounded():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    # Annex-K tables at default scale: noise is worst-case but decode
    # must stay plausibly close, not garbage
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 64


def test_rejects_malformed_payloads():
    img = _gradient(16, 16)
    data = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])          # truncated
    with pytest.raises(ValueError):
        decode_jpeg(data[:-20])                      # cut entropy data
    # progressive SOF2 is rejected, not mis-decoded
    sof0 = data.find(b"\xff\xc0")
    prog = data[:sof0] + b"\xff\xc2" + data[sof0 + 2:]
    with pytest.raises(ValueError):
        decode_jpeg(prog)


def test_restart_interval_resets_predictors():
    # identical output with and without restart markers
    img = _gradient(32, 32)
    a = decode_jpeg(encode_jpeg(img, restart_interval=0))
    b = decode_jpeg(encode_jpeg(img, restart_interval=2))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("subsample", [False, True])
def test_non_interleaved_scans_match_interleaved(subsample):
    # three single-component scans (T.81 non-interleaved order) must
    # decode identically to the one-scan interleaved file
    img = _gradient(24, 40)
    a = decode_jpeg(encode_jpeg(img, subsample=subsample))
    b = decode_jpeg(encode_jpeg(img, subsample=subsample,
                                interleaved=False))
    np.testing.assert_array_equal(a, b)


def test_non_interleaved_with_restarts_and_odd_size():
    img = _gradient(19, 21)
    a = decode_jpeg(encode_jpeg(img, subsample=True))
    b = decode_jpeg(encode_jpeg(img, subsample=True, interleaved=False,
                                restart_interval=2))
    np.testing.assert_array_equal(a, b)


def test_decode_large_image_is_not_quadratic():
    # the bit accumulator must stay bounded: a 256x256 noise image
    # (~100 KB entropy stream) decodes in well under a second
    import time
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    data = encode_jpeg(img)
    t0 = time.time()
    out = decode_jpeg(data)
    assert out.shape == (256, 256, 3)
    assert time.time() - t0 < 5.0


def test_subsampled_chroma_upsamples_to_full_size():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, :8] = (255, 0, 0)
    img[:, 8:] = (0, 0, 255)
    out = decode_jpeg(encode_jpeg(img, subsample=True))
    # strong chroma preserved on both halves away from the seam
    assert out[8, 2, 0] > 180 and out[8, 2, 2] < 80
    assert out[8, 13, 2] > 180 and out[8, 13, 0] < 80


def test_stage_dispatches_jpeg_and_matches_bmp_features():
    import gzip

    from lsh_ray.stages.multimodal import BinaryDecodeStage, encode_bmp
    img = _gradient(24, 32)
    stage = BinaryDecodeStage(use_fake_decoder=False)
    batch = pa.table({
        "doc_id": pa.array([1, 2], type=pa.uint64()),
        "payload": pa.array(
            [gzip.compress(encode_jpeg(img)), encode_bmp(img)],
            type=pa.binary()),
    })
    feats = np.stack(stage(batch)["features"].to_pylist())
    # same image through lossy JPEG vs lossless BMP: features close
    # (dims exact, channel stats within JPEG error)
    np.testing.assert_array_equal(feats[0][:3], feats[1][:3])
    assert np.abs(feats[0][3:] - feats[1][3:]).max() < 6.0
