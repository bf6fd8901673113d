"""Tests for the operator family: dedup variants, text stats, tfidf,
windows, similarity, multimodal plumbing, bucket join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data
    return ray.data


def test_bucket_join_basic(rd):
    from lsh_ray.stages.join import bucket_join
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 99], type=pa.uint64()),
        "x": ["a", "b", "c", "d"]}))
    right = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], type=pa.uint64()),
        "payload": pa.array([[1, 2], [3], [], [9]],
                            type=pa.list_(pa.uint64()))}))
    out = bucket_join(left, right, "k", "id", ["payload"],
                      suffix="_r", num_buckets=4).to_pandas()
    assert len(out) == 3  # 99 has no match (inner join)
    got = {row.k: list(row.payload_r) for row in out.itertuples()}
    assert got == {1: [1, 2], 2: [3], 3: []}


def test_bucket_join_string_keys(rd):
    from lsh_ray.stages.join import bucket_join
    left = rd.from_items([{"token": "foo", "n": 1}, {"token": "bar", "n": 2}])
    right = rd.from_items([{"token": "foo", "df": 10},
                           {"token": "baz", "df": 5}])
    out = bucket_join(left, right, "token", "token", ["df"],
                      num_buckets=4).to_pandas()
    assert len(out) == 1
    assert out.iloc[0].token == "foo" and out.iloc[0].df == 10


def test_exact_dedup(rd):
    from lsh_ray.stages.dedup import exact_dup_groups
    ds = rd.from_items([
        {"doc_id": 1, "text": "same text"},
        {"doc_id": 2, "text": "same text"},
        {"doc_id": 3, "text": "other"},
    ])
    out = exact_dup_groups(ds).to_pandas()
    assert len(out) == 2
    dup = out[out.n_docs == 2].iloc[0]
    assert dup.rep_doc_id == 1


def test_simhash_near_dups(rd):
    from lsh_ray.config import PipelineConfig
    from lsh_ray.stages.dedup import simhash_near_dup_pairs
    cfg = PipelineConfig()
    sigs = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 20, 30], type=pa.uint64()),
        "simhash": pa.array([0xFFFF0000FFFF0000, 0xFFFF0000FFFF0001,
                             0x1234567812345678], type=pa.uint64()),
    }))
    out = simhash_near_dup_pairs(sigs, cfg).to_pandas()
    assert len(out) == 1
    assert {out.iloc[0].doc_a, out.iloc[0].doc_b} == {10, 20}
    assert out.iloc[0].hamming == 1


def test_knn_brute_force_matches_numpy(rd):
    from lsh_ray.stages.similarity import knn_brute_force
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((100, 16)).astype(np.float32)
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(100), type=pa.int64()),
        "embedding": pa.array([list(v) for v in vecs],
                              type=pa.list_(pa.float32()))}))
    q = vecs[:2].astype(np.float64)
    out = knn_brute_force(emb, q, np.array([0, 1]), k=5).to_pandas()
    # numpy oracle
    vn = vecs.astype(np.float64)
    vn = vn / np.linalg.norm(vn, axis=1, keepdims=True)
    sims = vn @ vn[:2].T
    for qid in (0, 1):
        s = sims[:, qid].copy()
        s[qid] = -np.inf
        expect = set(np.argsort(-s)[:5].tolist())
        got = set(out[out.query_id == qid].neighbor_id.tolist())
        assert got == expect, (qid, got, expect)


def test_knn_lsh_high_recall_on_clustered_data(rd):
    from lsh_ray.stages.similarity import knn_brute_force, knn_lsh
    rng = np.random.default_rng(6)
    centers = rng.standard_normal((5, 32)) * 5
    pts = np.concatenate([c + rng.standard_normal((40, 32)) * 0.3
                          for c in centers]).astype(np.float32)
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(pts)), type=pa.int64()),
        "embedding": pa.array([list(v) for v in pts],
                              type=pa.list_(pa.float32()))}))
    q = pts[:3].astype(np.float64)
    ids = np.array([0, 1, 2])
    bf = knn_brute_force(emb, q, ids, k=10).to_pandas()
    al = knn_lsh(emb, q, ids, dim=32, k=10).to_pandas()
    recalls = []
    for qid in ids:
        truth = set(bf[bf.query_id == qid].neighbor_id)
        got = set(al[al.query_id == qid].neighbor_id)
        recalls.append(len(truth & got) / len(truth))
    assert np.mean(recalls) >= 0.8, recalls


def test_tumbling_windows(rd):
    from lsh_ray.stages.windows import tumbling_window_counts
    ts = pa.array([0, 1800_000_000, 3600_000_000, 3605_000_000],
                  type=pa.timestamp("us"))
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2]), "ts": ts,
        "value": pa.array([1.0, 2.0, 3.0, 4.0])}))
    out = tumbling_window_counts(ev, 3600).to_pandas().sort_values(
        ["user_id", "window_start"]).reset_index(drop=True)
    assert out.n_events.tolist() == [2, 1, 1]
    assert out.max_value.tolist() == [2.0, 3.0, 4.0]


def test_sessionize(rd):
    from lsh_ray.stages.windows import sessionize
    ts = pa.array([0, 60_000_000, 10_000_000_000], type=pa.timestamp("us"))
    ev = rd.from_arrow(pa.table({"user_id": pa.array([1, 1, 1]), "ts": ts}))
    out = sessionize(ev, gap_s=1800).to_pandas()
    assert len(out) == 2
    assert sorted(out.n_events.tolist()) == [1, 2]


@pytest.mark.parametrize("plan", ["single", "two_phase"])
def test_sessionize_matches_bruteforce(rd, plan):
    """BOTH sessionization plans == single-pass per-user oracle on random
    events whose gaps straddle the phase-A time-bucket boundaries (the
    auto dispatcher picks between them by stream size)."""
    from lsh_ray.stages.windows import sessionize
    rng = np.random.default_rng(7)
    n = 5000
    users = rng.integers(0, 40, n)
    # gaps cluster around the 1800 s threshold and the bucket span
    ts_s = np.sort(rng.integers(0, 3_000_000, n))
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array(users, type=pa.int64()),
        "ts": pa.array(ts_s * 1_000_000, type=pa.timestamp("us"))}))
    out = sessionize(ev, gap_s=1800, plan=plan).to_pandas()
    # brute-force oracle
    import pandas as pd
    df = pd.DataFrame({"u": users, "s": ts_s}).sort_values(["u", "s"])
    brk = (df.u.diff().ne(0) | (df.s.diff() > 1800)).cumsum()
    oracle = df.groupby(brk).agg(u=("u", "first"), start=("s", "min"),
                                 end=("s", "max"), n=("s", "size"))
    got = out.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    exp = oracle.sort_values(["u", "start"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got.user_id.to_numpy() == exp.u.to_numpy()).all()
    assert (got.session_start.astype("int64").to_numpy() // 10**6
            == exp.start.to_numpy()).all()
    assert (got.session_end.astype("int64").to_numpy() // 10**6
            == exp.end.to_numpy()).all()
    assert (got.n_events.to_numpy() == exp.n.to_numpy()).all()


def test_sessionize_hot_user(rd):
    """A single pathological user (1M continuous events) must neither
    land on one worker as one giant group nor break session semantics:
    every event within the gap => exactly ONE session spanning all of
    them, merged across many phase-A buckets. Forced onto the two-phase
    plan — at production scale the auto dispatcher selects it, and this
    is the plan whose skew-safety the test exists to prove."""
    from lsh_ray.stages.windows import sessionize
    n = 1_000_000
    step = 600  # 10 min < gap; session never breaks
    ts_s = np.arange(n, dtype=np.int64) * step
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array(np.full(n, 7), type=pa.int64()),
        "ts": pa.array(ts_s * 1_000_000, type=pa.timestamp("us"))}))
    out = sessionize(ev, gap_s=1800, plan="two_phase").to_pandas()
    assert len(out) == 1
    assert int(out.n_events.iloc[0]) == n
    assert int(out.session_start.astype("int64").iloc[0]) == 0
    assert (int(out.session_end.astype("int64").iloc[0]) // 10**6
            == (n - 1) * step)


def test_multimodal_fake_decode(rd):
    from lsh_ray.stages.multimodal import decode_binary
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.uint64()),
        "payload": pa.array([b"hello world", b"other bytes"],
                            type=pa.binary()),
        "mime": ["image/png", "image/jpeg"],
    }))
    out = decode_binary(ds, use_fake_decoder=True).to_pandas()
    assert len(out) == 2
    assert out.n_bytes.tolist() == [11, 11]
    assert all(len(f) == 16 for f in out.features)
    # deterministic
    out2 = decode_binary(ds, use_fake_decoder=True).to_pandas()
    assert np.allclose(np.stack(out.features.values),
                       np.stack(out2.features.values))


def test_multimodal_codec_boundaries():
    # MPEG audio now routes to the native Layer I decoder; a bogus
    # "ID3"-tagged payload with no sync word is a decode ERROR, as is
    # malformed JPEG; an unrecognized format hits the declared
    # NotImplementedError boundary
    from lsh_ray.stages.multimodal import BinaryDecodeStage
    stage = BinaryDecodeStage(use_fake_decoder=False)
    with pytest.raises(ValueError):
        stage._decode_one(b"ID3\x04\x00\x00\x00\x00\x00\x00not audio")
    with pytest.raises(ValueError):
        stage._decode_one(b"\xff\xd8\xff\xe0jpeg payload")
    with pytest.raises(NotImplementedError):
        stage._decode_one(b"\x00unknown format payload")


def test_png_roundtrip_all_filters_and_color_types():
    import zlib
    from lsh_ray.stages.multimodal import (_PNG_SIG, decode_png, encode_png)
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    # filter-0 round-trip through our encoder
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)

    # every filter type decodes correctly: re-filter the known image by
    # hand per the spec, then assert decode recovers it
    import struct as _s

    def chunk(ctype, data):
        return (_s.pack(">I", len(data)) + ctype + data
                + _s.pack(">I", zlib.crc32(ctype + data)))

    h, w = img.shape[:2]
    stride = w * 3
    flat = img.reshape(h, stride).astype(np.int32)
    rows = []
    for y in range(h):
        ftype = y % 5
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
        upleft = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - ((left + prev) >> 1)
        else:  # Paeth predictor
            p = left + prev - upleft
            pa_, pb_, pc_ = (abs(p - left), abs(p - prev), abs(p - upleft))
            pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                            np.where(pb_ <= pc_, prev, upleft))
            filt = cur - pred
        rows.append(bytes([ftype]) + (filt & 0xFF).astype(np.uint8).tobytes())
    ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (_PNG_SIG + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(b"".join(rows)))
               + chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(payload), img)

    # grayscale / RGBA / palette color types
    def repack(color_type, px_bytes, plte=None):
        ihdr = _s.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        raw = b"".join(b"\x00" + px_bytes[y] for y in range(h))
        body = chunk(b"IHDR", ihdr)
        if plte is not None:
            body += chunk(b"PLTE", plte)
        return (_PNG_SIG + body + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    gray = img[:, :, 0]
    out = decode_png(repack(0, [gray[y].tobytes() for y in range(h)]))
    np.testing.assert_array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))

    rgba = np.dstack([img, np.full((h, w), 7, np.uint8)])
    out = decode_png(repack(6, [rgba[y].tobytes() for y in range(h)]))
    np.testing.assert_array_equal(out, img)

    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
    out = decode_png(repack(3, [idx[y].tobytes() for y in range(h)],
                            plte=pal.tobytes()))
    np.testing.assert_array_equal(out, pal[idx])


def test_png_rejects_malformed_variants():
    import struct as _s
    from lsh_ray.stages.multimodal import decode_png, encode_png
    img = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    good = encode_png(img)
    with pytest.raises(ValueError):
        decode_png(b"nonsense")
    # interlaced flag rejected, not mis-decoded
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1  # IHDR interlace byte
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    # truncated chunk: declared IDAT length exceeds payload
    with pytest.raises(ValueError):
        decode_png(good[:len(good) - 20])
    # 16-bit depth rejected
    bad = bytearray(good)
    bad[8 + 8 + 8] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    # pixel stream shorter than IHDR promises
    import zlib
    h, w = 4, 5
    short = zlib.compress(b"\x00" + bytes(w * 3))  # one row, IHDR says 4

    def chunk(ctype, data):
        return (_s.pack(">I", len(data)) + ctype + data
                + _s.pack(">I", zlib.crc32(ctype + data)))
    from lsh_ray.stages.multimodal import _PNG_SIG
    ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with pytest.raises(ValueError):
        decode_png(_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", short)
                   + chunk(b"IEND", b""))


def test_multimodal_real_png_decode_end_to_end(rd):
    # gzip-wrapped PNG payloads decode through the actor-pool stage and
    # match the BMP decode of the identical image (shared feature kernel)
    import gzip
    from lsh_ray.stages.multimodal import (
        BinaryDecodeStage, encode_bmp, encode_png)
    rng = np.random.default_rng(29)
    imgs = [rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
            for _ in range(4)]
    stage = BinaryDecodeStage(use_fake_decoder=False)
    png_batch = pa.table({
        "doc_id": pa.array(range(4), type=pa.uint64()),
        "payload": pa.array([gzip.compress(encode_png(i)) for i in imgs],
                            type=pa.binary()),
    })
    bmp_batch = pa.table({
        "doc_id": pa.array(range(4), type=pa.uint64()),
        "payload": pa.array([encode_bmp(i) for i in imgs],
                            type=pa.binary()),
    })
    png_feats = np.stack(stage(png_batch)["features"].to_pylist())
    bmp_feats = np.stack(stage(bmp_batch)["features"].to_pylist())
    np.testing.assert_allclose(png_feats, bmp_feats)


def test_hash_split_and_sample_deterministic(rd):
    import hashlib
    import ray
    from lsh_ray.stages.sampling import assign_split, hash_sample
    ids = list(range(1000))
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(
        ids, type=pa.int64()), "n_chars": pa.array(ids, type=pa.int64())}))
    out = assign_split(ds).to_pandas().sort_values("doc_id")
    # pure function of the key: recompute by hand
    expect = []
    for i in ids:
        b = hashlib.md5(str(i).encode()).hexdigest()[:2]
        expect.append("train" if b < "cc" else ("val" if b < "e6"
                                                else "test"))
    assert out["split"].tolist() == expect
    # proportions land near 80/10/10 (md5 uniformity)
    counts = out["split"].value_counts()
    assert 0.75 < counts["train"] / 1000 < 0.85
    # second run identical (no RNG state)
    out2 = assign_split(ds).to_pandas().sort_values("doc_id")
    assert out2["split"].tolist() == expect

    sampled = hash_sample(ds, "80").to_pandas()  # exactly buckets < 128
    kept = {i for i in ids
            if hashlib.md5(str(i).encode()).hexdigest()[:2] < "80"}
    assert set(sampled["doc_id"]) == kept
    assert list(sampled.columns) == ["doc_id", "n_chars"]
    with pytest.raises(ValueError):
        hash_sample(ds, "abc")


def test_bmp_roundtrip_and_variants():
    from lsh_ray.stages.multimodal import decode_bmp, encode_bmp
    rng = np.random.default_rng(11)
    # odd width exercises the 4-byte row padding
    img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)
    with pytest.raises(ValueError):
        decode_bmp(b"nonsense")
    # compressed / non-24bpp variants are rejected, not mis-decoded
    bad = bytearray(encode_bmp(img))
    bad[28] = 32  # bpp field
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))


def test_wav_roundtrip_and_variants():
    from lsh_ray.stages.multimodal import decode_wav, encode_wav
    t = np.arange(1600, dtype=np.float64) / 16000.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out, rate = decode_wav(encode_wav(sig, 16000))
    assert rate == 16000
    np.testing.assert_allclose(out, sig, atol=2 / 32768)
    with pytest.raises(ValueError):
        decode_wav(b"nonsense")
    # non-PCM encodings are rejected, not mis-decoded
    bad = bytearray(encode_wav(sig))
    bad[20] = 3  # fmt: IEEE float
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_wav_chunk_walk_and_stereo_downmix():
    import struct as _s

    from lsh_ray.stages.multimodal import decode_wav
    # stereo PCM with a LIST chunk BEFORE fmt/data: the chunk walk must
    # skip it (fmt need not be the first chunk after RIFF)
    left = np.array([1000, -2000, 3000], dtype=np.int16)
    right = np.array([3000, 2000, -1000], dtype=np.int16)
    inter = np.empty(6, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    data = inter.tobytes()
    body = (_s.pack("<4sI", b"LIST", 5) + b"INFO\x00" + b"\x00"  # odd+pad
            + _s.pack("<4sIHHIIHH", b"fmt ", 16, 1, 2, 8000, 32000, 4, 16)
            + _s.pack("<4sI", b"data", len(data)) + data)
    payload = _s.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    out, rate = decode_wav(payload)
    assert rate == 8000
    np.testing.assert_allclose(
        out, (left.astype(np.float32) + right) / 2 / 32768.0, atol=1e-7)


def test_multimodal_real_wav_decode_end_to_end(rd):
    # the decode stage runs the REAL numpy WAV kernel alongside BMP
    # payloads in the SAME batch (per-row magic dispatch)
    from lsh_ray.stages.multimodal import (audio_features, decode_binary,
                                           encode_bmp, encode_wav)
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    sig = rng.standard_normal(8000).astype(np.float32) * 0.1
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.uint64()),
        "payload": pa.array([encode_wav(sig, 8000), encode_bmp(img)],
                            type=pa.binary()),
        "mime": ["audio/wav", "image/bmp"],
    }))
    out = decode_binary(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    feats = np.stack(out.features.values)
    assert feats.shape == (2, 16)
    # wav row: n_samples, rate, duration lead the feature vector
    assert feats[0][0] == 8000 and feats[0][1] == 8000
    assert abs(feats[0][2] - 1.0) < 1e-6
    # features are computed on the QUANTIZED samples (what decode returns)
    dec = np.round(np.clip(sig, -1, 1) * 32767).astype(np.int16)
    expect = audio_features(dec.astype(np.float32) / 32768.0, 8000)
    np.testing.assert_allclose(feats[0], expect, rtol=1e-6)


def test_resize_nearest_and_features():
    from lsh_ray.stages.multimodal import image_features, resize_nearest
    img = np.zeros((32, 64, 3), dtype=np.uint8)
    img[:, 32:, 0] = 200  # right half red
    small = resize_nearest(img, 8, 8)
    assert small.shape == (8, 8, 3)
    assert small[:, :4].max() == 0 and small[:, 4:, 0].min() == 200
    feat = image_features(img)
    assert feat.shape == (16,) and feat.dtype == np.float32
    assert feat[0] == 32 and feat[1] == 64 and feat[2] == 2.0
    # mean red channel of the thumbnail is ~half of 200
    assert abs(feat[4] - 100.0) < 1.0


def test_multimodal_real_bmp_decode_end_to_end(rd):
    # the decode stage runs the REAL numpy BMP kernel (no fake flag)
    from lsh_ray.stages.multimodal import decode_binary, encode_bmp
    rng = np.random.default_rng(12)
    imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in [(6, 9), (16, 16), (3, 21)]]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.uint64()),
        "payload": pa.array([encode_bmp(i) for i in imgs],
                            type=pa.binary()),
        "mime": ["image/bmp"] * 3,
    }))
    out = decode_binary(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert len(out) == 3
    feats = np.stack(out.features.values)
    assert feats.shape == (3, 16)
    # first two features are the true (h, w) of each image
    assert [tuple(f[:2].astype(int)) for f in feats] == [
        (6, 9), (16, 16), (3, 21)]


def test_tfidf_reference_formula(rd):
    """TF-IDF matches the reference formula tf/len * log2(N/df)
    (song_tfidf_calculation.py:82-186 semantics)."""
    from lsh_ray.stages.tfidf import tfidf
    ds = rd.from_items([
        {"doc_id": 1, "text": "a a b"},
        {"doc_id": 2, "text": "a c"},
    ])
    out = tfidf(ds).to_pandas()
    got = {(r.doc_id, r.token): r.tfidf for r in out.itertuples()}
    assert got[(1, "a")] == 0.0  # df=2, N=2 -> idf 0
    assert abs(got[(1, "b")] - round((1 / 3) * np.log2(2), 6)) < 1e-9
    assert abs(got[(2, "c")] - round((1 / 2) * np.log2(2), 6)) < 1e-9


def test_metrics_reference_parity():
    from lsh_ray.functions.metrics import (confidence_measurement,
                                           mean_absolute_error,
                                           mean_reciprocal_rank,
                                           normalize_distance_to_similarity,
                                           root_mean_squared_error)
    assert mean_reciprocal_rank(np.array([1, 2, 0])) == pytest.approx(
        (1 + 0.5 + 0) / 3)
    # equal distances -> confidence exactly 1
    assert confidence_measurement(np.array([2.0, 2.0, 2.0])) == 1.0
    # smaller relative distance -> lower confidence for index 0
    assert confidence_measurement(np.array([1.0, 10.0, 10.0])) < 1.0
    assert mean_absolute_error(np.array([1, 2]), np.array([2, 4])) == 1.5
    assert root_mean_squared_error(np.array([0, 0]), np.array([3, 4])) == \
        pytest.approx(np.sqrt(12.5))
    s = normalize_distance_to_similarity(np.array([0.0, 1.0, 1e9]))
    assert s[0] == 100.0
    assert s[1] == pytest.approx(np.e - 1)
    assert s[2] == pytest.approx(0.0, abs=1e-6)


def test_lang_id(rd):
    from lsh_ray.stages.text_stats import lang_id
    ds = rd.from_items([
        {"doc_id": 1, "text": "the cat and the dog of a house is it"},
        {"doc_id": 2, "text": "der hund und die katze mit dem haus"},
        {"doc_id": 3, "text": "o gato e que de um para com mais"},
    ])
    out = lang_id(ds).to_pandas().sort_values("doc_id")
    assert out.lang_pred.tolist() == ["en", "de", "pt"]


def test_embedding_near_dup_recall_vs_bruteforce(rd):
    """SRP multi-band path must recover noisy planted near-dup pairs
    (cosine ~0.98, NOT bit-identical signatures) found by the exact
    all-pairs oracle (reference analog: candidate verification,
    matching_algorithms.py:319-386)."""
    from lsh_ray.config import PipelineConfig
    from lsh_ray.stages.dedup import embedding_near_dup_pairs
    rng = np.random.default_rng(7)
    dim, n_base, n_planted = 32, 150, 25
    base = rng.standard_normal((n_base, dim))
    noisy = base[:n_planted] + rng.standard_normal(
        (n_planted, dim)) * 0.12  # cosine ~0.97-0.99 vs the original
    vecs = np.concatenate([base, noisy]).astype(np.float32)
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([list(v) for v in vecs],
                              type=pa.list_(pa.float32()))}))
    thresh = 0.9
    out = embedding_near_dup_pairs(
        emb, dim=dim, config=PipelineConfig(), cosine_threshold=thresh,
        round_to=None).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(out.vec_a, out.vec_b)}
    # exact oracle
    v64 = vecs.astype(np.float64)
    vn = v64 / np.linalg.norm(v64, axis=1, keepdims=True)
    sims = vn @ vn.T
    iu, ju = np.triu_indices(len(vecs), k=1)
    truth = {(int(a), int(b))
             for a, b in zip(iu[sims[iu, ju] >= thresh],
                             ju[sims[iu, ju] >= thresh])}
    assert len(truth) >= n_planted  # the plant worked
    assert not (got - truth)       # exact verify => no false positives
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, (recall, len(truth))


def test_bucket_join_many_to_many_and_outer(rd):
    """General join path (unique_right=False): duplicate right keys fan
    out (cartesian per key); full-outer emits both unmatched sides."""
    import pandas as pd

    from lsh_ray.stages.join import bucket_join
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 7], type=pa.uint64()),
        "x": ["a", "b", "c", "d"]}))
    right = rd.from_arrow(pa.table({
        "id": pa.array([1, 1, 2, 9], type=pa.uint64()),
        "v": pa.array([10, 11, 20, 90])}))
    inner = bucket_join(left, right, "k", "id", ["v"], suffix="_r",
                        num_buckets=4, unique_right=False).to_pandas()
    got = sorted((int(r.k), r.x, int(r.v_r)) for r in inner.itertuples())
    assert got == [(1, "a", 10), (1, "a", 11), (1, "b", 10), (1, "b", 11),
                   (2, "c", 20)]
    outer = bucket_join(left, right, "k", "id", ["v"], suffix="_r",
                        num_buckets=4, how="outer",
                        unique_right=False).to_pandas()
    assert len(outer) == 7  # 5 matches + left-miss k=7 + right-miss id=9
    miss_l = outer[outer.k == 7]
    assert len(miss_l) == 1 and pd.isna(miss_l.v_r.iloc[0])
    miss_r = outer[outer.v_r == 90]
    assert len(miss_r) == 1 and pd.isna(miss_r.k.iloc[0])


def test_knn_ivf_exhaustive_probe_equals_brute_force(rd):
    # nprobe == n_cells: the probe set covers every cell, so IVF must
    # reproduce exact search bit-for-bit (the oracle configuration)
    from lsh_ray.stages.similarity import knn_brute_force, knn_ivf
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((150, 16)).astype(np.float32)
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(150), type=pa.int64()),
        "embedding": pa.array([list(v) for v in vecs],
                              type=pa.list_(pa.float32()))}))
    q = vecs[:3].astype(np.float64)
    ids = np.array([0, 1, 2])
    bf = knn_brute_force(emb, q, ids, k=8).to_pandas()
    iv = knn_ivf(emb, q, ids, k=8, n_cells=8, nprobe=8,
                 round_to=6).to_pandas()
    cols = ["query_id", "neighbor_id", "cosine"]
    bf = bf[cols].sort_values(cols).reset_index(drop=True)
    iv = iv[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(bf, iv)


def test_knn_ivf_partial_probe_recall_on_clustered_data(rd):
    # production configuration: nprobe << n_cells. On cluster-structured
    # data the query's own cell holds its neighbors -> high recall while
    # scoring only a fraction of the corpus.
    from lsh_ray.stages.similarity import knn_brute_force, knn_ivf
    rng = np.random.default_rng(8)
    centers = rng.standard_normal((6, 32)) * 5
    pts = np.concatenate([c + rng.standard_normal((40, 32)) * 0.3
                          for c in centers]).astype(np.float32)
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(pts)), type=pa.int64()),
        "embedding": pa.array([list(v) for v in pts],
                              type=pa.list_(pa.float32()))}))
    q = pts[[0, 40, 80]].astype(np.float64)
    ids = np.array([0, 40, 80])
    bf = knn_brute_force(emb, q, ids, k=10).to_pandas()
    iv = knn_ivf(emb, q, ids, k=10, n_cells=12, nprobe=3).to_pandas()
    recalls = []
    for qid in ids:
        truth = set(bf[bf.query_id == qid].neighbor_id)
        got = set(iv[iv.query_id == qid].neighbor_id)
        recalls.append(len(truth & got) / len(truth))
    assert np.mean(recalls) >= 0.8, recalls


def test_knn_ivf_recall_floor_matches_sweep_curve(rd):
    """Pytest floor for the BASELINE.md ANN recall curve: the exact
    generator scripts/ann_recall_sweep.py uses (256 Gaussian clusters,
    sigma 0.18, seed 42) at 20k vectors must hold recall@10 >= 0.85 at
    nprobe=16/n_cells=64 — the sweep's documented 0.90-at-0.43x-cost
    operating point, minus small-scale noise margin."""
    from lsh_ray.stages.similarity import knn_brute_force, knn_ivf
    n, dim = 20_000, 64
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((256, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, 256, size=n)
    pts = (centers[assign]
           + 0.18 * rng.standard_normal((n, dim))).astype(np.float32)
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(pts.reshape(-1), type=pa.float32()), dim)}))
    ids = np.arange(0, n, n // 25, dtype=np.int64)[:25]
    q = pts[ids].astype(np.float64)
    bf = knn_brute_force(emb, q, ids, k=10).to_pandas()
    iv = knn_ivf(emb, q, ids, k=10, n_cells=64, nprobe=16).to_pandas()
    recalls = []
    for qid in ids:
        truth = set(bf[bf.query_id == qid].neighbor_id)
        got = set(iv[iv.query_id == qid].neighbor_id)
        recalls.append(len(truth & got) / len(truth))
    assert np.mean(recalls) >= 0.85, np.mean(recalls)


def test_ivf_centroids_deterministic_and_unit_norm():
    from lsh_ray.stages.similarity import train_ivf_centroids
    rng = np.random.default_rng(9)
    sample = rng.standard_normal((500, 16))
    c1 = train_ivf_centroids(sample, n_cells=8, seed=3)
    c2 = train_ivf_centroids(sample, n_cells=8, seed=3)
    np.testing.assert_array_equal(c1, c2)
    assert c1.shape == (8, 16)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, rtol=1e-9)


def test_hopping_windows(rd):
    from lsh_ray.stages.windows import hopping_window_counts
    # events at t=0s, 1800s, 3600s for user 1; windows are 1h every 30min
    ts = pa.array([0, 1800_000_000, 3600_000_000], type=pa.timestamp("us"))
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1], type=pa.int64()), "ts": ts,
        "value": pa.array([1.0, 2.0, 3.0])}))
    out = hopping_window_counts(ev, 3600, 1800).to_pandas().sort_values(
        "window_start").reset_index(drop=True)
    # t=0 -> windows -1800, 0; t=1800 -> 0, 1800; t=3600 -> 1800, 3600
    assert out.window_start.tolist() == [-1800, 0, 1800, 3600]
    assert out.n_events.tolist() == [1, 2, 2, 1]
    assert out.max_value.tolist() == [1.0, 2.0, 3.0, 3.0]


def test_ngram_jaccard_pairs_match_brute_force(rd, corpus_dir):
    """Sketch-free n-gram Jaccard: prefix-filter candidates guarantee
    recall 1.0 by construction, so the pipeline must equal brute force
    EXACTLY (pairs and float32 jaccard values)."""
    import dataclasses

    import pyarrow.parquet as pq

    from lsh_ray.config import PipelineConfig
    from lsh_ray.stages.dedup import ngram_jaccard_pairs
    from lsh_ray.stages.shingle import shingle_sets_from_token_lists

    n, thr = 3, 0.7
    docs = pq.read_table(corpus_dir + "/documents").slice(0, 300)
    texts = docs["text"].to_pylist()
    urls = docs["url"].to_pylist()
    tok_lists = [(t or "").lower().split() for t in texts]
    vals, offs = shingle_sets_from_token_lists(tok_lists, n, 1)
    sets = [vals[offs[i]:offs[i + 1]] for i in range(len(tok_lists))]
    expected = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            if len(a) == 0 or len(b) == 0:
                continue
            if len(a) > len(b):
                a, b = b, a
            idx = np.searchsorted(b, a)
            idx[idx == len(b)] = len(b) - 1
            inter = int((b[idx] == a).sum())
            jac = np.float32(inter / (len(a) + len(b) - inter))
            if float(jac) >= thr:  # double-compare, same as the engine
                ua, ub = sorted((urls[i], urls[j]))
                expected[(ua, ub)] = jac
    assert len(expected) > 20, "fixture must plant enough near-dups"

    cfg = dataclasses.replace(PipelineConfig(),
                              shuffle_coalesce_blocks=8)
    out = ngram_jaccard_pairs(rd.from_arrow(docs), cfg, n=n,
                              threshold=thr).to_pandas()
    got = {(r.url_a, r.url_b): np.float32(r.jaccard)
           for r in out.itertuples()}
    assert got == expected


def test_bpe_token_counts_known_values(rd):
    from lsh_ray.stages.text_stats import bpe_token_counts
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        # "don't stop-me now" -> don|'|t|stop|-|me|now = 7
        "text": ["don't stop-me now", "abc123 x!?", "", None],
    }))
    out = bpe_token_counts(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert out.n_bpe_tokens.tolist() == [7, 4, 0, 0]


def test_doc_quality_punct_and_stopword_ratios(rd):
    from lsh_ray.stages.text_stats import quality_scores
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        # doc 1: 9 tokens, 4 stopword hits (the, of, on, the); punct , , .
        "text": ["The cat, of all things, sat on the mat.", "x!"],
    }))
    out = quality_scores(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    r1 = out.iloc[0]
    text = "The cat, of all things, sat on the mat."
    assert r1.n_chars == len(text)
    assert r1.punct_ratio == round(3 / len(text), 6)  # two commas + period
    assert r1.stopword_ratio == round(4 / 9, 6)  # the,of,on,the / 9 tokens
    r2 = out.iloc[1]
    assert r2.punct_ratio == round(1 / 2, 6) and r2.stopword_ratio == 0.0


def test_bmpv_frame_sampling_and_features(rd):
    from lsh_ray.stages.multimodal import (decode_binary, encode_bmpv,
                                           image_features, sample_frames)
    rng = np.random.default_rng(14)
    frames = [rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
              for _ in range(10)]
    payload = encode_bmpv(frames, fps=25)
    # stride sampling picks frames 0, 3, 6, 9
    got = sample_frames(payload, every_nth=3)
    assert len(got) == 4
    for g, idx in zip(got, (0, 3, 6, 9)):
        np.testing.assert_array_equal(g, frames[idx])
    # max_frames bounds the decode work
    assert len(sample_frames(payload, every_nth=1, max_frames=2)) == 2
    with pytest.raises(ValueError):
        sample_frames(b"nope", 1)
    # end-to-end through the decode stage (magic dispatch, 3rd modality)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], type=pa.uint64()),
        "payload": pa.array([payload], type=pa.binary()),
        "mime": ["video/x-bmpv"],
    }))
    out = decode_binary(ds).to_pandas()
    feat = np.stack(out.features.values)[0]
    assert feat[0] == 10 and feat[1] == 25 and feat[2] == 5  # n, fps, sampled
    expect = np.stack([image_features(f)
                       for f in frames[::2][:8]]).mean(axis=0)[:13]
    np.testing.assert_allclose(feat[3:], expect, rtol=1e-6)


def test_doc_repetition_known_values(rd):
    from lsh_ray.stages.repetition import doc_repetition
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        # doc 1: 'a a a b' -> 4 tokens, 2 distinct, top 3/4
        # doc 2: case-folds to one token repeated
        "text": ["a a A b", "Foo foo FOO", "", None],
    }))
    out = doc_repetition(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert out.n_tokens.tolist() == [4, 3, 0, 0]
    assert out.n_distinct_tokens.tolist() == [2, 1, 0, 0]
    assert out.top_token_frac.tolist() == [0.75, 1.0, 0.0, 0.0]


def test_dup_ngram_stats_cross_doc_only(rd):
    from lsh_ray.stages.repetition import dup_ngram_stats
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        # bigrams doc1: (x y)(y z); doc2: (x y)(y q) -> 'x y' is the one
        # cross-doc gram. doc3 repeats 'r s' only WITHIN itself -> 0.
        # doc4 is too short for any bigram.
        "text": ["x y z", "x y q", "r s r s r", "solo"],
    }))
    out = dup_ngram_stats(ds, n=2).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert out.n_grams.tolist() == [2, 2, 4, 0]
    assert out.n_dup_grams.tolist() == [1, 1, 0, 0]
    assert out.dup_gram_frac.tolist() == [0.5, 0.5, 0.0, 0.0]


def test_decontaminate_known_values(rd):
    from lsh_ray.stages.repetition import decontaminate
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([100], type=pa.int64()),
        "text": ["x y z w"],  # bench bigrams: (x y)(y z)(z w)
    }))
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        # doc1: (x y)(y q) -> 1 dirty occurrence; doc2: (x y)(x y -> via
        # 'x y x y': grams (x y)(y x)(x y)) -> 2 dirty of 3; doc3 clean;
        # doc4 too short for any bigram.
        "text": ["x y q", "x y x y", "r s", "solo"],
    }))
    out = decontaminate(corpus, bench, n=2).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert out.doc_id.tolist() == [1, 2, 3, 4]
    assert out.n_grams.tolist() == [2, 3, 1, 0]
    assert out.n_dirty_grams.tolist() == [1, 2, 0, 0]
    assert out.dirty_gram_frac.tolist() == [0.5, 0.666667, 0.0, 0.0]


def test_decontaminate_join_path_matches_broadcast(rd):
    """broadcast_max_keys=0 forces the bucket_join membership plan
    (the 10^12-doc path); results must equal the broadcast plan."""
    import pyarrow.compute as pc

    from lsh_ray.fixtures import generate_corpus
    from lsh_ray.stages.repetition import decontaminate
    from lsh_ray.stages.sampling import hash_sample
    t = generate_corpus(200, seed=11)["documents"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(t.num_rows), type=pa.int64()),
        "text": pc.coalesce(t["text"], pa.scalar("")),
    }))
    corpus, bench = (hash_sample(docs, "20", complement=True),
                     hash_sample(docs, "20"))
    fast = decontaminate(corpus, bench, n=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    slow = decontaminate(corpus, bench, n=3, broadcast_max_keys=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert fast.equals(slow)
    assert (fast.n_dirty_grams > 0).any()  # the fixture plants overlap


def test_hash_sample_complement_partitions(rd):
    from lsh_ray.stages.sampling import hash_sample
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(100), type=pa.int64())}))
    a = hash_sample(ds, "40").to_pandas().doc_id
    b = hash_sample(ds, "40", complement=True).to_pandas().doc_id
    assert len(a) + len(b) == 100 and not set(a) & set(b)
    assert len(a) > 0 and len(b) > 0


def test_stratified_sample_quota_and_hash_order(rd):
    import hashlib
    from lsh_ray.stages.sampling import stratified_sample
    n = 500
    strata = ["s%d" % (i % 4) for i in range(n)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "lang": pa.array(strata)}))
    out = stratified_sample(ds, stratum_col="lang", k=7).to_pandas()
    assert len(out) == 4 * 7
    assert set(out.groupby("lang").size()) == {7}
    assert sorted(out.columns) == ["doc_id", "lang", "sample_rank"]
    # reference: k smallest (md5(id), id) per stratum, rank = position
    import pandas as pd
    ref = pd.DataFrame({"doc_id": range(n), "lang": strata})
    ref["h"] = ref.doc_id.map(
        lambda x: hashlib.md5(str(x).encode()).hexdigest())
    ref = ref.sort_values(["lang", "h", "doc_id"])
    ref["sample_rank"] = ref.groupby("lang").cumcount()
    ref = ref[ref.sample_rank < 7][["lang", "doc_id", "sample_rank"]]
    got = out.sort_values(["lang", "sample_rank"]).reset_index(drop=True)
    ref = ref.sort_values(["lang", "sample_rank"]).reset_index(drop=True)
    assert got[["lang", "doc_id", "sample_rank"]].equals(
        ref[["lang", "doc_id", "sample_rank"]].astype(got.dtypes.to_dict()))
    # deterministic across runs
    again = stratified_sample(ds, stratum_col="lang", k=7).to_pandas() \
        .sort_values(["lang", "sample_rank"]).reset_index(drop=True)
    assert again[got.columns.tolist()].equals(got)


def test_stratified_sample_small_stratum_keeps_all(rd):
    from lsh_ray.stages.sampling import stratified_sample
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(30), type=pa.int64()),
        "lang": pa.array(["rare"] * 3 + ["big"] * 27)}))
    out = stratified_sample(ds, stratum_col="lang", k=10).to_pandas()
    assert (out[out.lang == "rare"].sample_rank.sort_values().tolist()
            == [0, 1, 2])
    assert len(out[out.lang == "big"]) == 10


def test_exact_quantiles_known_ranks(rd):
    from lsh_ray.stages.sampling import exact_quantiles
    ds = rd.from_arrow(pa.table({
        "n_chars": pa.array(list(range(1, 11)), type=pa.int64())}))
    out = exact_quantiles(ds, "n_chars").to_pandas()
    # rank = ceil(q * n) in integer permille: 3, 5, 8, 9, 10
    assert out.n_chars_q.tolist() == [3, 5, 8, 9, 10]
    assert out.q.tolist() == [0.25, 0.5, 0.75, 0.9, 0.99]


def test_exact_quantiles_high_cardinality_falls_back_to_sketch(rd):
    """A column whose distinct-value histogram exceeds the cap must
    auto-route to the DDSketch path (bounded driver volume) instead of
    pulling the whole histogram — same output schema, alpha-relative
    accuracy (round-5 verdict item)."""
    from lsh_ray.stages.sampling import exact_quantiles
    rng = np.random.default_rng(7)
    v = rng.integers(1, 10_000_000, size=20_000)  # ~all distinct
    ds = rd.from_arrow(pa.table({"n": pa.array(v, type=pa.int64())}))
    out = exact_quantiles(ds, "n", max_cardinality=1000).to_pandas()
    assert str(out.n_q.dtype) == "int64" and out.q.tolist() == [
        0.25, 0.5, 0.75, 0.9, 0.99]
    exact = np.quantile(v, [0.25, 0.5, 0.75, 0.9, 0.99])
    # DDSketch alpha=0.01 => within ~2% relative of the true quantile
    assert np.all(np.abs(out.n_q.to_numpy() - exact) / exact < 0.05)
    # under the cap the exact path still runs (rank-pick values)
    small = exact_quantiles(
        rd.from_arrow(pa.table({
            "n": pa.array(list(range(1, 11)), type=pa.int64())})),
        "n", max_cardinality=1000).to_pandas()
    assert small.n_q.tolist() == [3, 5, 8, 9, 10]


def test_top_tokens_count_then_token_order(rd):
    from lsh_ray.stages.tfidf import top_tokens
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": ["b a b c", "a b z"],
    }))
    out = top_tokens(ds, k=3).to_pandas()
    # b:3, a:2, then c/z tie at 1 -> token asc picks c
    assert out.token.tolist() == ["b", "a", "c"]
    assert out.n.tolist() == [3, 2, 1]


def test_event_seq_is_rownumber_per_user(rd):
    from lsh_ray.stages.windows import event_seq
    rng = np.random.default_rng(7)
    n = 5000
    # hot user 1 spans many hour buckets; user 2 interleaves; ts ties
    # within a user are broken by event_id
    ts_s = 1_700_000_000 + np.sort(rng.integers(0, 40 * 3600, n))
    ts_s[100] = ts_s[101]  # plant a tie
    user = np.where(rng.random(n) < 0.9, 1, 2).astype(np.int64)
    perm = rng.permutation(n)  # arrival order != time order
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)[perm]),
        "user_id": pa.array(user[perm]),
        "ts": pa.array(ts_s[perm] * 1_000_000, type=pa.timestamp("us")),
    })
    out = event_seq(rd.from_arrow(tbl)).to_pandas()
    assert len(out) == n
    for u, g in out.groupby("user_id"):
        g = g.sort_values("seq_no")
        assert g.seq_no.tolist() == list(range(1, len(g) + 1))
        k = np.lexsort((g.event_id.to_numpy(),
                        g.ts.astype("int64").to_numpy()))
        assert (k == np.arange(len(g))).all(), f"user {u} out of order"


def _window_events(n=4000, seed=11):
    """Arrival-shuffled events: hot user 1 spanning many hour buckets
    (cross-bucket boundaries exercised), sparse user 2 with bucket gaps,
    a planted ts tie broken by event_id."""
    rng = np.random.default_rng(seed)
    ts_s = 1_700_000_000 + np.sort(rng.integers(0, 60 * 3600, n))
    ts_s[50] = ts_s[51]
    user = np.where(rng.random(n) < 0.95, 1, 2).astype(np.int64)
    val = np.round(rng.uniform(0, 500, n), 2)
    perm = rng.permutation(n)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)[perm]),
        "user_id": pa.array(user[perm]),
        "ts": pa.array(ts_s[perm] * 1_000_000, type=pa.timestamp("us")),
        "value": pa.array(val[perm]),
    })


def test_event_lag_matches_pandas(rd):
    from lsh_ray.stages.windows import event_lag
    tbl = _window_events()
    out = event_lag(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
    df["prev"] = df.groupby("user_id")["ts"].shift(1)
    df = df.sort_values("event_id").reset_index(drop=True)
    assert len(out) == len(df)
    exp_gap = (df.ts.astype("int64") - df.prev.astype("int64"))
    miss = df.prev.isna()
    assert out.prev_ts.isna().equals(miss)
    assert (out.gap_us[~miss].to_numpy()
            == exp_gap[~miss].to_numpy()).all()
    assert out.gap_us[~miss].ge(0).all()


def test_event_lead_matches_pandas(rd):
    from lsh_ray.stages.windows import event_lead
    tbl = _window_events(seed=13)
    out = event_lead(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
    df["nxt"] = df.groupby("user_id")["ts"].shift(-1)
    df = df.sort_values("event_id").reset_index(drop=True)
    miss = df.nxt.isna()
    assert out.next_ts.isna().equals(miss)
    exp_gap = (df.nxt.astype("int64") - df.ts.astype("int64"))
    assert (out.gap_us[~miss].to_numpy()
            == exp_gap[~miss].to_numpy()).all()


@pytest.mark.parametrize("plan,mode", [
    ("boundary", "tasks"), ("join", "tasks"),
    # sort mode materializes a transient 'bucket' column inside
    # colocate_map; the boundary plan's trim kernel passes its input
    # table through, so this pins that the column never leaks into the
    # downstream carry exchange (round-5 ADVICE regression)
    ("boundary", "sort"), ("join", "sort"),
])
def test_moving_frame_avg_matches_pandas(rd, plan, mode, monkeypatch):
    from lsh_ray.stages.windows import moving_frame_avg
    monkeypatch.setenv("LSH_RAY_EXCHANGE", mode)
    tbl = _window_events(n=3000, seed=5)
    out = moving_frame_avg(rd.from_arrow(tbl), k=3,
                           plan=plan).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
    exp = (df.groupby("user_id")["value"]
           .rolling(3, min_periods=1).mean()
           .reset_index(level=0, drop=True))
    df["exp"] = exp
    df = df.sort_values("event_id").reset_index(drop=True)
    assert np.allclose(out.avg3.to_numpy(), df.exp.to_numpy(),
                       atol=1e-6)


def test_window_ck_pack_rejects_out_of_domain_keys(rd):
    """The (key, bucket) int64 pack is injective only for keys in
    [0, 2^31); a uint64-hash key must raise loudly instead of silently
    aliasing groups (round-5 verdict item)."""
    from lsh_ray.stages.windows import event_lag
    tbl = _window_events(n=200, seed=3)
    bad = tbl.set_column(
        tbl.column_names.index("user_id"), "user_id",
        pa.array((tbl["user_id"].to_numpy(zero_copy_only=False)
                  .astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)),
                 type=pa.uint64()))
    with pytest.raises(Exception) as ei:
        event_lag(rd.from_arrow(bad)).materialize()
    assert "2^31" in str(ei.value) or "alias" in str(ei.value)

    # negative int32 keys violate the lower bound and must also raise
    neg = tbl.set_column(
        tbl.column_names.index("user_id"), "user_id",
        pa.array((tbl["user_id"].to_numpy(zero_copy_only=False)
                  .astype(np.int32) * np.int32(-1) - np.int32(1)),
                 type=pa.int32()))
    with pytest.raises(Exception) as ei2:
        event_lag(rd.from_arrow(neg)).materialize()
    assert "2^31" in str(ei2.value) or "alias" in str(ei2.value)

    # dtype-safe keys (uint16: scan skipped entirely) work and match
    # the int64 result
    small = tbl.set_column(
        tbl.column_names.index("user_id"), "user_id",
        pa.array(tbl["user_id"].to_numpy(zero_copy_only=False)
                 .astype(np.uint16), type=pa.uint16()))
    a = event_lag(rd.from_arrow(small)).to_pandas() \
        .sort_values(["user_id", "ts"]).reset_index(drop=True)
    b = event_lag(rd.from_arrow(tbl)).to_pandas() \
        .sort_values(["user_id", "ts"]).reset_index(drop=True)
    assert a.drop(columns=["user_id"]).equals(b.drop(columns=["user_id"]))


def test_window_family_hot_key_scale(rd):
    """One bot user owning 300k events across thousands of hour
    buckets: lag and the boundary frame plan must stay correct (and
    bounded — no per-key event group) under the exact skew their
    docstrings promise to survive."""
    from lsh_ray.stages.windows import event_lag, moving_frame_avg
    rng = np.random.default_rng(17)
    n = 300_000
    ts_s = 1_700_000_000 + np.sort(rng.integers(0, 5000 * 3600, n))
    val = np.round(rng.uniform(0, 100, n), 2)
    perm = rng.permutation(n)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)[perm]),
        "user_id": pa.array(np.ones(n, dtype=np.int64)),
        "ts": pa.array(ts_s[perm] * 1_000_000, type=pa.timestamp("us")),
        "value": pa.array(val[perm]),
    })
    ds = rd.from_arrow(tbl).repartition(32)

    lag = event_lag(ds).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    df = tbl.to_pandas().sort_values(["ts", "event_id"])
    df["prev"] = df["ts"].shift(1)
    df = df.sort_values("event_id").reset_index(drop=True)
    miss = df.prev.isna()
    assert lag.prev_ts.isna().equals(miss)
    assert (lag.gap_us[~miss].to_numpy() ==
            (df.ts.astype("int64")
             - df.prev.astype("int64"))[~miss].to_numpy()).all()

    avg = moving_frame_avg(rd.from_arrow(tbl).repartition(32), k=3) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    df2 = tbl.to_pandas().sort_values(["ts", "event_id"])
    exp = df2["value"].rolling(3, min_periods=1).mean()
    df2["exp"] = exp
    df2 = df2.sort_values("event_id").reset_index(drop=True)
    assert np.allclose(avg.avg3.to_numpy(), df2.exp.to_numpy(),
                       atol=1e-6)


def test_moving_frame_avg_plans_agree_wide_frame(rd):
    # k=5 stresses multi-bucket borrow chains (sparse user 2 has
    # buckets with < k-1 rows): both plans must agree exactly after
    # rounding
    from lsh_ray.stages.windows import moving_frame_avg
    tbl = _window_events(n=1500, seed=21)
    a = moving_frame_avg(rd.from_arrow(tbl), k=5, plan="boundary") \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    b = moving_frame_avg(rd.from_arrow(tbl), k=5, plan="join") \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    assert np.array_equal(a.avg5.to_numpy(), b.avg5.to_numpy())


def test_grouped_top_k_prunes_and_ranks(rd):
    from lsh_ray.stages.sampling import grouped_top_k
    n = 200
    tbl = pa.table({
        "lang": pa.array(["en", "de"] * (n // 2)),
        "n_chars": pa.array(np.arange(n, dtype=np.int64)),
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
    })
    out = grouped_top_k(rd.from_arrow(tbl), "lang", "n_chars",
                        "doc_id", k=2).to_pandas()
    got = {(r.lang, r.n_chars) for r in out.itertuples()}
    # en holds the even ids (..., 196, 198), de the odd (..., 197, 199)
    assert got == {("en", 196), ("en", 198), ("de", 197), ("de", 199)}


def test_bucket_join_left_with_empty_right(rd):
    """Every bucket has left rows and ZERO right rows — the r4 crash
    (order[] indexing an empty array) regression, deterministic."""
    from lsh_ray.stages.join import bucket_join
    left = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(50, dtype=np.int64)),
        "v": pa.array(np.arange(50, dtype=np.int64) * 2),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()),
        "w": pa.array([], pa.int64()),
    }))
    out = bucket_join(left, right, "k", "k", ["w"], suffix="_r",
                      how="left").to_pandas().sort_values("k")
    assert len(out) == 50
    assert out.w_r.isna().all()
    assert out.v.tolist() == [i * 2 for i in range(50)]


@pytest.mark.parametrize("mode", ["tasks", "sort", "hash"])
def test_fused_reductions_mode_parity(rd, mode, monkeypatch):
    """The round-5 barrier fusions (tfidf df-in-block, window merge,
    exact-dup run reduce) must produce identical results under all
    three exchange modes — the r4 sort-mode bucket leak is the failure
    class this pins."""
    monkeypatch.setenv("LSH_RAY_EXCHANGE", mode)
    from lsh_ray.stages.dedup import exact_dup_groups
    from lsh_ray.stages.tfidf import tfidf
    from lsh_ray.stages.windows import tumbling_window_counts

    docs = pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "text": ["a b a", "b c", "a b a", "", "c c c", "d a"],
    })
    tf = tfidf(rd.from_arrow(docs)).to_pandas() \
        .sort_values(["doc_id", "token"]).reset_index(drop=True)
    assert len(tf) == 9  # distinct (doc, token) over token-ful docs
    # df('a') = 3 docs of N=5 token-ful
    row = tf[(tf.doc_id == 0) & (tf.token == "a")].iloc[0]
    assert row.tfidf == round((2 / 3) * np.log2(5 / 3), 6)

    g = exact_dup_groups(rd.from_arrow(docs)).to_pandas() \
        .sort_values("text_hash").reset_index(drop=True)
    assert len(g) == 5
    assert g[g.n_docs == 2].rep_doc_id.tolist() == [0]

    ev = _window_events(n=500, seed=8)
    w = tumbling_window_counts(rd.from_arrow(ev)).to_pandas()
    assert w.n_events.sum() == 500
    pdf = ev.to_pandas()
    pdf["ws"] = (pdf.ts.astype("int64") // 10**6) // 3600 * 3600
    exp = pdf.groupby(["user_id", "ws"]).agg(
        n=("value", "size"), m=("value", "max")).reset_index()
    got = w.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    exp = exp.sort_values(["user_id", "ws"]).reset_index(drop=True)
    assert got.n_events.tolist() == exp.n.tolist()
    np.testing.assert_allclose(got.max_value.to_numpy(),
                               exp.m.to_numpy())


def _line_dedup_ref(docs, w):
    """Pure-python keep-first line dedup over (doc_id, text) pairs."""
    seen, out = set(), {}
    for doc_id, text in sorted(docs):
        words = text.split(" ")
        kept = []
        for j in range(0, len(words), w):
            line = " ".join(words[j:j + w])
            if line not in seen:
                seen.add(line)
                kept.append(line)
        if kept:
            out[doc_id] = ("\n".join(kept), len(kept))
    return out


@pytest.mark.parametrize("mode", ["tasks", "sort"])
def test_line_dedup_matches_reference(rd, mode, monkeypatch):
    from lsh_ray.stages.dedup import line_dedup
    monkeypatch.setenv("LSH_RAY_EXCHANGE", mode)
    w = 3
    docs = [
        # doc 1: a tail line shorter than w; an in-doc repeated line
        (1, "a b c a b c d e"),
        # doc 2: exact copy of doc 1 -> fully absorbed (drops out)
        (2, "a b c a b c d e"),
        # doc 3: shares doc 1's first line, adds its own
        (3, "a b c x y z"),
        # doc 4: shares doc 3's tail line only
        (4, "x y z q"),
        # doc 5: all-new single short line
        (5, "solo"),
    ]
    exp = _line_dedup_ref(docs, w)
    assert 2 not in exp  # the planted full absorption
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string())}))
    out = line_dedup(ds, words_per_line=w).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert sorted(out.doc_id) == sorted(exp)
    for row in out.itertuples():
        assert (row.text, row.n_kept) == exp[row.doc_id]


def test_segment_lines_tiles_word_stream(rd):
    from lsh_ray.stages.dedup import segment_lines
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "text": pa.array(["one two three four five", ""], pa.string())}))
    out = segment_lines(ds, words_per_line=2).to_pandas() \
        .sort_values(["doc_id", "idx"]).reset_index(drop=True)
    assert list(out.doc_id) == [7, 7, 7, 8]
    assert list(out.idx) == [0, 1, 2, 0]
    # the tail line keeps the remainder; splitting "" yields one
    # empty-string word -> one empty line (matches string_split)
    assert list(out.line) == ["one two", "three four", "five", ""]


def test_pii_redact_batch_edges():
    from lsh_ray.stages.text_stats import pii_redact_batch
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array([
            "a@b.co leads the line",           # match at string start
            "tail match 1.2.3.4",              # match at string end
            "x@y.org then z@w.io and 10.0.0.1 and +1-555-0100",
            "",                                 # empty text
            "no pii at all here",
            "not-an-ip 1234.5.6.7 but 255.255.255.255 is",
        ], pa.string()),
    })
    out = pii_redact_batch(t)
    assert out["text"].to_pylist() == [
        "<EMAIL> leads the line",
        "tail match <IP>",
        "<EMAIL> then <EMAIL> and <IP> and <PHONE>",
        "",
        "no pii at all here",
        # "1234.5.6.7" is NOT redacted: every 1-3-digit prefix of the
        # first octet either fails \b (mid-digit-run start) or leaves a
        # digit before the dot — the word-boundary anchors reject
        # over-long octet runs entirely
        "not-an-ip 1234.5.6.7 but <IP> is",
    ]
    assert out["n_emails"].to_pylist() == [1, 0, 2, 0, 0, 0]
    assert out["n_ips"].to_pylist() == [0, 1, 1, 0, 0, 1]
    assert out["n_phones"].to_pylist() == [0, 0, 1, 0, 0, 0]
    # idempotent: sentinels match none of the patterns
    again = pii_redact_batch(pa.table({
        "doc_id": out["doc_id"], "text": out["text"]}))
    assert again["text"].to_pylist() == out["text"].to_pylist()
    assert pa.compute.sum(again["n_emails"]).as_py() == 0
    assert pa.compute.sum(again["n_ips"]).as_py() == 0
    assert pa.compute.sum(again["n_phones"]).as_py() == 0


def test_pii_redact_dataset_schema(rd):
    from lsh_ray.stages.text_stats import pii_redact
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "text": pa.array(["mail a@b.co", "clean"], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
    }))
    out = pii_redact(ds).to_pandas().sort_values("doc_id")
    assert list(out.columns) == [
        "doc_id", "text", "n_emails", "n_ips", "n_phones"]
    assert out.text.tolist() == ["mail <EMAIL>", "clean"]
    assert out.n_emails.dtype == "int64"


def test_unigram_logprob_matches_reference(rd):
    import math

    from lsh_ray.stages.text_stats import unigram_logprob

    docs = [(1, "a a b"), (2, "b c"), (3, "   "), (4, "A")]
    # lowercased corpus tokens: a a b b c a -> counts a:3 b:2 c:1, N=6
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string())}))
    out = unigram_logprob(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    # doc 3 is whitespace-only -> no row
    assert out.doc_id.tolist() == [1, 2, 4]
    assert out.n_tokens.tolist() == [3, 2, 1]

    def mlp(c, n=6):
        x = math.log(c / n) * 1e6
        return math.copysign(math.floor(abs(x) + 0.5), x)

    def ref(counts):
        s = sum(mlp(c) for c in counts)
        v = (s / 1e6) / len(counts)
        return math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6

    assert out.avg_logprob.tolist() == [
        ref([3, 3, 2]), ref([2, 1]), ref([3])]
    # sanity: the all-common-token doc scores highest, the rare-token
    # doc lowest
    assert out.avg_logprob[0] > out.avg_logprob[1]


@pytest.mark.parametrize("mode", ["tasks", "sort", "hash"])
def test_unigram_logprob_mode_parity(rd, mode, monkeypatch):
    """Both exchanges (token co-location, doc_id co-location) must
    agree across the three exchange modes."""
    monkeypatch.setenv("LSH_RAY_EXCHANGE", mode)
    import pyarrow.compute as pc

    from lsh_ray.fixtures import generate_corpus
    from lsh_ray.stages.text_stats import unigram_logprob

    t = generate_corpus(120, seed=5)["documents"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(t.num_rows), type=pa.int64()),
        "text": pc.coalesce(t["text"], pa.scalar("")),
    }))
    out = unigram_logprob(docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) > 100
    assert (out.avg_logprob < 0).all()
    if mode == "tasks":
        test_unigram_logprob_mode_parity._ref = out
    else:
        ref = test_unigram_logprob_mode_parity._ref
        assert out.equals(ref)
