"""Native SMF MIDI structured parse (stages/midi.py) — the reference's
song-loader extraction (loader.py:85-126) re-verified on real SMF bytes:
(pitch, onset sec, duration sec) per note, tempo maps, running status,
velocity-0 note-offs, SMPTE division, skip-on-fail, and the handoff
into the NLSH shingle path."""

import numpy as np
import pyarrow as pa
import pytest

from lsh_ray.stages.midi import (MidiParseStage, encode_smf,
                                 midi_features, parse_midi)


def test_roundtrip_single_track_default_tempo():
    # division 480, default 500000 us/qn -> 1 tick = 500000/480 us
    notes = [(0, 480, 60, 80, 0), (480, 240, 64, 90, 0),
             (720, 960, 67, 70, 0)]
    p, o, d = parse_midi(encode_smf([notes], division=480))
    tick = 0.5 / 480
    assert p.tolist() == [60.0, 64.0, 67.0]
    np.testing.assert_allclose(o, np.array([0, 480, 720]) * tick)
    np.testing.assert_allclose(d, np.array([480, 240, 960]) * tick)


def test_tempo_change_piecewise_onsets():
    # 120 bpm for the first quarter (480 ticks), then 240 bpm
    notes = [(0, 480, 60, 80, 0), (480, 480, 62, 80, 0),
             (960, 480, 64, 80, 0)]
    payload = encode_smf([notes], division=480,
                         tempos=[(0, 500_000), (480, 250_000)])
    _, o, d = parse_midi(payload)
    np.testing.assert_allclose(o, [0.0, 0.5, 0.75])
    # first note's off at tick 480 is exactly the tempo boundary
    np.testing.assert_allclose(d, [0.5, 0.25, 0.25])


def test_running_status_and_velocity0_offs():
    notes = [(0, 240, 60, 80, 0), (240, 240, 62, 80, 0),
             (480, 240, 64, 80, 0)]
    plain = parse_midi(encode_smf([notes], division=480))
    rs = parse_midi(encode_smf([notes], division=480,
                               running_status=True,
                               off_via_velocity0=True))
    for a, b in zip(plain, rs):
        np.testing.assert_allclose(a, b)


def test_format1_multitrack_order_and_shared_tempo():
    # tempo lives in track 0 but must apply to track 1 (format-1 rule);
    # output order is track-by-track (the music21 recurse walk)
    t0 = [(0, 480, 60, 80, 0)]
    t1 = [(0, 480, 72, 80, 1), (480, 480, 74, 80, 1)]
    p, o, _ = parse_midi(encode_smf([t0, t1], division=480,
                                    tempos=[(0, 250_000)]))
    assert p.tolist() == [60.0, 72.0, 74.0]
    np.testing.assert_allclose(o, [0.0, 0.0, 0.25])


def test_unterminated_note_nan_duration():
    payload = encode_smf([[(0, None, 60, 80, 0), (0, 480, 64, 80, 0)]],
                         division=480)
    p, _, d = parse_midi(payload)
    assert p.tolist() == [60.0, 64.0]
    assert np.isnan(d[0]) and not np.isnan(d[1])


def test_overlapping_same_pitch_fifo_pairing():
    # two overlapping middle-Cs: offs pair FIFO (earliest on first)
    notes = [(0, 960, 60, 80, 0), (240, 240, 60, 80, 0)]
    _, o, d = parse_midi(encode_smf([notes], division=480))
    tick = 0.5 / 480
    np.testing.assert_allclose(o, np.array([0, 240]) * tick)
    np.testing.assert_allclose(d, np.array([480, 720]) * tick)


def test_smpte_division_fixed_tick():
    # -25 fps, 40 ticks/frame -> 1 tick = 1 ms; tempo events ignored
    division = ((256 - 25) << 8) | 40
    payload = encode_smf([[(0, 1000, 60, 80, 0)]], division=division,
                         tempos=[(0, 250_000)])
    _, o, d = parse_midi(payload)
    np.testing.assert_allclose(o, [0.0])
    np.testing.assert_allclose(d, [1.0])


@pytest.mark.parametrize("payload", [
    b"", b"RIFF1234", b"MThd\x00\x00\x00\x06\x00\x03\x00\x01\x01\xe0",
    encode_smf([[(0, 480, 60, 80, 0)]])[:-3],  # truncated EOT
])
def test_malformed_rejection(payload):
    with pytest.raises(ValueError):
        parse_midi(payload)


def test_stage_skip_on_fail_keeps_count(ray_session):
    import ray.data
    good = encode_smf([[(0, 480, 60, 80, 0), (480, 480, 64, 80, 0)]])
    batch = pa.table({
        "doc_id": pa.array(["a", "b", "c"]),
        "payload": pa.array([good, b"not midi", good],
                            type=pa.binary()),
    })
    out = ray.data.from_arrow(batch).map_batches(
        MidiParseStage, concurrency=1, batch_format="pyarrow",
    ).to_pandas().set_index("doc_id")
    assert out.loc["a", "ok"] and out.loc["c", "ok"]
    assert not out.loc["b", "ok"]
    assert "MThd" in out.loc["b", "error"]
    assert out.loc["a", "n_notes"] == 2 and out.loc["b", "n_notes"] == 0
    assert list(out.loc["a", "values"]) == [60.0, 64.0]


def test_parsed_output_feeds_nlsh_shingles():
    # the parse output is the sequences schema: values+durations go
    # straight into the reference's NLSH scheme
    from lsh_ray.functions.windows_ref import nlsh_expand, sequence_shingles
    notes = [(i * 240, 240, 55 + (i % 13), 80, 0) for i in range(40)]
    p, _, d = parse_midi(encode_smf([notes], division=480))
    s = sequence_shingles(nlsh_expand(p, d), scheme="nlsh")
    assert len(s) > 0 and s.dtype == np.uint64
    # deterministic: same bytes -> same fingerprints
    p2, _, d2 = parse_midi(encode_smf([notes], division=480))
    s2 = sequence_shingles(nlsh_expand(p2, d2), scheme="nlsh")
    assert set(s) == set(s2)


def test_binary_decode_stage_dispatches_midi():
    from lsh_ray.stages.multimodal import BinaryDecodeStage
    payload = encode_smf([[(i * 240, 240, 60 + i, 80, 0)
                           for i in range(8)]])
    feat = BinaryDecodeStage(use_fake_decoder=False)._decode_one(payload)
    expect = midi_features(*parse_midi(payload))
    np.testing.assert_allclose(feat, expect)
    assert feat.shape == (16,) and feat[0] == 8  # note count


def test_midi_features_shape_and_empty():
    assert midi_features(np.array([]), np.array([]),
                         np.array([])).tolist() == [0.0] * 16
    f = midi_features(np.array([60.0, 72.0]), np.array([0.0, 1.0]),
                      np.array([0.5, np.nan]))
    assert f[0] == 2 and f[1] == 1.0 and f[7] == 0.5  # nan fraction


def test_midi_to_lsh_banding_end_to_end(ray_session):
    """The reference's core use (song indexing / query-by-humming,
    loader.py + lsh.py): MIDI files -> MidiParseStage -> NLSH shingles
    -> MinHash -> LSH band keys. A melody and its lightly-mutated
    variant must collide in at least one band; unrelated melodies must
    not."""
    import ray.data

    from lsh_ray.functions.windows_ref import sequence_shingles
    from lsh_ray.stages.banding import band_keys_from_minhash
    from lsh_ray.stages.minhash import make_perm_params, minhash_of_values

    rng = np.random.default_rng(7)

    def melody(pitches):
        return [(i * 240, 240, int(p), 80, 0) for i, p in enumerate(pitches)]

    base = rng.integers(45, 75, size=200)
    variant = base.copy()
    variant[::40] += 1  # 5 sparse pitch mutations
    others = [rng.integers(45, 75, size=200) for _ in range(4)]
    payloads = [encode_smf([melody(p)])
                for p in [base, variant] + others]

    batch = pa.table({
        "doc_id": pa.array([f"m{i}" for i in range(len(payloads))]),
        "payload": pa.array(payloads, type=pa.binary()),
    })
    parsed = ray.data.from_arrow(batch).map_batches(
        MidiParseStage, concurrency=1, batch_format="pyarrow",
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert parsed.ok.all()

    shingle_sets = [sequence_shingles(np.asarray(v), scheme="nlsh")
                    for v in parsed["values"]]
    vals = np.concatenate(shingle_sets)
    offs = np.concatenate(
        ([0], np.cumsum([len(s) for s in shingle_sets]))).astype(np.int64)
    a, b = make_perm_params(128, 42)
    mh = minhash_of_values(vals, offs, a, b)
    bands = band_keys_from_minhash(mh, bands=32, rows=4)

    def collide(i, j):
        return bool(len(np.intersect1d(bands[i], bands[j])))

    assert collide(0, 1)  # base vs variant
    for j in range(2, 6):
        assert not collide(0, j) and not collide(1, j)
