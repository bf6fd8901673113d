"""Native Standard-MIDI-File (SMF) structured parse — stdlib + numpy.

Closes the one reference capability that had no literal analog: the
reference's song loader parses MIDI scores via ``music21`` and extracts,
per note, ``(pitch, onset, duration)`` — skipping files that fail to
parse (``/root/reference/loader.py:85-126``). This module re-implements
that extraction natively over the SMF bytestream (the container has no
MIDI library), with the same output contract:

- **Stream order** (music21 ``.recurse()`` walk): tracks in file order,
  and within a track notes in note-on order.
- **pitch** — the MIDI note number as float (``pitch.ps`` for
  equal-tempered notes, ``loader.py:106``).
- **onset** — absolute note-on time in SECONDS via the file's tempo map
  (``set_tempo`` meta events; default 500 000 µs/quarter).
- **duration** — seconds until the matching note-off. A note never
  turned off gets duration ``NaN`` — the reference emits ``None`` there
  (``loader.py:117``) and the NLSH expansion treats NaN as
  "no duration" (``functions/windows_ref.py:nlsh_expand``).

Parse failures raise ``ValueError``; the actor-pool ``MidiParseStage``
catches them per document and emits an ``ok=False`` row with the error
string, mirroring the reference's skip-on-fail + log
(``loader.py:92-97``) without losing the count (S8 metrics analog).

The parsed table (``doc_id, values, onsets, durations``) is exactly the
``sequences`` schema (FIXTURES.md §2), so it feeds the PLSH/NLSH
shinglers and the whole MinHash/banding machinery unchanged — the
reference's song-indexing path end-to-end.

``encode_smf`` is the deterministic fixture writer (same role as
``encode_jpeg`` / ``encode_mpeg1_layer1``): tests exercise the parser
on real SMF bytes, including running status, note-on-velocity-0
note-offs, tempo changes, format-1 multi-track and SMPTE division.
"""

from __future__ import annotations

import struct
from collections import defaultdict, deque

import numpy as np
import pyarrow as pa

DEFAULT_US_PER_QN = 500_000  # SMF default: 120 bpm


# ------------------------------------------------------------ bit plumbing

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """SMF variable-length quantity: 7 bits per byte, MSB = continue."""
    val = 0
    for _ in range(4):  # spec caps VLQs at 4 bytes (max 0x0FFFFFFF)
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        val = (val << 7) | (b & 0x7F)
        if not b & 0x80:
            return val, pos
    raise ValueError("varint longer than 4 bytes")


def _encode_varint(val: int) -> bytes:
    if val < 0:
        raise ValueError("negative delta time")
    out = [val & 0x7F]
    val >>= 7
    while val:
        out.append(0x80 | (val & 0x7F))
        val >>= 7
    return bytes(reversed(out))


_CHANNEL_DATA_LEN = {0x8: 2, 0x9: 2, 0xA: 2, 0xB: 2, 0xC: 1, 0xD: 1, 0xE: 2}


# ------------------------------------------------------------------ parse

def _scan_track(buf: bytes) -> tuple[list[tuple], list[tuple[int, int]]]:
    """One MTrk payload -> (note events, tempo events), ticks absolute.

    Note events are ``(abs_tick, kind, channel, pitch)`` with kind 1 =
    on, 0 = off (note-on velocity 0 counts as off per the spec), in
    stream order. Tempo events are ``(abs_tick, us_per_quarter)``.
    """
    notes: list[tuple] = []
    tempos: list[tuple[int, int]] = []
    pos, tick, status = 0, 0, None
    while pos < len(buf):
        delta, pos = _read_varint(buf, pos)
        tick += delta
        if pos >= len(buf):
            raise ValueError("truncated event")
        b = buf[pos]
        if b >= 0x80:
            status = b
            pos += 1
        elif status is None:
            raise ValueError("data byte with no running status")
        if status == 0xFF:  # meta
            if pos >= len(buf):
                raise ValueError("truncated meta event")
            mtype = buf[pos]
            mlen, pos = _read_varint(buf, pos + 1)
            data = buf[pos:pos + mlen]
            if len(data) != mlen:
                raise ValueError("truncated meta payload")
            pos += mlen
            if mtype == 0x2F:  # end of track
                return notes, tempos
            if mtype == 0x51:
                if mlen != 3:
                    raise ValueError("set_tempo length != 3")
                tempos.append((tick, int.from_bytes(data, "big")))
            status = None  # meta/sysex cancel running status
        elif status in (0xF0, 0xF7):  # sysex
            slen, pos = _read_varint(buf, pos)
            pos += slen
            if pos > len(buf):
                raise ValueError("truncated sysex")
            status = None
        elif status >= 0xF1:
            raise ValueError(f"unexpected system message 0x{status:02x}")
        else:
            hi, ch = status >> 4, status & 0x0F
            n = _CHANNEL_DATA_LEN[hi]
            if pos + n > len(buf):
                raise ValueError("truncated channel event")
            d1 = buf[pos]
            d2 = buf[pos + 1] if n == 2 else 0
            pos += n
            if d1 >= 0x80 or d2 >= 0x80:
                raise ValueError("data byte >= 0x80")
            if hi == 0x9 and d2 > 0:
                notes.append((tick, 1, ch, d1))
            elif hi == 0x8 or (hi == 0x9 and d2 == 0):
                notes.append((tick, 0, ch, d1))
    raise ValueError("track missing end-of-track meta")


def _tick_seconds(ticks: np.ndarray, tempos: list[tuple[int, int]],
                  tpq: int) -> np.ndarray:
    """Piecewise-linear tick -> seconds under a sorted tempo map."""
    # segment boundaries: tick 0 at the default tempo unless overridden
    tempos = sorted(tempos)
    if not tempos or tempos[0][0] > 0:
        tempos = [(0, DEFAULT_US_PER_QN)] + tempos
    bounds = np.array([t for t, _ in tempos], dtype=np.float64)
    rates = np.array([us * 1e-6 / tpq for _, us in tempos])  # sec per tick
    # cumulative seconds at each boundary
    seg = np.diff(bounds) * rates[:-1]
    cum = np.concatenate(([0.0], np.cumsum(seg)))
    idx = np.searchsorted(bounds, ticks, side="right") - 1
    return cum[idx] + (ticks - bounds[idx]) * rates[idx]


def parse_midi(payload: bytes
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """SMF bytes -> (pitches, onsets_sec, durations_sec[NaN if no off]).

    Formats 0 and 1 share one merged tempo map (format-1 convention:
    tempo lives in the first track but applies globally); format 2
    tracks are independent patterns, so each uses only its own tempo
    events. SMPTE division (negative high byte) fixes the tick length
    directly and set_tempo is ignored, per the spec.
    """
    if len(payload) < 14 or payload[:4] != b"MThd":
        raise ValueError("not an SMF payload (missing MThd)")
    hlen, fmt, ntrks, division = struct.unpack_from(">IHHH", payload, 4)
    if hlen < 6:
        raise ValueError("MThd length < 6")
    if fmt not in (0, 1, 2):
        raise ValueError(f"unknown SMF format {fmt}")
    if ntrks == 0:
        raise ValueError("zero tracks")
    smpte = bool(division & 0x8000)
    if smpte:
        fps = 256 - (division >> 8)  # two's-complement negative byte
        tpf = division & 0xFF
        if fps not in (24, 25, 29, 30) or tpf == 0:
            raise ValueError(f"bad SMPTE division {division:#06x}")
        sec_per_tick = 1.0 / (fps * tpf)
    elif division == 0:
        raise ValueError("zero ticks-per-quarter")

    pos, tracks = 14 + (hlen - 6), []
    for _ in range(ntrks):
        if pos + 8 > len(payload):
            raise ValueError("truncated track header")
        magic, tlen = struct.unpack_from(">4sI", payload, pos)
        if magic != b"MTrk":
            raise ValueError("expected MTrk chunk")
        pos += 8
        body = payload[pos:pos + tlen]
        if len(body) != tlen:
            raise ValueError("truncated track payload")
        pos += tlen
        tracks.append(_scan_track(body))

    global_tempos = [e for _, ts in tracks for e in ts] if fmt != 2 else None
    pitches: list[float] = []
    on_t: list[float] = []
    dur_t: list[float] = []
    for notes, own_tempos in tracks:
        if not notes:
            continue
        ticks = np.array([t for t, _, _, _ in notes], dtype=np.float64)
        if smpte:
            secs = ticks * sec_per_tick
        else:
            secs = _tick_seconds(
                ticks, own_tempos if fmt == 2 else global_tempos, division)
        open_notes: dict[tuple[int, int], deque[int]] = defaultdict(deque)
        for i, (_, kind, ch, pitch) in enumerate(notes):
            if kind == 1:
                open_notes[(ch, pitch)].append(len(pitches))
                pitches.append(float(pitch))
                on_t.append(secs[i])
                dur_t.append(np.nan)  # until the off arrives
            else:
                q = open_notes.get((ch, pitch))
                if q:  # stray note-offs are ignored (music21 does too)
                    j = q.popleft()
                    dur_t[j] = secs[i] - on_t[j]
    return (np.array(pitches, dtype=np.float64),
            np.array(on_t, dtype=np.float64),
            np.array(dur_t, dtype=np.float64))


# ----------------------------------------------------------------- encode

def encode_smf(tracks: list[list[tuple]], division: int = 480,
               tempos: list[tuple[int, int]] | None = None,
               fmt: int | None = None, running_status: bool = False,
               off_via_velocity0: bool = False) -> bytes:
    """Deterministic SMF writer for tests.

    ``tracks`` is a list of tracks, each a list of
    ``(onset_tick, dur_tick, pitch, velocity, channel)`` notes
    (``dur_tick=None`` emits a note-on with no matching off). ``tempos``
    are ``(abs_tick, us_per_quarter)`` placed in the first track.
    ``running_status`` / ``off_via_velocity0`` exercise those decoder
    paths with spec-legal encodings.
    """
    if fmt is None:
        fmt = 0 if len(tracks) == 1 else 1
    chunks = [struct.pack(">4sIHHH", b"MThd", 6, fmt, len(tracks),
                          division)]
    for ti, notes in enumerate(tracks):
        events: list[tuple[int, int, int, int, bytes | None]] = []
        if ti == 0:
            for tick, us in (tempos or []):
                events.append((tick, 0, 0xFF, 0x51,
                               us.to_bytes(3, "big")))
        for onset, dur, pitch, vel, ch in notes:
            events.append((onset, 1, 0x90 | ch, pitch, bytes([vel])))
            if dur is not None:
                if off_via_velocity0:
                    events.append((onset + dur, 2, 0x90 | ch, pitch,
                                   b"\x00"))
                else:
                    events.append((onset + dur, 2, 0x80 | ch, pitch,
                                   b"\x40"))
        events.sort(key=lambda e: (e[0], e[1]))
        body, last_tick, last_status = bytearray(), 0, None
        for tick, _, status, d1, extra in events:
            body += _encode_varint(tick - last_tick)
            last_tick = tick
            if status == 0xFF:
                body += bytes([0xFF, d1, len(extra)]) + extra
                last_status = None
            else:
                if not (running_status and status == last_status):
                    body.append(status)
                last_status = status
                body += bytes([d1]) + (extra or b"")
        body += bytes([0x00, 0xFF, 0x2F, 0x00])  # end of track
        chunks.append(struct.pack(">4sI", b"MTrk", len(body)) + bytes(body))
    return b"".join(chunks)


# --------------------------------------------------------------- features

def midi_features(pitches: np.ndarray, onsets: np.ndarray,
                  durations: np.ndarray) -> np.ndarray:
    """Parsed score -> 16 float32 features: note count, span seconds,
    pitch mean/std/min/max, mean duration, no-off fraction, and an
    8-segment mean-pitch contour (the tempo-robust melodic shape the
    reference's kernels compare)."""
    n = len(pitches)
    if n == 0:
        return np.zeros(16, dtype=np.float32)
    d_ok = durations[~np.isnan(durations)]
    head = np.array([
        n, float(onsets.max() - onsets.min()), pitches.mean(),
        pitches.std(), pitches.min(), pitches.max(),
        d_ok.mean() if len(d_ok) else 0.0,
        float(np.isnan(durations).mean())], dtype=np.float32)
    seg = np.array_split(pitches, 8)
    contour = np.array([s.mean() if len(s) else 0.0 for s in seg],
                       dtype=np.float32)
    return np.concatenate([head, contour]).astype(np.float32)


# ------------------------------------------------------------------ stage

class MidiParseStage:
    """Actor-pool structured-parse stage: (doc_id, payload) -> the
    ``sequences`` schema plus skip-on-fail provenance.

    Emits one row per input doc: ``ok=True`` rows carry the parsed
    pitch/onset/duration lists (NaN durations become nulls, matching the
    fixture's None durations); ``ok=False`` rows carry empty lists and
    the error string — the reference's skip-list + log file
    (``loader.py:92-97``) as data instead of a side effect, so the
    skip COUNT survives the pipeline (S8 metrics analog).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        values, onsets, durs, oks, errs = [], [], [], [], []
        for payload in batch["payload"].to_pylist():
            try:
                p, o, d = parse_midi(payload if payload else b"")
            except ValueError as e:
                values.append([])
                onsets.append([])
                durs.append([])
                oks.append(False)
                errs.append(str(e))
            else:
                values.append(p.tolist())
                onsets.append(o.tolist())
                durs.append([None if np.isnan(x) else x for x in d])
                oks.append(True)
                errs.append(None)
        lf = pa.list_(pa.float32())
        return pa.table({
            "doc_id": batch["doc_id"],
            "values": pa.array(values, type=lf),
            "onsets": pa.array(onsets, type=lf),
            "durations": pa.array(durs, type=lf),
            "n_notes": pa.array([len(v) for v in values], type=pa.int64()),
            "ok": pa.array(oks),
            "error": pa.array(errs, type=pa.string()),
        })
