"""Property-based tests (hypothesis) for the kernel invariants the
pipeline's correctness rests on: tokenizer byte-path equivalence, the
exact-Jaccard merge kernel, the prefix-filter guarantee, and codec
roundtrips. Complements the example-based tests with adversarial inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# text fragments mixing unicode, whitespace runs, and empties
_texts = st.lists(
    st.text(alphabet=st.sampled_from(list("ab \t\nü🎵x0.")), max_size=40)
    | st.none(),
    min_size=0, max_size=12)


@settings(max_examples=60, deadline=None)
@given(_texts)
def test_arrow_tokenizer_equivalence_property(texts):
    from lsh_ray.functions.bytetokens import (token_hashes_from_arrow,
                                              token_hashes_from_texts)
    h_a, c_a = token_hashes_from_arrow(pa.array(texts, type=pa.string()))
    h_t, c_t = token_hashes_from_texts(texts)
    assert np.array_equal(h_a, h_t)
    assert np.array_equal(c_a, c_t)


_sets = st.lists(st.integers(0, 50), min_size=0, max_size=40).map(
    lambda xs: np.array(sorted(set(xs)), dtype=np.uint32))


@settings(max_examples=80, deadline=None)
@given(st.lists(st.tuples(_sets, _sets), min_size=1, max_size=6))
def test_jaccard_kernel_matches_set_math(pairs):
    from lsh_ray.stages.verify import jaccard_and_containment
    va = np.concatenate([a for a, _ in pairs]) if pairs else \
        np.empty(0, np.uint32)
    vb = np.concatenate([b for _, b in pairs]) if pairs else \
        np.empty(0, np.uint32)
    offa = np.concatenate(([0], np.cumsum([len(a) for a, _ in pairs])))
    offb = np.concatenate(([0], np.cumsum([len(b) for _, b in pairs])))
    jac, cont = jaccard_and_containment(va, offa, vb, offb)
    for i, (a, b) in enumerate(pairs):
        sa, sb = set(a.tolist()), set(b.tolist())
        inter = len(sa & sb)
        union = len(sa | sb)
        exp_j = np.float32(inter / union) if union else np.float32(0)
        exp_c = np.float32(inter / min(len(sa), len(sb))) \
            if sa and sb else np.float32(0)
        assert jac[i] == exp_j, (i, sa, sb)
        assert cont[i] == exp_c, (i, sa, sb)


@settings(max_examples=80, deadline=None)
@given(_sets, _sets, st.sampled_from([0.5, 0.7, 0.8, 0.9]))
def test_prefix_filter_guarantee(a, b, t):
    """The invariant ngram_jaccard_pairs' recall rests on: if
    J(a, b) >= t then the two prefixes (first len - ceil(t*len) + 1
    elements of each SORTED set) share at least one element."""
    sa, sb = set(a.tolist()), set(b.tolist())
    if not sa or not sb:
        return
    jac = len(sa & sb) / len(sa | sb)
    if jac < t:
        return
    pa_ = a[: len(a) - int(np.ceil(t * len(a))) + 1]
    pb_ = b[: len(b) - int(np.ceil(t * len(b))) + 1]
    assert set(pa_.tolist()) & set(pb_.tolist()), (sa, sb, t, jac)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=400),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_property(samples, rate):
    from lsh_ray.stages.multimodal import decode_wav, encode_wav
    x = np.array(samples, dtype=np.int16)
    out, r = decode_wav(encode_wav(x, rate))
    assert r == rate
    np.testing.assert_array_equal(
        np.round(out * 32768.0).astype(np.int16), x)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_property(h, w, seed):
    from lsh_ray.stages.multimodal import decode_bmp, encode_bmp
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)


# ------------------------------------------------- join bucket kernel ----

_jkeys = st.lists(st.integers(0, 8), min_size=0, max_size=12)


def _join_group(lk, rk):
    """Assemble the tagged union table _join_bucket* receives for one
    bucket: left rows carry a payload 'lv', right rows 'rv' (values
    encode the original row index so matches are checkable)."""
    n_l, n_r = len(lk), len(rk)
    return pa.table({
        "__jkey": pa.array(np.array(lk + rk, dtype=np.uint64)),
        "__side": pa.array(np.array([0] * n_l + [1] * n_r,
                                    dtype=np.int8)),
        "lv": pa.array(list(range(n_l)) + [None] * n_r,
                       type=pa.int64()),
        "rv": pa.array([None] * n_l + [100 + i for i in range(n_r)],
                       type=pa.int64()),
    })


@settings(max_examples=120, deadline=None)
@given(_jkeys, _jkeys, st.sampled_from(["inner", "left", "outer"]))
def test_join_bucket_many_matches_pandas_merge(lk, rk, how):
    import pandas as pd

    from lsh_ray.stages.join import _join_bucket_many
    out = _join_bucket_many(_join_group(lk, rk), ["lv"], ["rv"], how)
    nkey = (lambda t: tuple(-1 if v is None else v for v in t))
    got = sorted(((r["lv"], r["rv"]) for r in out.to_pylist()),
                 key=nkey)
    left = pd.DataFrame({"k": lk, "lv": range(len(lk))})
    right = pd.DataFrame({"k": rk, "rv": [100 + i
                                          for i in range(len(rk))]})
    exp_df = left.merge(right, on="k", how=how)
    exp = sorted(((None if pd.isna(a) else int(a),
                   None if pd.isna(b) else int(b))
                  for a, b in zip(exp_df.lv, exp_df.rv)), key=nkey)
    assert got == exp, (how, lk, rk)


@settings(max_examples=120, deadline=None)
@given(_jkeys, _jkeys, st.sampled_from(["inner", "left"]))
def test_join_bucket_unique_right_matches_pandas(lk, rk, how):
    import pandas as pd

    from lsh_ray.stages.join import _join_bucket
    rk = sorted(set(rk))  # the unique-right contract
    out = _join_bucket(_join_group(lk, rk), ["lv"], ["rv"], how)
    nkey = (lambda t: tuple(-1 if v is None else v for v in t))
    got = sorted(((r["lv"], r["rv"]) for r in out.to_pylist()),
                 key=nkey)
    left = pd.DataFrame({"k": lk, "lv": range(len(lk))})
    right = pd.DataFrame({"k": rk, "rv": [100 + i
                                          for i in range(len(rk))]})
    exp_df = left.merge(right, on="k", how=how)
    exp = sorted(((None if pd.isna(a) else int(a),
                   None if pd.isna(b) else int(b))
                  for a, b in zip(exp_df.lv, exp_df.rv)), key=nkey)
    assert got == exp, (how, lk, rk)


# SMF notes: (onset_tick, dur_tick|None, pitch, velocity, channel)
_notes = st.lists(
    st.tuples(st.integers(0, 10_000),
              st.one_of(st.none(), st.integers(0, 5_000)),
              st.integers(0, 127), st.integers(1, 127),
              st.integers(0, 15)),
    min_size=0, max_size=30)
_tempi = st.lists(st.tuples(st.integers(0, 8_000),
                            st.integers(10_000, 2_000_000)),
                  min_size=0, max_size=3)


@settings(max_examples=80, deadline=None)
@given(_notes, _tempi, st.booleans(), st.booleans())
def test_smf_roundtrip_property(notes, tempi, running, vel0):
    """encode_smf -> parse_midi recovers every note: pitches in stream
    order, onset at the tempo-map time of its tick, duration = off - on
    (NaN when dur is None), for any legal note set, tempo map and
    encoding style (running status / velocity-0 offs).

    Notes sharing a (pitch, channel) are deduplicated first: the SMF
    byte stream cannot attribute an off among simultaneous same-pitch
    ons — pairing is FIFO by convention, pinned separately by
    test_midi.test_overlapping_same_pitch_fifo_pairing."""
    from lsh_ray.stages.midi import encode_smf, parse_midi
    seen: set = set()
    notes = [nt for nt in notes
             if (nt[2], nt[4]) not in seen
             and not seen.add((nt[2], nt[4]))]
    payload = encode_smf([notes], division=480, tempos=sorted(tempi),
                         running_status=running,
                         off_via_velocity0=vel0)
    p, o, d = parse_midi(payload)
    assert len(p) == len(notes)
    # expected stream order: note-ons sorted by onset tick (encoder
    # sorts events by (tick, on-before-off); equal-tick note-ons keep
    # list order because the sort is stable)
    expect = sorted(range(len(notes)), key=lambda i: notes[i][0])
    assert p.tolist() == [float(notes[i][2]) for i in expect]
    assert (np.diff(o) >= -1e-12).all()
    tick = 0.5 / 480  # constant-tempo seconds per tick
    for j, i in enumerate(expect):
        if notes[i][1] is None:
            assert np.isnan(d[j])
        else:
            assert d[j] >= -1e-12
            if not tempi:  # constant tempo: exact tick math
                np.testing.assert_allclose(d[j], notes[i][1] * tick)
                np.testing.assert_allclose(o[j], notes[i][0] * tick)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.integers(0, 6), min_size=0, max_size=12),
                min_size=1, max_size=8),
       st.lists(st.lists(st.integers(0, 6), min_size=0, max_size=12),
                min_size=1, max_size=4),
       st.integers(2, 3))
def test_decontaminate_gram_math_property(corpus_tokens, bench_tokens, n):
    """Pure-python recompute of the decontamination counts: for random
    tiny corpora, n_dirty_grams per doc == the number of its n-gram
    OCCURRENCES whose gram appears anywhere in the benchmark."""
    from lsh_ray.stages.repetition import _gram_tables

    def grams(tokens):
        return [" ".join(map(str, tokens[i:i + n]))
                for i in range(len(tokens) - n + 1)]

    bench_set = {g for ts in bench_tokens for g in grams(ts)}
    texts = [" ".join(map(str, ts)) for ts in corpus_tokens]
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts)})
    doc_ids, _, gram_h, parents = _gram_tables(batch, n)
    # hash the benchmark gram strings with the same kernel
    from lsh_ray.functions.hashing import hash_strings
    bh = set(hash_strings(np.array(sorted(bench_set), dtype=object))
             .tolist()) if bench_set else set()
    got = np.zeros(len(texts), dtype=int)
    for g, par in zip(gram_h.tolist(), parents.tolist()):
        if g in bh:
            got[par] += 1
    expect = [sum(g in bench_set for g in grams(ts))
              for ts in corpus_tokens]
    assert got.tolist() == expect
