"""Reference-conformance tests over the sequences fixture (FIXTURES.md §2):
windowing semantics at the reference's exact constants, seeded permutation
reproducibility, and the full LSH machinery running on sequence data."""

import numpy as np
import pytest

from lsh_ray.fixtures import generate_sequences
from lsh_ray.functions.windows_ref import (NLSH_WINDOW, PLSH_INTERVAL,
                                           PLSH_SHIFT, PLSH_WINDOW,
                                           hash_windows, nlsh_expand,
                                           nlsh_windows, plsh_windows,
                                           sequence_shingles)
from lsh_ray.stages.minhash import make_perm_params, minhash_of_values


def test_sequences_fixture_shape():
    t = generate_sequences(50, seed=1)
    assert t.num_rows == 50
    assert t["values"][0].as_py() is not None
    # nulls present in durations (reference None holes, loader.py:117)
    assert any(None in row for row in t["durations"].to_pylist())


def test_plsh_window_arithmetic():
    # reference constants: window 60, shift 15, subsample 2 (lsh.py:46-48);
    # floor(len/shift) windows INCLUDING truncated tails (lsh.py:52-60)
    v = np.arange(120, dtype=np.float32)
    wins = plsh_windows(v)
    # starts at 0,15,...,105: floor(120/15) = 8 windows, last 3 truncated
    assert len(wins) == 8
    assert all(len(w) == PLSH_WINDOW // PLSH_INTERVAL for w in wins[:5])
    assert [len(w) for w in wins[5:]] == [23, 15, 8]  # tail windows
    assert wins[0].tolist() == list(range(0, 60, 2))
    assert wins[1][0] == PLSH_SHIFT


def test_plsh_short_sequence_windows():
    v = np.arange(30, dtype=np.float32)
    wins = plsh_windows(v)
    assert len(wins) == 2  # floor(30/15), tail window included
    assert len(wins[0]) == 15  # 30 values subsampled at 2
    assert len(wins[1]) == 8   # truncated tail: v[15:75:2]


def test_nlsh_window_arithmetic():
    # reference constants: window 10, shift 1 (lsh.py:77-79)
    v = np.arange(25, dtype=np.float32)
    wins = nlsh_windows(v)
    assert len(wins) == 25 - NLSH_WINDOW + 1
    assert all(len(w) == NLSH_WINDOW for w in wins)


def test_nlsh_duration_expansion():
    v = np.array([1.0, 2.0])
    d = np.array([3.0, 1.0])
    out = nlsh_expand(v, d)
    assert out.tolist() == [1.0, 1.0, 1.0, 2.0]
    # None/NaN duration counts as 1 (reference skips missing durations)
    out2 = nlsh_expand(v, np.array([np.nan, 2.0]))
    assert out2.tolist() == [1.0, 2.0, 2.0]


def test_window_hash_set_semantics():
    v = np.tile(np.arange(12, dtype=np.float32), 10)
    h = hash_windows(nlsh_windows(v))
    assert len(h) == len(np.unique(h))
    assert (np.sort(h) == h).all()


def test_seeded_permutation_reproducibility_on_sequences():
    """Same seed => identical signatures over sequence shingles (the
    reference's per-permutation seeding guarantee, lsh.py:213-219)."""
    t = generate_sequences(20, seed=3)
    sets = [sequence_shingles(np.array(v), scheme="plsh")
            for v in t["values"].to_pylist()]
    sets = [s for s in sets if len(s)]
    vals = np.concatenate(sets)
    offs = np.concatenate(([0], np.cumsum([len(s) for s in sets])))
    a1, b1 = make_perm_params(128, 42)
    a2, b2 = make_perm_params(128, 42)
    m1 = minhash_of_values(vals, offs, a1, b1)
    m2 = minhash_of_values(vals, offs, a2, b2)
    assert (m1 == m2).all()


def test_sequence_near_duplicates_detected():
    """A sequence and a lightly-mutated copy share most PLSH shingles."""
    rng = np.random.default_rng(5)
    base = rng.integers(40, 80, size=300).astype(np.float32)
    mutated = base.copy()
    mutated[::50] += 1  # sparse mutations
    s1 = sequence_shingles(base, scheme="nlsh")
    s2 = sequence_shingles(mutated, scheme="nlsh")
    inter = len(np.intersect1d(s1, s2))
    union = len(np.union1d(s1, s2))
    assert inter / union > 0.5
    # unrelated sequence shares ~nothing
    other = rng.integers(40, 80, size=300).astype(np.float32)
    s3 = sequence_shingles(other, scheme="nlsh")
    assert len(np.intersect1d(s1, s3)) / len(np.union1d(s1, s3)) < 0.05
