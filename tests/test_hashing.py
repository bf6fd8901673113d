import numpy as np
import pytest

from lsh_ray.functions.hashing import (combine_columns, hash_pair,
                                       hash_strings, rolling_hash, splitmix64)


def test_hash_strings_deterministic():
    a = hash_strings(["foo", "bar", "foo"])
    b = hash_strings(["foo", "bar", "foo"])
    assert a.dtype == np.uint64
    assert (a == b).all()
    assert a[0] == a[2] and a[0] != a[1]


def test_hash_strings_empty():
    assert hash_strings([]).shape == (0,)


def test_splitmix_bijective_distinct():
    x = np.arange(1000, dtype=np.uint64)
    y = splitmix64(x)
    assert len(np.unique(y)) == 1000


def test_rolling_hash_window_count():
    h = np.arange(10, dtype=np.uint64)
    assert rolling_hash(h, 3).shape == (8,)
    assert rolling_hash(h, 3, stride=2).shape == (4,)
    assert rolling_hash(h[:2], 3).shape == (0,)


def test_rolling_hash_position_invariance():
    # same k-gram content => same hash, regardless of position
    h1 = hash_strings(["a", "b", "c", "d", "e"])
    h2 = hash_strings(["x", "a", "b", "c", "d", "e"])
    r1 = rolling_hash(h1, 3)
    r2 = rolling_hash(h2, 3)
    assert set(r1.tolist()) <= set(r2.tolist())


def test_combine_columns_salt():
    a = np.array([1, 2], dtype=np.uint64)
    b = np.array([3, 4], dtype=np.uint64)
    c0 = combine_columns([a, b], salt=0)
    c1 = combine_columns([a, b], salt=1)
    assert (c0 != c1).all()
    assert (combine_columns([a, b], salt=0) == c0).all()


def test_hash_pair_order_sensitive():
    a = np.array([1], dtype=np.uint64)
    b = np.array([2], dtype=np.uint64)
    assert hash_pair(a, b)[0] != hash_pair(b, a)[0]
