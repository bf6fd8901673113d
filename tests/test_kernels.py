"""Unit tests for verification kernels, union-find and suffix utilities."""
import numpy as np
import pyarrow as pa

from lsh_ray.functions.suffix import (build_suffix_array, kasai_lcp,
                                      is_exact_substring,
                                      longest_common_substring_len)
from lsh_ray.functions.unionfind import UnionFind
from lsh_ray.stages.banding import band_keys_from_minhash
from lsh_ray.stages.verify import _popcount64, jaccard_and_containment


def _pair_arrays(a, b):
    a = np.array(sorted(set(a)), dtype=np.uint64)
    b = np.array(sorted(set(b)), dtype=np.uint64)
    vals_a, vals_b = a, b
    return (vals_a, np.array([0, len(a)]), vals_b, np.array([0, len(b)]))


def test_jaccard_matches_set_math():
    # reference formula: |∩| / |∪| (matching_algorithms.py:65-72)
    a = [1, 2, 3, 4, 5]
    b = [3, 4, 5, 6]
    jac, cont = jaccard_and_containment(*_pair_arrays(a, b))
    assert abs(jac[0] - 3 / 6) < 1e-6
    assert abs(cont[0] - 3 / 4) < 1e-6  # containment over smaller set


def test_jaccard_disjoint_and_identical():
    jac, cont = jaccard_and_containment(*_pair_arrays([1, 2], [3, 4]))
    assert jac[0] == 0 and cont[0] == 0
    jac, cont = jaccard_and_containment(*_pair_arrays([1, 2], [1, 2]))
    assert jac[0] == 1 and cont[0] == 1


def test_popcount():
    x = np.array([0, 1, 3, 2**64 - 1], dtype=np.uint64)
    assert _popcount64(x).tolist() == [0, 1, 2, 64]


def test_band_keys_shape_and_determinism():
    rng = np.random.default_rng(3)
    mh = rng.integers(0, 2**63, size=(4, 128), dtype=np.uint64)
    k1 = band_keys_from_minhash(mh, 32, 4)
    k2 = band_keys_from_minhash(mh, 32, 4)
    assert k1.shape == (4, 32)
    assert (k1 == k2).all()
    # identical signatures -> identical keys in every band
    mh2 = np.vstack([mh[0], mh[0]])
    kk = band_keys_from_minhash(mh2, 32, 4)
    assert (kk[0] == kk[1]).all()
    # same values in different bands must not collide (band salt)
    const = np.full((1, 128), 7, dtype=np.uint64)
    kc = band_keys_from_minhash(const, 32, 4)
    assert len(np.unique(kc)) == 32


def test_union_find_components_min_label():
    uf = UnionFind()
    uf.union(5, 3)
    uf.union(3, 9)
    uf.union(100, 200)
    comp = uf.components()
    assert comp[5] == comp[3] == comp[9] == 3
    assert comp[100] == comp[200] == 100


def test_union_find_order_invariance():
    edges = [(5, 3), (3, 9), (9, 1), (100, 200)]
    comps = []
    for perm in (edges, edges[::-1], [edges[2], edges[0], edges[3], edges[1]]):
        uf = UnionFind()
        for a, b in perm:
            uf.union(a, b)
        comps.append(uf.components())
    assert comps[0] == comps[1] == comps[2]


def test_suffix_array_correct():
    s = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
    sa = build_suffix_array(s)
    suffixes = [b"banana"[i:] for i in sa]
    assert suffixes == sorted(b"banana"[i:] for i in range(6))


def test_kasai_lcp():
    s = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
    sa = build_suffix_array(s)
    lcp = kasai_lcp(s, sa)
    # banana: sorted suffixes a, ana, anana, banana, na, nana
    assert lcp.tolist() == [0, 1, 3, 0, 0, 2]


def test_lcs_len():
    assert longest_common_substring_len(b"hello world", b"say hello there") == 6
    assert longest_common_substring_len(b"abc", b"xyz") == 0
    assert longest_common_substring_len(b"", b"abc") == 0
    inner = b"the quick brown fox jumps"
    assert longest_common_substring_len(b"pre " + inner + b" post", inner) == len(inner)


def test_is_exact_substring():
    assert is_exact_substring("abc", "xxabcyy")
    assert not is_exact_substring("abd", "xxabcyy")


def test_salted_hot_group_pairs():
    """Hot band groups use salted splits: bounded pair count, full
    connectivity (north_rule's salted-band-key mechanism)."""
    from lsh_ray.functions.unionfind import UnionFind
    from lsh_ray.stages.candidates import _salted_pairs
    rng = np.random.default_rng(7)
    d = np.unique(rng.integers(0, 2**63, size=500, dtype=np.uint64))
    a, b = _salted_pairs(d, 8)
    # bounded: far fewer than the m^2/2 full cross product
    assert len(a) < len(d) ** 2 / 8
    # canonical orientation
    assert (a < b).all()
    # connectivity: every doc reachable in one component
    uf = UnionFind()
    for x, y in zip(a.tolist(), b.tolist()):
        uf.union(x, y)
    comp = uf.components()
    assert len(set(comp.values())) == 1
    assert set(comp) == set(d.tolist())
