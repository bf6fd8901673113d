import numpy as np
import pyarrow as pa
import pytest

from lsh_ray.config import PipelineConfig
from lsh_ray.stages.minhash import (SignatureStage, make_perm_params,
                                    minhash_of_values, simhash_of_values)


def _rand_sets(rng, n_common, n_a, n_b):
    common = rng.integers(0, 2**63, size=n_common, dtype=np.uint64)
    a = np.unique(np.concatenate(
        [common, rng.integers(0, 2**63, size=n_a, dtype=np.uint64)]))
    b = np.unique(np.concatenate(
        [common, rng.integers(0, 2**63, size=n_b, dtype=np.uint64)]))
    return a, b


def test_perm_params_seed_determinism():
    a1, b1 = make_perm_params(128, 42)
    a2, b2 = make_perm_params(128, 42)
    a3, _ = make_perm_params(128, 7)
    assert (a1 == a2).all() and (b1 == b2).all()
    assert (a1 != a3).any()
    assert (a1 % 2 == 1).all()  # odd multipliers


def test_minhash_identical_sets_identical_sigs():
    a, b = make_perm_params(128, 42)
    s = np.array([5, 9, 13, 77], dtype=np.uint64)
    vals = np.concatenate([s, s])
    offs = np.array([0, 4, 8])
    mh = minhash_of_values(vals, offs, a, b)
    assert (mh[0] == mh[1]).all()


def test_minhash_estimates_jaccard():
    """MinHash collision rate approximates true Jaccard (property test,
    reference analog: permutation sketch equivalence, lsh.py:236-255)."""
    rng = np.random.default_rng(0)
    a_par, b_par = make_perm_params(256, 42)
    for n_common, n_extra in [(800, 200), (500, 500), (100, 900)]:
        sa, sb = _rand_sets(rng, n_common, n_extra, n_extra)
        true_j = len(np.intersect1d(sa, sb)) / len(np.union1d(sa, sb))
        vals = np.concatenate([sa, sb])
        offs = np.array([0, len(sa), len(sa) + len(sb)])
        mh = minhash_of_values(vals, offs, a_par, b_par)
        est = (mh[0] == mh[1]).mean()
        assert abs(est - true_j) < 0.08, (true_j, est)


def test_simhash_hamming_tracks_similarity():
    rng = np.random.default_rng(1)
    sa, sb = _rand_sets(rng, 950, 30, 30)      # very similar
    sc = rng.integers(0, 2**63, size=1000, dtype=np.uint64)  # unrelated
    vals = np.concatenate([sa, sb, np.unique(sc)])
    offs = np.array([0, len(sa), len(sa) + len(sb),
                     len(sa) + len(sb) + len(np.unique(sc))])
    sh = simhash_of_values(vals, offs)
    ham_ab = bin(int(sh[0]) ^ int(sh[1])).count("1")
    ham_ac = bin(int(sh[0]) ^ int(sh[2])).count("1")
    assert ham_ab < 10
    assert ham_ac > 20


def test_signature_stage_batch():
    cfg = PipelineConfig()
    stage = SignatureStage(cfg)
    sh = pa.ListArray.from_arrays(
        pa.array([0, 3, 6], type=pa.int32()),
        pa.array([1, 2, 3, 1, 2, 3], type=pa.uint64()))
    batch = pa.table({
        "doc_id": pa.array([10, 20], type=pa.uint64()),
        "url": ["a", "b"],
        "shingles": sh,
        "n_shingles": pa.array([3, 3], type=pa.int32()),
    })
    out = stage(batch)
    mh = out["minhash"].combine_chunks()
    m0 = mh.values.to_numpy(zero_copy_only=False)[:128]
    m1 = mh.values.to_numpy(zero_copy_only=False)[128:]
    assert (m0 == m1).all()
    assert out["simhash"][0].as_py() == out["simhash"][1].as_py()


def test_signature_stage_empty_batch():
    cfg = PipelineConfig()
    stage = SignatureStage(cfg)
    sh = pa.ListArray.from_arrays(pa.array([0], type=pa.int32()),
                                  pa.array([], type=pa.uint64()))
    batch = pa.table({
        "doc_id": pa.array([], type=pa.uint64()),
        "url": pa.array([], type=pa.string()),
        "shingles": sh.slice(0, 0),
        "n_shingles": pa.array([], type=pa.int32()),
    })
    out = stage(batch)
    assert out.num_rows == 0


def test_max_sketch_estimates_jaccard():
    """The "max" selection function (reference constants.py:6-10) is an
    equally valid permutation-sketch family: collision probability of the
    per-permutation maximum equals the Jaccard similarity."""
    from lsh_ray.stages.minhash import sketch_of_values
    rng = np.random.default_rng(3)
    sa, sb = _rand_sets(rng, 600, 200, 200)
    values = np.concatenate([sa, sb])
    offsets = np.array([0, len(sa), len(sa) + len(sb)], dtype=np.int64)
    a, b = make_perm_params(256, 42)
    sk = sketch_of_values(values, offsets, a, b, selector="max")
    est = (sk[0] == sk[1]).mean()
    inter = len(np.intersect1d(sa, sb))
    true_j = inter / (len(sa) + len(sb) - inter)
    assert abs(est - true_j) < 0.1


def test_selection_registry_min_matches_minhash():
    from lsh_ray.stages.minhash import (SELECTION_FUNCTIONS,
                                        sketch_of_values)
    assert set(SELECTION_FUNCTIONS) == {"min", "max"}
    rng = np.random.default_rng(5)
    sa, sb = _rand_sets(rng, 100, 50, 50)
    values = np.concatenate([sa, sb])
    offsets = np.array([0, len(sa), len(sa) + len(sb)], dtype=np.int64)
    a, b = make_perm_params(64, 42)
    assert (sketch_of_values(values, offsets, a, b, "min")
            == minhash_of_values(values, offsets, a, b)).all()
    # min and max sketches of the same permutation family differ
    assert (sketch_of_values(values, offsets, a, b, "max")
            != minhash_of_values(values, offsets, a, b)).any()


def test_signature_stage_max_selection():
    """config.selection="max" flows through the signature stage and still
    gives identical sketches for identical docs."""
    cfg = PipelineConfig(num_perms=64, bands=16, rows_per_band=4,
                         selection="max")
    stage = SignatureStage(cfg)
    sh = pa.array([[1, 2, 3, 4, 5]] * 2, type=pa.list_(pa.uint32()))
    batch = pa.table({
        "doc_id": pa.array([10, 11], type=pa.uint64()),
        "url": pa.array(["u1", "u2"]),
        "shingles": sh,
        "n_shingles": pa.array([5, 5], type=pa.int32()),
    })
    out = stage(batch)
    m = out["minhash"].to_pylist()
    assert m[0] == m[1]
    cfg_min = PipelineConfig(num_perms=64, bands=16, rows_per_band=4)
    assert SignatureStage(cfg_min)(batch)["minhash"].to_pylist()[0] != m[0]
