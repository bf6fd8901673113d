"""SemDeDup-style semantic dedup (stages/dedup.semantic_dedup):
assignment, keep rule, and planted-duplicate behavior vs a brute-force
numpy reference."""

import numpy as np
import pyarrow as pa
import pytest

from lsh_ray.config import PipelineConfig


def _ref(vecs: np.ndarray, ids: np.ndarray, n_centroids: int,
         tau: float):
    """Brute-force reference: argmax-cosine assignment to the first
    n_centroids ids' vectors, then drop iff any lower-id cluster-mate
    has cosine >= tau."""
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    vn = vecs / np.maximum(
        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-300)
    C = vn[ids < n_centroids]
    cl = np.argmax(vn @ C.T, axis=1)
    keep = np.ones(len(ids), dtype=np.int64)
    max_lower = np.full(len(ids), -1.0)
    for i in range(len(ids)):
        mates = np.flatnonzero((cl == cl[i]) & (ids < ids[i]))
        if len(mates):
            mc = (vn[mates] @ vn[i]).max()
            max_lower[i] = mc
            if mc >= tau:
                keep[i] = 0
    return ids, cl, keep, max_lower


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    ids = np.arange(300, dtype=np.int64)
    # plant 30 exact-direction copies (power-of-two scale: cosine == 1)
    vecs = np.concatenate([vecs, vecs[:30] * 2.0])
    ids = np.concatenate([ids, ids[:30] + 10_000])
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([v for v in vecs],
                              type=pa.list_(pa.float32()))})
    return ray.data.from_arrow(t), vecs.astype(np.float64), ids


def test_semantic_dedup_matches_reference(emb_ds):
    from lsh_ray.stages.dedup import semantic_dedup
    ds, vecs, ids = emb_ds
    out = semantic_dedup(ds, dim=16, config=PipelineConfig(),
                         n_centroids=5, tau=0.9).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    rids, rcl, rkeep, rml = _ref(vecs, ids, n_centroids=5, tau=0.9)
    assert np.array_equal(out["vec_id"].to_numpy(), rids)
    assert np.array_equal(out["cluster"].to_numpy(), rcl)
    assert np.array_equal(out["keep"].to_numpy(), rkeep)
    assert np.allclose(out["max_lower_cos"].to_numpy(), rml, atol=2e-6)


def test_planted_copies_drop_and_originals_survive(emb_ds):
    from lsh_ray.stages.dedup import semantic_dedup
    ds, _, _ = emb_ds
    out = semantic_dedup(ds, dim=16, config=PipelineConfig(),
                         n_centroids=5, tau=0.9).to_pandas()
    planted = out[out["vec_id"] >= 10_000]
    originals = out[out["vec_id"] < 10_000]
    assert len(planted) == 30
    assert (planted["keep"] == 0).all()
    assert (planted["max_lower_cos"] == 1.0).all()
    # scale-invariant assignment: copy landed in its original's cluster
    merged = planted.assign(orig=planted["vec_id"] - 10_000).merge(
        originals, left_on="orig", right_on="vec_id",
        suffixes=("_c", "_o"))
    assert (merged["cluster_c"] == merged["cluster_o"]).all()
    # originals never drop on account of their higher-id copies
    assert originals["keep"].sum() + 0 >= len(originals) - 30
