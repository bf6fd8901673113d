"""Retrieval pipeline + matching-kernel tests (reference search flow)."""

import numpy as np
import pyarrow as pa
import pytest

from lsh_ray.functions.kernels import (KERNELS, bals, cosine_similarity,
                                       jaccard_sets, ktra, linear_scaling,
                                       manhattan_distance, rank_candidates,
                                       recursive_alignment, rescale)


# ---------------------------------------------------------- kernels (V1-V9)

def test_cosine():
    assert cosine_similarity([1, 0], [1, 0]) == pytest.approx(1.0)
    assert cosine_similarity([1, 0], [0, 1]) == pytest.approx(0.0)
    assert cosine_similarity([], []) == 0.0
    assert cosine_similarity([0, 0], [1, 1]) == 0.0  # zero norm


def test_manhattan_zero_pad():
    # reference zero-pads the shorter side (matching_algorithms.py:137-150)
    assert manhattan_distance([1, 2, 3], [1, 2]) == 3.0
    assert manhattan_distance([5], [5]) == 0.0


def test_rescale_factors():
    s = np.arange(10, dtype=float)
    assert len(rescale(s, 0.5)) == 5
    assert len(rescale(s, 1.5)) == 15
    assert rescale(s, 1.0).tolist() == s.tolist()


def test_linear_scaling_finds_tempo_match():
    base = np.sin(np.linspace(0, 6, 120))
    slow = rescale(base, 1.25)   # tempo-stretched version
    # LS must beat plain manhattan because one variant realigns the tempo
    assert linear_scaling(base, slow) <= manhattan_distance(base, slow)
    assert linear_scaling(base, base) == 0.0


def test_bals_shift_invariance():
    base = np.sin(np.linspace(0, 6, 120))
    shifted = np.concatenate([np.full(15, base[0]), base])  # front-padded
    assert bals(base, shifted) <= linear_scaling(base, shifted)


def test_recursive_alignment_improves_on_ls():
    rng = np.random.default_rng(2)
    a = rng.standard_normal(100)
    # candidate = two halves of a with different local offsets
    cand = np.concatenate([a[:50] + 1.0, a[50:] - 1.0])
    assert recursive_alignment(a, cand) <= linear_scaling(a, cand)


def test_ktra_transposition_invariance():
    rng = np.random.default_rng(3)
    a = rng.standard_normal(60)
    transposed = a + 5.0  # key shift
    # mean-subtraction makes the transposed copy near-identical
    assert ktra(a, transposed) < manhattan_distance(a, transposed) / 10


def test_jaccard_sets_percent_scale():
    # reference scales Jaccard x100 (matching_algorithms.py:70)
    assert jaccard_sets([1, 2, 3, 4], [3, 4, 5, 6]) == pytest.approx(
        100 * 2 / 6)


def test_kernel_registry_contract():
    q = np.arange(20, dtype=float)
    c = np.arange(20, dtype=float) + 0.5
    for name, fn in KERNELS.items():
        val = fn(q, c)
        assert np.isfinite(val), name


def test_rank_candidates_order():
    q = np.arange(30, dtype=float)
    cands = [("exact", q.copy()), ("off", q + 3), ("far", q * 5)]
    ranked = rank_candidates(q, cands, kernel="ls")
    assert ranked[0][0] == "exact"
    ranked_sim = rank_candidates(q, [("same", q), ("orth", -q)],
                                 kernel="cosine")
    assert ranked_sim[0][0] == "same"  # similarity ranks descending


# ------------------------------------------------------- retrieval pipeline

@pytest.fixture(scope="module")
def search_setup(ray_session):
    import ray.data

    from lsh_ray.fixtures import _make_vocab, _mutate, _zipf_doc
    rng = np.random.default_rng(11)
    vocab = _make_vocab(rng)
    corpus_texts = [" ".join(_zipf_doc(rng, vocab, int(rng.integers(80, 400))))
                    for _ in range(200)]
    corpus = ray.data.from_arrow(pa.table({
        "url": [f"doc://{i}" for i in range(len(corpus_texts))],
        "text": corpus_texts,
        "lang": ["en"] * len(corpus_texts),
    }))
    golden = {}
    q_urls, q_texts = [], []
    for qi in range(25):
        src = int(rng.integers(0, len(corpus_texts)))
        mut = _mutate(rng, corpus_texts[src].split(" "), 0.03, vocab)
        q_urls.append(f"query://{qi}")
        q_texts.append(" ".join(mut))
        golden[f"query://{qi}"] = f"doc://{src}"
    queries = ray.data.from_arrow(pa.table({
        "url": q_urls, "text": q_texts, "lang": ["en"] * len(q_urls),
    }))
    return corpus, queries, golden


def test_search_finds_golden_docs(search_setup):
    from lsh_ray.pipelines.search import evaluate_mrr, search
    corpus, queries, golden = search_setup
    results = search(corpus, queries, top_k=10)
    assert len(results) > 0
    mrr = evaluate_mrr(results, golden)
    assert mrr >= 0.9, f"MRR {mrr}"


def test_confidence_training_and_clipping(search_setup):
    from lsh_ray.pipelines.search import (search,
                                          train_confidence_threshold)
    corpus, queries, golden = search_setup
    results = search(corpus, queries, top_k=10)
    thr = train_confidence_threshold(results, golden)
    assert 0.0 <= thr <= 1.0 + 1e-9
    clipped = search(corpus, queries, top_k=10, confidence_threshold=thr)
    assert len(clipped) <= len(results)
    # reference polarity (lsh.py:400-407): top-1s with confidence <=
    # threshold are REMOVED. The threshold is the max confidence over
    # wrong top-1s, so EVERY known-wrong top-1 must be clipped.
    top1 = results[results["rank"] == 1]
    wrong = {(q, d) for q, d in zip(top1.query_url, top1.doc_url)
             if golden.get(q) != d}
    clipped_top1 = {(q, d) for q, d in
                    zip(clipped[clipped["rank"] == 1].query_url,
                        clipped[clipped["rank"] == 1].doc_url)}
    assert not (wrong & clipped_top1), wrong & clipped_top1
    # ...and correct top-1s with confidence above the gate survive
    surviving = results[(results["rank"] == 1)
                        & (results.confidence > thr)]
    assert set(zip(surviving.query_url,
                   surviving.doc_url)) <= clipped_top1 | wrong


def test_search_cascade_recovers_failed_queries(ray_session):
    """NLSH->PLSH cascade analog (lsh.py:498-570): stage-1-rejected
    queries re-search under the next config with their rejected top-1
    carried as removed_candidates (so it cannot reappear), and recover
    via their second-best candidate."""
    import dataclasses

    import ray.data

    from lsh_ray.config import DEFAULT_CONFIG
    from lsh_ray.fixtures import _make_vocab, _mutate, _zipf_doc
    from lsh_ray.pipelines.search import search, search_cascade
    rng = np.random.default_rng(12)
    vocab = _make_vocab(rng)
    # each source doc gets a near-copy in the corpus, so every query has
    # >= 2 candidates (confidence < 1, and a fallback after exclusion)
    base_texts = [" ".join(_zipf_doc(rng, vocab,
                                     int(rng.integers(80, 200))))
                  for _ in range(60)]
    copies = [" ".join(_mutate(rng, t.split(" "), 0.05, vocab))
              for t in base_texts]
    urls = ([f"doc://{i}" for i in range(60)]
            + [f"copy://{i}" for i in range(60)])
    corpus = ray.data.from_arrow(pa.table({
        "url": urls, "text": base_texts + copies,
        "lang": ["en"] * len(urls)}))
    q_urls, q_texts = [], []
    for qi in range(15):
        mut = _mutate(rng, base_texts[qi].split(" "), 0.03, vocab)
        q_urls.append(f"query://{qi}")
        q_texts.append(" ".join(mut))
    queries = ray.data.from_arrow(pa.table({
        "url": q_urls, "text": q_texts, "lang": ["en"] * len(q_urls)}))

    fine = DEFAULT_CONFIG
    coarse = dataclasses.replace(DEFAULT_CONFIG, shingle_k=3)
    base = search(corpus, queries, fine, top_k=10)
    top1 = base[base["rank"] == 1]
    assert (top1.confidence < 1.0).any()  # multi-candidate fixture worked
    thr = float(top1.confidence.median())
    out = search_cascade(corpus, queries, [fine, coarse], top_k=10,
                         confidence_threshold=thr)
    rejected = {(q, d) for q, d, c in zip(top1.query_url, top1.doc_url,
                                          top1.confidence) if c <= thr}
    assert rejected  # the gate actually rejected someone
    # rejected (query, top-1) pairs are carried as removed_candidates
    reappeared = rejected & set(zip(out.query_url, out.doc_url))
    assert not reappeared, reappeared
    # passed queries keep their results; rejected ones recover via the
    # near-copy under the coarse config
    passed_q = {q for q, _, c in zip(top1.query_url, top1.doc_url,
                                     top1.confidence) if c > thr}
    assert passed_q <= set(out.query_url)
    recovered = {q for q, _ in rejected} & set(out.query_url)
    assert recovered, "no rejected query recovered via stage 2"


def test_search_kernel_dispatch_matches_rank_candidates(search_setup):
    """Distributed kernel ranking (reference -ma dispatch) == driver-side
    rank_candidates over the same token sequences, for a distance kernel
    (ls) and the transposition-invariant one (ktra)."""
    from lsh_ray.pipelines.search import search, token_sequence
    corpus, queries, golden = search_setup
    base = search(corpus, queries, top_k=10)  # jaccard candidate surface
    corpus_txt = {r["url"]: r["text"] for r in corpus.take_all()}
    query_txt = {r["url"]: r["text"] for r in queries.take_all()}
    for kernel in ("ls", "ktra"):
        got = search(corpus, queries, top_k=10, kernel=kernel)
        assert "score" in got.columns
        assert set(got.query_url) == set(base.query_url)
        for q in sorted(set(got.query_url))[:5]:
            sub = got[got.query_url == q].sort_values("rank")
            cands = [(d, token_sequence(corpus_txt[d]))
                     for d in base[base.query_url == q].doc_url]
            expected = rank_candidates(token_sequence(query_txt[q]),
                                       cands, kernel=kernel)
            k = len(sub)
            assert sub.doc_url.tolist() == [n for n, _ in expected][:k]
            np.testing.assert_allclose(
                sub.score.to_numpy(), [s for _, s in expected][:k],
                rtol=1e-9)


def test_search_kernel_similarity_orders_descending(search_setup):
    from lsh_ray.pipelines.search import search
    corpus, queries, _ = search_setup
    got = search(corpus, queries, top_k=10, kernel="cosine")
    for q, sub in got.groupby("query_url"):
        s = sub.sort_values("rank").score.to_numpy()
        assert (np.diff(s) <= 1e-12).all()  # similarity: descending


def test_search_unknown_kernel_rejected(search_setup):
    from lsh_ray.pipelines.search import search
    corpus, queries, _ = search_setup
    with pytest.raises(ValueError):
        search(corpus, queries, kernel="nope")
