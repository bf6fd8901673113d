"""Dedup operator family over the `documents` table.

- **Exact dedup** (rebuild addition; the reference has none — SURVEY.md
  §2.7 D5): content-hash pregroup `groupby(md5(text))`, keep the min-doc_id
  representative. md5 (not SipHash) so a DuckDB oracle can recompute it.
- **SimHash near-dup**: 64-bit SimHash fingerprints banded into 4x16-bit
  pieces (any pair within Hamming distance 3 shares at least one piece by
  pigeonhole), candidate pairs verified with exact Hamming distance.
- **Embedding near-dup**: random-hyperplane (SRP) signatures over a
  float-vector column, banded the same way, verified with exact cosine.

All reuse the candidate-pair machinery of the main MinHash pipeline
(`lsh_ray.stages.candidates`): one key family in, verified pairs out.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Min

from lsh_ray.config import PipelineConfig
from lsh_ray.functions.hashing import splitmix64
from lsh_ray.stages.candidates import candidate_pairs
from lsh_ray.stages.join import bucket_join

_U64 = np.uint64


def add_text_md5(ds, text_col: str = "text"):
    """Append an md5 hex digest column (DuckDB-reproducible content hash).

    Arrow-native batches: md5 is inherently per-row in Python, but the
    batch stays zero-copy Arrow and only the text column round-trips
    through ``to_pylist`` (no whole-batch pandas conversion)."""
    def f(batch: pa.Table) -> pa.Table:
        digests = [hashlib.md5((t or "").encode()).hexdigest()
                   for t in batch[text_col].to_pylist()]
        return batch.append_column(
            "text_hash", pa.array(digests, type=pa.string()))
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def exact_dup_groups(ds):
    """documents -> (text_hash, n_docs, rep_doc_id) per distinct text.

    One tasks-mode co-location by the content hash; Count/Min finish as
    a vectorized run reduce inside the block (the former native groupby
    paid the sort-groupby's sample/sort barrier for the same exchange
    volume — content hashes are mostly unique, so there is nothing for
    a combiner to pre-reduce)."""
    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import _key_hash_u64, colocate_map

    hashed = add_text_md5(ds.select_columns(["doc_id", "text"])) \
        .select_columns(["doc_id", "text_hash"])
    nblocks = min(coalesce_blocks(), 64)

    def group_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "text_hash": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "rep_doc_id": pa.array(
                    [], t.schema.field("doc_id").type)})
        import pyarrow.compute as pc
        order = pc.sort_indices(
            t, sort_keys=[("text_hash", "ascending"),
                          ("doc_id", "ascending")])
        t = t.take(order)
        th = t["text_hash"]
        n = t.num_rows
        neq = pc.not_equal(th.slice(1), th.slice(0, n - 1)).to_numpy(
            zero_copy_only=False) if n > 1 else np.empty(0, bool)
        firsts = np.flatnonzero(np.concatenate(([True], neq)))
        lens = np.diff(np.concatenate((firsts, [n])))
        idx = pa.array(firsts, type=pa.int64())
        return pa.table({
            "text_hash": th.take(idx),
            "n_docs": pa.array(lens.astype(np.int64)),
            "rep_doc_id": t["doc_id"].take(idx),  # min = first after sort
        })

    def th_bucket(t: pa.Table) -> pa.Table:
        h = _key_hash_u64(t, ["text_hash"]) % np.uint64(nblocks)
        return t.append_column("bucket", pa.array(h.astype(np.int32)))

    return colocate_map(hashed, ["text_hash"], nblocks, group_block,
                        sort_bucket_expr=th_bucket)


def exact_dedup(ds):
    """documents -> deduplicated representative doc_ids (min per text)."""
    return exact_dup_groups(ds).map_batches(
        lambda t: pa.table({"doc_id": t["rep_doc_id"]}),
        batch_format="pyarrow")


# ---------------------------------------------------------------- SimHash --

def _simhash_piece_rows(batch: pa.Table, n_pieces: int = 4) -> pa.Table:
    """(doc_id, simhash) -> (band_key, doc_id): one 16-bit piece per band.

    Pigeonhole: hamming(a, b) <= n_pieces - 1 => at least one piece equal.
    """
    sh = batch["simhash"].to_numpy(zero_copy_only=False)
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    width = 64 // n_pieces
    mask = _U64((1 << width) - 1)
    keys = []
    for p in range(n_pieces):
        piece = (sh >> _U64(p * width)) & mask
        with np.errstate(over="ignore"):
            keys.append(splitmix64(piece + _U64(p + 1) * _U64(0xA5A5A5A5A5A5A5A5)))
    band_key = np.concatenate(keys)
    return pa.table({
        "band_key": pa.array(band_key, type=pa.uint64()),
        "doc_id": pa.array(np.tile(doc, n_pieces), type=pa.uint64()),
    })


def simhash_near_dup_pairs(signatures_ds, config: PipelineConfig):
    """signatures -> pairs with exact Hamming <= config.simhash_hamming_max."""
    from lsh_ray.config import coalesce_blocks
    nb = coalesce_blocks(config)
    rows = signatures_ds.select_columns(["doc_id", "simhash"]).map_batches(
        _simhash_piece_rows, batch_format="pyarrow", zero_copy_batch=True)
    pairs = candidate_pairs(rows, config)
    joined = bucket_join(pairs, signatures_ds, "doc_a", "doc_id",
                         ["simhash"], suffix="_a", num_blocks=nb)
    joined = bucket_join(joined, signatures_ds, "doc_b", "doc_id",
                         ["simhash"], suffix="_b", num_blocks=nb)

    def verify(t: pa.Table) -> pa.Table:
        a = t["simhash_a"].to_numpy(zero_copy_only=False)
        b = t["simhash_b"].to_numpy(zero_copy_only=False)
        x = a ^ b
        ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                            axis=1).sum(axis=1).astype(np.int32)
        out = pa.table({
            "doc_a": t["doc_a"], "doc_b": t["doc_b"],
            "hamming": pa.array(ham, type=pa.int32()),
        })
        return out.filter(pa.array(ham <= config.simhash_hamming_max))

    return joined.map_batches(verify, batch_format="pyarrow",
                              zero_copy_batch=True)


# ------------------------------------------------------- embedding cosine --

class SRPSignatureStage:
    """Random-hyperplane signature for embedding vectors (actor pool:
    projection matrix generated once per actor from the pinned seed).

    ``projection="identity"`` selects axis-aligned hyperplanes (bit
    sampling: bit i = sign of component i) instead of random ones — the
    same LSH bucket machinery, but with buckets an external system (e.g.
    a SQL oracle) can recompute from the raw vectors.
    """

    def __init__(self, dim: int, bits: int = 64, seed: int = 42,
                 projection: str = "srp"):
        if projection == "identity":
            self.planes = np.eye(dim, bits)
        else:
            rng = np.random.default_rng(seed)
            self.planes = rng.standard_normal((dim, bits))
        self.bits = bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch["embedding"].combine_chunks()
        vecs = emb.values.to_numpy(zero_copy_only=False).reshape(
            batch.num_rows, -1).astype(np.float64)
        signs = (vecs @ self.planes) > 0
        weights = _U64(1) << np.arange(self.bits, dtype=np.uint64)
        sig = (signs.astype(np.uint64) * weights[None, :]).sum(
            axis=1, dtype=np.uint64)
        return pa.table({
            "doc_id": batch["vec_id"].cast(pa.uint64()),
            "simhash": pa.array(sig, type=pa.uint64()),
        })


class SRPBandRowsStage:
    """Multi-band random-hyperplane LSH for embedding vectors: ``n_bands``
    INDEPENDENT bands of ``band_bits`` hyperplanes each (n_bands*band_bits
    planes total), emitting (band_key, doc_id) rows directly.

    Unlike slicing one 64-bit signature into pieces, independent bands set
    the collision geometry explicitly: a pair at angle theta collides in a
    band w.p. (1 - theta/pi)^band_bits, and in >=1 of B bands w.p.
    1-(1-p)^B — e.g. 8x16 gives ~0.97 recall at cosine 0.98 while a random
    pair collides w.p. ~8/2^16. Actor-pool stage: planes generated once
    per actor from the pinned seed.
    """

    def __init__(self, dim: int, n_bands: int = 8, band_bits: int = 16,
                 seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bands * band_bits))
        self.n_bands = n_bands
        self.band_bits = band_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        emb = batch["embedding"].combine_chunks()
        vecs = emb.values.to_numpy(zero_copy_only=False).reshape(
            n, -1).astype(np.float64)
        signs = (vecs @ self.planes) > 0
        bits = signs.reshape(n, self.n_bands, self.band_bits)
        weights = _U64(1) << np.arange(self.band_bits, dtype=np.uint64)
        vals = (bits.astype(np.uint64) * weights[None, None, :]).sum(
            axis=2, dtype=np.uint64)  # (n, n_bands)
        band_idx = np.arange(self.n_bands, dtype=np.uint64) + _U64(1)
        with np.errstate(over="ignore"):
            keys = splitmix64(vals + band_idx[None, :]
                              * _U64(0x9E3779B97F4A7C15))
        doc = batch["vec_id"].cast(pa.uint64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "band_key": pa.array(keys.ravel(order="F"), type=pa.uint64()),
            "doc_id": pa.array(np.tile(doc, self.n_bands),
                               type=pa.uint64()),
        })


# ---------------------------------------------- n-gram Jaccard (prefix) ----

def _prefix_index_rows(batch: pa.Table, threshold: float) -> pa.Table:
    """(doc_id, shingles) -> (band_key, doc_id) prefix-filter index rows.

    Shingle sets arrive sorted ascending (``_shingles_from_hashes``), one
    GLOBAL order for every doc, so the prefix-filter guarantee holds: any
    pair with Jaccard >= t shares an element among each side's first
    ``len - ceil(t*len) + 1`` hashes (PPJoin, Xiao et al., WWW'08).
    Index volume is ~(1-t) of the full inverted index."""
    sh = batch["shingles"].combine_chunks()
    offs = sh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = sh.values.to_numpy(zero_copy_only=False)
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    lens = np.diff(offs)
    p = np.where(lens > 0,
                 lens - np.ceil(threshold * lens).astype(np.int64) + 1, 0)
    tot = int(p.sum())
    if tot == 0:
        return pa.table({"band_key": pa.array([], pa.uint64()),
                         "doc_id": pa.array([], pa.uint64())})
    starts0 = np.concatenate(([0], np.cumsum(p)))[:-1]
    ranks = np.arange(tot, dtype=np.int64) - np.repeat(starts0, p)
    take = np.repeat(offs[:-1], p) + ranks  # absolute child indices
    return pa.table({
        "band_key": pa.array(vals[take].astype(np.uint64),
                             type=pa.uint64()),
        "doc_id": pa.array(np.repeat(doc, p), type=pa.uint64()),
    })


def ngram_jaccard_pairs(docs_ds, config: PipelineConfig, n: int = 3,
                        threshold: float = 0.7, exact: bool = True):
    """documents -> (url_a, url_b, jaccard) pairs with exact word-n-gram
    Jaccard >= ``threshold`` — no sketch (unlike MinHash): recall is
    exact by the prefix-filter guarantee, precision by exact verification
    over the stored n-gram sets.

    Scale shape: the only wide ops are the candidate exchange over
    PREFIX index rows (~(1-t) of a full inverted index) and the two
    bucketed joins attaching n-gram sets to surviving pairs.
    ``exact=True`` lifts the hot-group cap so emission is exhaustive
    (oracle mode); at production scale leave the cap on — a prefix hash
    shared by >cap docs is boilerplate with no dup signal (same policy
    as the chunk-key family, candidates.py).
    """
    import dataclasses

    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.normalize import normalize
    from lsh_ray.stages.shingle import shingle
    from lsh_ray.stages.verify import verify

    over = {"shingle_k": n, "shingle_stride": 1,
            # the verify kernel's is_dup gate IS the exact-Jaccard gate
            # (float32 jaccard compared against the float64 threshold —
            # DuckDB's REAL >= <literal> semantics); containment 2.0
            # disables the substring surface
            "jaccard_threshold": threshold,
            "containment_threshold": 2.0}
    if exact:
        over["group_size_cap"] = 1 << 30
    cfg = dataclasses.replace(config, **over)
    # forked (index rows + verify gathers): materialize the one pass.
    # A zero simhash column satisfies the shared verify kernel's schema
    # (its hamming output is meaningless here and dropped).
    sigs = shingle(normalize(docs_ds, cfg), cfg) \
        .select_columns(["doc_id", "url", "shingles"]).map_batches(
        lambda t: t.append_column(
            "simhash", pa.array(np.zeros(t.num_rows, dtype=np.uint64))),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    rows = sigs.select_columns(["doc_id", "shingles"]).map_batches(
        lambda t: _prefix_index_rows(t, threshold),
        batch_format="pyarrow", zero_copy_batch=True)
    pairs = candidate_pairs(rows, cfg)
    # exact verification through the shared plan dispatcher: under the
    # pair cap this is the zero-payload-shuffle block gather — the old
    # plan shipped the full n-gram sets through TWO bucketed joins
    ver = verify(pairs, sigs, cfg)
    dup = ver.map_batches(
        lambda t: t.filter(t["is_dup"]).select(
            ["doc_a", "doc_b", "jaccard"]),
        batch_format="pyarrow", zero_copy_batch=True)
    # url resolution joins only the SURVIVING pairs (tiny surface)
    nb = coalesce_blocks(cfg)
    urls = sigs.select_columns(["doc_id", "url"])
    j = bucket_join(dup, urls, "doc_a", "doc_id", ["url"],
                    suffix="_a", num_blocks=nb)
    j = bucket_join(j, urls, "doc_b", "doc_id", ["url"],
                    suffix="_b", num_blocks=nb)

    def finish(t: pa.Table) -> pa.Table:
        from lsh_ray.functions.num import string_pair_min_max
        lo, hi = string_pair_min_max(t["url_a"], t["url_b"])
        return pa.table({
            "url_a": lo,
            "url_b": hi,
            "jaccard": t["jaccard"],
        })

    return j.map_batches(finish, batch_format="pyarrow",
                         zero_copy_batch=True)


def embedding_near_dup_pairs(embeddings_ds, dim: int,
                             config: PipelineConfig,
                             cosine_threshold: float = 0.9,
                             n_bands: int = 8, band_bits: int = 16,
                             round_to: int | None = 6):
    """embeddings (vec_id, embedding) -> near-dup pairs by exact cosine.

    SRP multi-band candidates (scale path), exact-cosine verification;
    cosine rounded half-away to ``round_to`` for oracle comparability.
    """
    rows = embeddings_ds.map_batches(
        SRPBandRowsStage,
        fn_constructor_args=(dim, n_bands, band_bits, config.seed),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, config.signature_concurrency))
    pairs = candidate_pairs(rows, config)
    from lsh_ray.config import coalesce_blocks
    nb = coalesce_blocks(config)
    emb = embeddings_ds.map_batches(
        lambda t: pa.table({"doc_id": t["vec_id"].cast(pa.uint64()),
                            "embedding": t["embedding"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = bucket_join(pairs, emb, "doc_a", "doc_id", ["embedding"],
                         suffix="_a", num_blocks=nb)
    joined = bucket_join(joined, emb, "doc_b", "doc_id", ["embedding"],
                         suffix="_b", num_blocks=nb)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        va = t["embedding_a"].combine_chunks().values.to_numpy(
            zero_copy_only=False).reshape(t.num_rows, -1).astype(np.float64)
        vb = t["embedding_b"].combine_chunks().values.to_numpy(
            zero_copy_only=False).reshape(t.num_rows, -1).astype(np.float64)
        num = (va * vb).sum(axis=1)
        den = np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
        cos = np.where(den > 0, num / den, 0.0)
        keep = cos >= cosine_threshold
        if round_to is not None:
            from lsh_ray.functions.num import round_half_away
            cos = round_half_away(cos, round_to)
        out = pa.table({
            "vec_a": t["doc_a"].cast(pa.int64()),
            "vec_b": t["doc_b"].cast(pa.int64()),
            "cosine": pa.array(cos, type=pa.float64()),
        })
        return out.filter(pa.array(keep))

    return joined.map_batches(verify, batch_format="pyarrow",
                              zero_copy_batch=True)


# ---------------------------------------------------- semantic (SemDeDup) --

def semantic_dedup(embeddings_ds, dim: int, config: PipelineConfig,
                   n_centroids: int = 8, tau: float = 0.9,
                   round_to: int = 6):
    """SemDeDup-style semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then within each
    cluster drop every vector that has a LOWER-vec_id neighbor with
    cosine >= ``tau``.

    - Centroids are the vectors of the first ``n_centroids`` vec_ids —
      a deterministic seed choice so the DuckDB oracle can reproduce
      the assignment; production swaps in k-means/IVF-trained centroids
      (``stages/similarity.py`` has the trainer) without changing the
      plan. They are a bounded driver pull broadcast ONCE via
      ``ray.put``; assignment is one float64 matmul per batch.
    - The keep rule is the order-free form of the paper's greedy sweep:
      dropped iff SOME lower-id same-cluster vector is within tau —
      deterministic under any scan order and exactly SQL-expressible.
    - Within-cluster work is O(m^2) on cluster size m: at production
      scale ``n_centroids`` grows ~sqrt(N) (the paper's regime) so m
      stays bounded; the per-cluster co-location is the same tasks-mode
      exchange the other dedup tiers use.

    -> (vec_id, cluster, keep, max_lower_cos) for every input vector;
    ``max_lower_cos`` is -1 when no lower-id cluster-mate exists.
    """
    import ray

    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import colocate_map

    def is_seed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.less(t["vec_id"], n_centroids))

    seed_rows = embeddings_ds.map_batches(
        is_seed, batch_format="pyarrow", zero_copy_batch=True).take_all()
    seed_rows.sort(key=lambda r: r["vec_id"])  # bounded: n_centroids rows
    C = np.asarray([r["embedding"] for r in seed_rows], dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    c_ref = ray.put(Cn)

    def assign(t: pa.Table) -> pa.Table:
        Cn_ = ray.get(c_ref)
        n = t.num_rows
        if n == 0:
            return t.append_column("cluster", pa.array([], pa.int64()))
        E = t["embedding"].combine_chunks().values.to_numpy(
            zero_copy_only=False).reshape(n, -1).astype(np.float64)
        En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True),
                            1e-300)
        # argmax takes the FIRST max — ties resolve to min centroid id,
        # matching the oracle's (cos DESC, k ASC) row_number order
        cl = np.argmax(En @ Cn_.T, axis=1).astype(np.int64)
        return t.append_column("cluster", pa.array(cl))

    assigned = embeddings_ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True)
    nb = min(coalesce_blocks(config), 64)

    def block(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from lsh_ray.functions.num import round_half_away
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "keep": pa.array([], pa.int64()),
                             "max_lower_cos": pa.array([], pa.float64())})
        order = pc.sort_indices(t, sort_keys=[("cluster", "ascending"),
                                              ("vec_id", "ascending")])
        t = t.take(order)
        n = t.num_rows
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        E = t["embedding"].combine_chunks().values.to_numpy(
            zero_copy_only=False).reshape(n, -1).astype(np.float64)
        En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True),
                            1e-300)
        max_lower = np.full(n, -1.0)
        starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(cl)) + 1, [n]))
        for s, e in zip(starts[:-1], starts[1:]):
            m = e - s
            if m < 2:
                continue
            V = En[s:e]
            G = np.where(np.tril(np.ones((m, m), dtype=bool), -1),
                         V @ V.T, -np.inf)
            ml = G.max(axis=1)
            max_lower[s:e] = np.where(np.isfinite(ml), ml, -1.0)
        keep = (max_lower < tau).astype(np.int64)
        return pa.table({
            "vec_id": t["vec_id"].cast(pa.int64()),
            "cluster": t["cluster"],
            "keep": pa.array(keep),
            "max_lower_cos": pa.array(round_half_away(max_lower, round_to),
                                      type=pa.float64())})

    def cl_bucket(t: pa.Table) -> pa.Table:
        b = (t["cluster"].to_numpy(zero_copy_only=False)
             % nb).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    return colocate_map(assigned, ["cluster"], nb, block,
                        sort_bucket_expr=cl_bucket)


# ------------------------------------------------------- line-level dedup --

def segment_lines(ds, words_per_line: int = 12, text_col: str = "text",
                  key_col: str = "doc_id"):
    """documents -> (doc_id, idx, line): the deterministic line view.

    Real web corpora carry newline structure; the synthetic TESTDATA
    documents do not, so the "line" is defined as consecutive
    ``words_per_line``-word segments of the whitespace token stream —
    a deterministic derivation the DuckDB oracle reproduces exactly
    (same precedent as q_embedding_near_dups' documented augmentation).
    Fully vectorized: one ``split_pattern`` pass, then the line
    list-array REINDEXES the word values buffer (lines tile each doc's
    word range, so the new list offsets are a strided arange over the
    old ones) and one ``binary_join`` kernel materializes line strings.
    """
    import pyarrow.compute as pc

    W = int(words_per_line)

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({
                key_col: pa.array([], t.schema.field(key_col).type),
                "idx": pa.array([], pa.int64()),
                "line": pa.array([], pa.string())})
        words = pc.split_pattern(t[text_col], " ").combine_chunks()
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = np.diff(offs)           # >= 1: split of "" is [""]
        n_lines = -(-n_words // W)        # ceil
        total = int(n_lines.sum())
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), n_lines)
        line_starts = np.concatenate(([0], np.cumsum(n_lines)))[:-1]
        idx = (np.arange(total, dtype=np.int64)
               - np.repeat(line_starts, n_lines))
        # each line spans [start, next line's start); a doc's LAST line
        # implicitly ends at the next doc's first word offset — exactly
        # offs[i+1] — so one strided offsets array covers every line
        new_offs = np.concatenate((offs[doc_rep] + W * idx, offs[-1:]))
        lines = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(new_offs, type=pa.int32()), words.values),
            " ")
        return pa.table({
            key_col: t[key_col].take(pa.array(doc_rep)),
            "idx": pa.array(idx),
            "line": lines,
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def line_dedup(ds, words_per_line: int = 12):
    """Global first-occurrence line-level exact dedup — the RefinedWeb /
    MassiveText dedup tier between exact-document and n-gram: every
    distinct line survives only at its first occurrence (ordered by
    (doc_id, idx)) and each document is reassembled from its surviving
    lines. -> (doc_id, text, n_kept).

    Scale shape: two tasks-mode exchanges. #1 co-locates occurrence
    rows by the LINE STRING (exact grouping, no hash-collision caveat
    — the same ship-the-string precedent as the tfidf token exchange)
    and keeps the min-(doc_id, idx) occurrence per line; #2 co-locates
    the surviving ~unique lines by doc_id and reassembles each doc with
    one ``binary_join``. Line text crosses exchange #1 once and the
    kept subset crosses #2 once; at petabyte scale ship a 128-bit line
    hash through #1 instead and join the kept (doc_id, idx) flags back
    to a doc-keyed line view (halves #2's byte volume at the cost of a
    second segmentation pass). Documents whose every line first
    occurred elsewhere drop out entirely (both engines agree).
    """
    import pyarrow.compute as pc

    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import _key_hash_u64, colocate_map

    occ = segment_lines(ds.select_columns(["doc_id", "text"]),
                        words_per_line)
    nblocks = min(coalesce_blocks(), 64)

    def keep_first(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # preserve the input's doc_id type (int64 from parquet,
            # uint64 for normalized url-hash ids in the curate path)
            return pa.table({
                "doc_id": pa.array([], t.schema.field("doc_id").type),
                "idx": pa.array([], pa.int64()),
                "line": pa.array([], pa.string())})
        order = pc.sort_indices(
            t, sort_keys=[("line", "ascending"), ("doc_id", "ascending"),
                          ("idx", "ascending")])
        t = t.take(order)
        ln = t["line"]
        n = t.num_rows
        neq = (pc.not_equal(ln.slice(1), ln.slice(0, n - 1))
               .to_numpy(zero_copy_only=False) if n > 1
               else np.empty(0, bool))
        firsts = pa.array(np.flatnonzero(np.concatenate(([True], neq))),
                          type=pa.int64())
        return pa.table({"doc_id": t["doc_id"].take(firsts),
                         "idx": t["idx"].take(firsts),
                         "line": ln.take(firsts)})

    def line_bucket(t: pa.Table) -> pa.Table:
        h = _key_hash_u64(t, ["line"]) % np.uint64(nblocks)
        return t.append_column("bucket", pa.array(h.astype(np.int32)))

    kept = colocate_map(occ, ["line"], nblocks, keep_first,
                        sort_bucket_expr=line_bucket)

    def reassemble(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], t.schema.field("doc_id").type),
                "text": pa.array([], pa.string()),
                "n_kept": pa.array([], pa.int64())})
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        idx = t["idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((idx, doc))
        doc = doc[order]
        lines = t["line"].take(pa.array(order, type=pa.int64()))
        firsts = np.flatnonzero(
            np.concatenate(([True], doc[1:] != doc[:-1])))
        bounds = np.concatenate((firsts, [len(doc)]))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(bounds, type=pa.int32()),
                lines.combine_chunks()),
            "\n")
        return pa.table({
            "doc_id": pa.array(doc[firsts]),
            "text": joined,
            "n_kept": pa.array(np.diff(bounds).astype(np.int64)),
        })

    def doc_bucket(t: pa.Table) -> pa.Table:
        h = (t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
             % np.uint64(nblocks))
        return t.append_column("bucket", pa.array(h.astype(np.int32)))

    return colocate_map(kept, ["doc_id"], nblocks, reassemble,
                        sort_bucket_expr=doc_bucket)
