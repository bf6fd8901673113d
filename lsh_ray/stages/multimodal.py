"""Multimodal (binary-payload) processing stages.

Images/audio/video are opaque ``binary`` columns with typed metadata
(mime, width/height, duration) — exactly how the 100 TB corpus carries
them. The decode kernels themselves are STUBBED (no image/audio libraries
in this environment — reference analog: essentia/music21 decoders,
``loader.py:69-83``, which are likewise external heavyweight deps); the
Ray-side plumbing — actor-pool signature, schema, small batch sizes for
large payloads, output layout — is real and tested.

Set ``use_fake_decoder=True`` to run a deterministic fake decode (payload
byte statistics) end-to-end; leave it False in production, where
``__init__`` would load the real codec once per actor and
``NotImplementedError`` marks the boundary.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from lsh_ray.config import PipelineConfig


class BinaryDecodeStage:
    """Actor-pool stage: decode binary payloads into fixed-size features.

    Real deployment: ``__init__`` loads the codec/model once per actor
    (e.g. PIL/torchvision for images); ``__call__`` decodes a batch.
    """

    FEATURE_DIM = 16

    def __init__(self, use_fake_decoder: bool = False):
        self.use_fake_decoder = use_fake_decoder
        if not use_fake_decoder:
            # real codec load would happen here, once per actor
            pass

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if not self.use_fake_decoder:
            raise NotImplementedError(
                "real image/audio decoding requires codec libraries not "
                "present in this environment; construct with "
                "use_fake_decoder=True for the deterministic stand-in")
        # deterministic fake: md5-seeded byte statistics as "features"
        digest = hashlib.md5(payload).digest()
        base = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
        stats = np.array([len(payload) % 251, payload[0] if payload else 0,
                          payload[-1] if payload else 0,
                          sum(payload[:64]) % 255], dtype=np.float32)
        feat = np.concatenate([base, stats])[: self.FEATURE_DIM]
        return feat / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([
            self._decode_one(p if p is not None else b"") for p in payloads])
        return pa.table({
            "doc_id": batch["doc_id"],
            "mime": batch["mime"] if "mime" in batch.column_names
            else pa.array(["application/octet-stream"] * batch.num_rows),
            "n_bytes": pa.array(
                np.array([len(p) if p else 0 for p in payloads],
                         dtype=np.int64)),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), type=pa.float32()),
                self.FEATURE_DIM),
        })


def decode_binary(ds, config: PipelineConfig | None = None,
                  use_fake_decoder: bool = False, batch_size: int = 64):
    """(doc_id, payload[, mime]) -> (doc_id, mime, n_bytes, features).

    Small ``batch_size`` by design: batch bytes = batch_size x payload size
    must fit the worker heap (large binary rows, see ray_guide 'Memory-
    aware'); concurrency x num_cpus sized to the node by the caller.
    """
    return ds.map_batches(
        BinaryDecodeStage, fn_constructor_args=(use_fake_decoder,),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=(1, 8))
