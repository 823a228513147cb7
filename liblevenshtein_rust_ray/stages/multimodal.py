"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata.

The decode step is STUBBED (image/audio libraries are not in this
environment): ``DecodeStub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake feature vector
from the payload bytes.  Everything around the stub — actor-pool signature,
small batches for wide binary rows, schema of the output — is real and
tested, so swapping in a real decoder is a one-line change.
"""

import numpy as np
import pyarrow as pa

from ..functions.simhash import hash64


class DecodeStub:
    """Actor-pool stage: ``map_batches(DecodeStub, batch_format="pyarrow",
    batch_size=64, concurrency=N)``.  Small batch_size on purpose: binary
    payloads are wide, so batch x concurrency must fit the worker heap."""

    FEATURE_DIM = 16

    def __init__(self, payload_col: str = "payload", fake: bool = True):
        # real decoders load their model/codec here, once per actor
        self.payload_col = payload_col
        self.fake = fake

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real image/audio decode requires codecs not present in this "
                "environment; construct with fake=True for the deterministic stub"
            )
        # deterministic fake "embedding": blake2b-seeded floats
        h = hash64(payload or b"")
        rng = np.random.RandomState(h % (2**32))
        return rng.rand(self.FEATURE_DIM).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        feats = [self._decode(p) for p in payloads]
        sizes = [len(p or b"") for p in payloads]
        out = {}
        for name in batch.column_names:
            if name != self.payload_col:
                out[name] = batch.column(name)
        out["payload_bytes"] = pa.array(sizes, type=pa.int64())
        out["features"] = pa.array(
            [f.tolist() for f in feats], type=pa.list_(pa.float32(), self.FEATURE_DIM)
        )
        return pa.table(out)


def multimodal_features(ds, payload_col: str = "payload", concurrency=None, batch_size: int = 64):
    kwargs = {"batch_format": "pyarrow", "batch_size": batch_size}
    if concurrency:
        kwargs["concurrency"] = concurrency
        return ds.map_batches(
            DecodeStub, fn_constructor_kwargs={"payload_col": payload_col}, **kwargs
        )
    return ds.map_batches(DecodeStub(payload_col), **kwargs)
