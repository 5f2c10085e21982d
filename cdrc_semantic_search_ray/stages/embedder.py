"""Hashed-embedding actor stage (SURVEY.md C2/P6).

Ray Data mapping of the reference's batched embedding stage
(/root/reference/src/datastore.py:116-120: OpenAI text-embedding-3-large over
chunk batches, dim from config/config.toml:7): a callable class for
``map_batches(..., concurrency=N)`` — the (stand-in) model state is built once
per actor in ``__init__``, every ``__call__`` embeds one Arrow batch.

Swap seam: replace ``embed_texts`` with a sentence-transformer ``encode`` and
add ``num_gpus`` at the ``map_batches`` call site — nothing else changes.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.embed import embed_texts


class HashedEmbedder:
    def __init__(self, text_col: str = "norm", out_col: str = "vec",
                 cfg: EngineConfig = DEFAULT_CONFIG):
        self.text_col = text_col
        self.out_col = out_col
        self.dim = cfg.embed_dim
        self.seed = cfg.embed_seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = embed_texts(batch[self.text_col].to_pylist(),
                           dim=self.dim, seed=self.seed)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), type=pa.float32()), self.dim)
        return batch.append_column(self.out_col, arr)
