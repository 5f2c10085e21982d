"""Hashed-embedding actor stage (SURVEY.md C2/P6).

Ray Data mapping of the reference's batched embedding stage
(/root/reference/src/datastore.py:116-120: OpenAI text-embedding-3-large over
chunk batches, dim from config/config.toml:7): a callable class for
``map_batches(..., concurrency=N)`` — the (stand-in) model state is built once
per actor in ``__init__``, every ``__call__`` embeds one Arrow batch.

Swap seam: pass ``model_loader`` (a zero-arg callable returning an object
with ``encode(list[str]) -> (n, dim) array``, e.g.
``lambda: SentenceTransformer(name)`` behind an import guard) and add
``num_gpus`` at the ``map_batches`` call site — nothing else changes.  The
loader runs ONCE per actor (``__init__``), never per batch; load-once
semantics are pinned by tests/test_model_seam.py with a counting fake model.
Without a loader the deterministic hash embedding stands in (no
torch/network in this environment).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.embed import embed_texts


class HashedEmbedder:
    def __init__(self, text_col: str = "norm", out_col: str = "vec",
                 cfg: EngineConfig = DEFAULT_CONFIG,
                 model_loader: Callable[[], object] | None = None):
        self.text_col = text_col
        self.out_col = out_col
        self.dim = cfg.embed_dim
        self.seed = cfg.embed_seed
        # the ONE expensive step: runs once per actor lifetime, not per batch
        self.model = model_loader() if model_loader is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        if self.model is not None:
            vecs = np.asarray(self.model.encode(texts), dtype=np.float32)
            if vecs.shape != (len(texts), self.dim):
                raise ValueError(
                    f"model.encode returned {vecs.shape}, expected "
                    f"({len(texts)}, {self.dim}) — set cfg.embed_dim to the "
                    "model's dimension")
        else:
            vecs = embed_texts(texts, dim=self.dim, seed=self.seed)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), type=pa.float32()), self.dim)
        return batch.append_column(self.out_col, arr)
