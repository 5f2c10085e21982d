"""Deterministic feature-hashing text embedder.

Sandbox stand-in for the reference's batched OpenAI ``text-embedding-3-large``
stage (/root/reference/src/datastore.py:116-120, dim 3072 cosine — see
SURVEY.md C2). Same operator *shape* — load-once state, batched encode,
fixed-size float vectors, cosine metric — but dependency-light and fully
deterministic (seeded, no wall clock), so golden outputs are stable across
runs, processes and parallelism levels.

Scheme: casefolded text → padded character 3-grams → each gram hashed with
``zlib.crc32`` (seeded) into one of ``dim`` signed buckets → L2-normalized
float32 vector. crc32 is process-stable (unlike Python ``hash``), cheap, and
good enough to make near-identical strings near-parallel vectors.

Swapping in a real sentence-transformer is a one-class change in
``stages/embedder.py`` (documented seam, SURVEY.md §7.4).
"""

from __future__ import annotations

import zlib

import numpy as np

_GRAM_N = 3


def _grams(text: str) -> list[bytes]:
    s = " " + " ".join(text.casefold().split()) + " "
    b = s.encode("utf-8")
    if len(b) < _GRAM_N:
        return [b]
    return [b[i : i + _GRAM_N] for i in range(len(b) - _GRAM_N + 1)]


def embed_texts(texts, dim: int = 64, seed: int = 42) -> np.ndarray:
    """Embed a sequence of strings → (N, dim) float32, rows L2-normalized.

    Deterministic in (texts, dim, seed). Empty/whitespace-only text embeds to
    the zero vector (cosine vs anything = 0 → never links).
    """
    out = np.zeros((len(texts), dim), dtype=np.float64)
    salt = seed & 0xFFFFFFFF
    for i, t in enumerate(texts):
        if t is None:
            continue
        row = out[i]
        for g in _grams(t):
            h = zlib.crc32(g, salt)
            idx = h % dim
            sign = 1.0 if (h >> 16) & 1 else -1.0
            row[idx] += sign
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out.astype(np.float32)


def cosine_topk(query: np.ndarray, matrix: np.ndarray, k: int):
    """Vectorized cosine top-k of ``query`` (Q, D) against ``matrix`` (N, D).

    Both inputs are assumed row-normalized (cosine == dot). Returns
    ``(idx, score)`` each of shape (Q, k), ties broken by lower index
    (deterministic). Analogue of the reference's per-query top-k ANN retrieval
    (/root/reference/src/model.py:73-79, SURVEY.md R2) as a dense matmul.
    """
    sims = query @ matrix.T  # (Q, N)
    n = matrix.shape[0]
    k = min(k, n)
    # argpartition then stable sort of the k-slice; tie-break on index via
    # lexsort (primary: -score, secondary: index).
    part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
    part_scores = np.take_along_axis(sims, part, axis=1)
    order = np.lexsort((part, -part_scores), axis=1)
    idx = np.take_along_axis(part, order, axis=1)
    score = np.take_along_axis(part_scores, order, axis=1)
    return idx, score
