"""Deterministic hashing kernels for dedup: shingles, MinHash, SimHash,
rolling fingerprints. Pure numpy/stdlib; process-stable (crc32-based, never
Python ``hash``). Shared by the distributed dedup pipelines and their tests.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

_MERSENNE = (1 << 61) - 1


def char_shingles(text: str, k: int = 5) -> set[int]:
    """crc32 of the k-char shingles of the casefolded text."""
    s = " ".join(text.casefold().split())
    if len(s) < k:
        return {zlib.crc32(s.encode())} if s else set()
    return {zlib.crc32(s[i:i + k].encode()) for i in range(len(s) - k + 1)}


def word_ngrams(text: str, n: int = 3) -> set[int]:
    toks = text.casefold().split()
    if len(toks) < n:
        return {zlib.crc32(" ".join(toks).encode())} if toks else set()
    return {zlib.crc32(" ".join(toks[i:i + n]).encode())
            for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


# ---------------------------------------------------------------------------
# vectorized batch kernels (round 2): the per-DOC loops above are the
# reference semantics; these process a whole batch with numpy/pandas —
# the outer Python loop was the 100-TB cost center (round-1 VERDICT #6).
# ---------------------------------------------------------------------------


def char_shingle_codes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-BYTE window codes of the whitespace-normalized casefolded
    text. For k <= 8 the window bytes ARE the code modulo 2^64 (injective —
    the map is base-256 positional, so distinct windows give distinct
    uint64s; for k=8 the top byte wraps but injectivity mod 2^64 holds by
    construction), computed with one sliding-window view + one matvec in
    uint64; no per-shingle Python. Returned as int64 (the same 64 bits
    reinterpreted) for downstream numpy arithmetic."""
    if k > 8:
        raise ValueError("char_shingle_codes supports k <= 8")
    b = (" ".join(text.casefold().split())).encode()
    if not b:
        return np.empty(0, dtype=np.int64)
    if len(b) < k:
        b = b + b"\x00" * (k - len(b))
    a = np.frombuffer(b, dtype=np.uint8)
    w = np.lib.stride_tricks.sliding_window_view(a, k).astype(np.uint64)
    codes = w @ (np.uint64(256) ** np.arange(k, dtype=np.uint64))
    # int64 view BEFORE unique: consumers (ngram prefix blocking) rely on
    # the signed sort order the previous int64 kernel produced
    return np.unique(codes.view(np.int64))


def minhash_signatures_batch(code_arrays: list[np.ndarray], a: np.ndarray,
                             b: np.ndarray,
                             chunk_codes: int = 65_536) -> np.ndarray:
    """(n_docs, num_perm) uint64 signatures for a whole batch.

    All docs' shingle codes concatenate into one array; the universal hash
    is one outer product per chunk and per-doc minima fall out of
    ``np.minimum.reduceat`` — the only Python iteration is over fixed-size
    chunks (bounding transient memory at chunk_codes × num_perm × 8 B).
    Empty docs get the all-max sentinel (same as minhash_signature)."""
    n = len(code_arrays)
    num_perm = len(a)
    out = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    nz = [i for i in range(n) if len(code_arrays[i])]
    if not nz:
        return out
    lens = np.array([len(code_arrays[i]) for i in nz], dtype=np.int64)
    # chunk boundaries in DOC units so no doc straddles a chunk
    doc_lo = 0
    while doc_lo < len(nz):
        doc_hi = doc_lo + 1
        total = int(lens[doc_lo])
        while doc_hi < len(nz) and total + lens[doc_hi] <= chunk_codes:
            total += int(lens[doc_hi])
            doc_hi += 1
        h = np.concatenate([code_arrays[nz[i]]
                            for i in range(doc_lo, doc_hi)])
        vals = (np.multiply.outer(a, h) + b[:, None]) % _MERSENNE
        starts = np.concatenate(
            ([0], np.cumsum(lens[doc_lo:doc_hi])))[:-1]
        mins = np.minimum.reduceat(vals, starts, axis=1)  # (P, docs)
        out[[nz[i] for i in range(doc_lo, doc_hi)]] = \
            mins.T.astype(np.uint64)
        doc_lo = doc_hi
    return out


_FNV_PRIME = np.uint64(1099511628211)
_FNV_BASIS = np.uint64(14695981039346656037)


def band_key_values(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) uint64 FNV-style fold of each band's rows —
    vectorized replacement for per-doc ``band_keys`` string building."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    s = sigs[:, :bands * rows].reshape(n, bands, rows)
    with np.errstate(over="ignore"):
        acc = np.full((n, bands), _FNV_BASIS, dtype=np.uint64)
        for r in range(rows):  # rows is small (4-8); docs axis vectorized
            acc = (acc ^ s[:, :, r]) * _FNV_PRIME
    return acc


def _token_arrays(texts: list[str]):
    """casefold-split a batch → (flat object array of tokens, per-doc lens).
    pandas.factorize over the flat array gives batch-local token ids at C
    speed; only UNIQUE tokens are ever hashed in Python."""
    toks = [t.casefold().split() for t in texts]
    lens = np.array([len(t) for t in toks], dtype=np.int64)
    if lens.sum() == 0:
        return np.empty(0, dtype=object), lens
    flat = np.concatenate([np.asarray(t, dtype=object)
                           for t in toks if t])
    return flat, lens


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """Vectorized batch SimHash, bit-identical to ``simhash64`` per doc:
    factorize tokens (C), crc-hash each UNIQUE token once, unpack the ±1
    bit matrix, then per-doc sums via ``np.add.reduceat``."""
    import pandas as pd

    flat, lens = _token_arrays(texts)
    out = np.zeros(len(texts), dtype=np.uint64)
    if len(flat) == 0:
        return out
    ids, uniq = pd.factorize(flat)
    hs = np.array([zlib.crc32(u.encode()) | (zlib.crc32(u[::-1].encode()) << 32)
                   for u in uniq], dtype=np.uint64)
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little").astype(np.int64)  # (V, 64) LE
    pm = 2 * bits - 1
    tok_pm = pm[ids]  # (total_tokens, 64)
    nz = np.flatnonzero(lens)
    starts = np.concatenate(([0], np.cumsum(lens[nz])))[:-1]
    acc = np.add.reduceat(tok_pm, starts, axis=0)  # (n_nz, 64)
    weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
    vals = ((acc > 0).astype(np.uint64) * weights).sum(axis=1,
                                                       dtype=np.uint64)
    out[nz] = vals
    return out


_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
                 0x27D4EB2F165667C5, 0x85EBCA6B27D4EB4F, 0x2545F4914F6CDD1D,
                 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F], dtype=np.uint64)


def word_ngram_codes_batch(texts: list[str], n: int = 3) -> list[np.ndarray]:
    """Per-doc arrays of GLOBALLY-consistent word-n-gram codes, vectorized.

    Each unique token is crc-hashed once per batch (global value — blocking
    keys must agree across batches/workers); n-gram codes are a fixed odd
    multiplier mix of the n token hashes via one sliding-window pass over
    the flat hash array, with windows that straddle doc boundaries masked
    out. Docs shorter than n get one code mixing all their tokens."""
    flat, lens = _token_arrays(texts)
    out: list[np.ndarray] = []
    if len(flat) == 0:
        return [np.empty(0, dtype=np.uint64) for _ in texts]
    import pandas as pd

    ids, uniq = pd.factorize(flat)
    uh = np.array([zlib.crc32(u.encode()) for u in uniq], dtype=np.uint64)
    th = uh[ids]  # (total,) global token hashes in doc order
    offsets = np.concatenate(([0], np.cumsum(lens)))
    with np.errstate(over="ignore"):
        if len(th) >= n:
            w = np.lib.stride_tricks.sliding_window_view(th, n)
            codes_all = (w * _MIX[:n]).sum(axis=1, dtype=np.uint64)
        else:
            codes_all = np.empty(0, dtype=np.uint64)
        for i in range(len(texts)):
            lo, hi = int(offsets[i]), int(offsets[i + 1])
            if hi - lo == 0:
                out.append(np.empty(0, dtype=np.uint64))
            elif hi - lo < n:
                code = (th[lo:hi] * _MIX[:hi - lo]).sum(dtype=np.uint64)
                out.append(np.array([code], dtype=np.uint64))
            else:
                out.append(np.unique(codes_all[lo:hi - n + 1]))
    return out


def minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed ^ 0x9E3779B9)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) uint64 signature; empty set → all-max sentinel."""
    if not shingles:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    h = np.fromiter(shingles, dtype=np.int64, count=len(shingles))
    # (num_perm, n) universal hashing mod Mersenne prime
    vals = (np.multiply.outer(a, h) + b[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.uint64)


def band_keys(sig: np.ndarray, bands: int) -> list[str]:
    """Split a signature into ``bands`` equal bands → one key per band."""
    rows = len(sig) // bands
    out = []
    for bi in range(bands):
        chunk = sig[bi * rows:(bi + 1) * rows]
        out.append(f"{bi}:{zlib.crc32(chunk.tobytes())}")
    return out


def simhash64(tokens: list[str]) -> int:
    """Classic 64-bit SimHash over token crc64-ish hashes."""
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = zlib.crc32(t.encode()) | (zlib.crc32(t[::-1].encode()) << 32)
        # unpack 64 bits without int64 overflow (h can exceed 2**63)
        bits = np.unpackbits(
            np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8),
            bitorder="little").astype(np.int64)
        acc += 2 * bits - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_chunk_keys(h: int, chunks: int = 4) -> list[str]:
    """Split 64 bits into ``chunks`` pieces: pairs within hamming distance
    d < chunks share at least one piece (pigeonhole blocking)."""
    bits = 64 // chunks
    mask = (1 << bits) - 1
    return [f"{i}:{(h >> (i * bits)) & mask}" for i in range(chunks)]


def md5_fingerprint(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def rolling_fingerprints(text: str, window: int = 32, keep: int = 4) -> list[int]:
    """Winnowing-style rolling-hash fingerprints: crc of each window, keep the
    ``keep`` smallest (deterministic document sketch)."""
    s = " ".join(text.casefold().split())
    if len(s) <= window:
        return [zlib.crc32(s.encode())] if s else []
    hs = {zlib.crc32(s[i:i + window].encode()) for i in range(len(s) - window + 1)}
    return sorted(hs)[:keep]
