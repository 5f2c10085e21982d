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
