"""Near-duplicate detection family: MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine.  Numpy-vectorized cores + Ray Data pipelines.

Scale shapes (the part that matters at 10^12 docs):

- MinHash-LSH: signatures per batch (permutation params built once per
  actor) -> explode to (band, band_hash, doc_id) rows -> groupby the band
  key (hash shuffle) -> candidate pairs only within buckets -> exact-Jaccard
  verify.  Probability of a pair sharing >= 1 band = 1-(1-j^r)^b.
- SimHash: 64-bit signature; Hamming-<=k retrieval by pigeonhole bucketing
  on 4 disjoint 16-bit chunks (two sigs within distance 3 must agree on at
  least one chunk) -> groupby chunk value.
- Embedding cosine: row-normalize once, then blockwise matmul against a
  broadcast (ray.put) matrix; at scale the broadcast side is an IVF-style
  bucket index instead (see functions/similarity.py).
"""
from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


def shingles(text: str, n: int = 3) -> set[int]:
    """Word n-gram shingles as crc32 ints (order-free set)."""
    words = text.split()
    if len(words) < n:
        return {zlib.crc32(" ".join(words).encode())} if words else set()
    return {
        zlib.crc32(" ".join(words[i : i + n]).encode())
        for i in range(len(words) - n + 1)
    }


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


class MinHasher:
    """num_perm universal-hash permutations h_i(x) = (a_i*x + b_i) mod p.

    a_i, b_i are drawn below 2^32 and shingle ids are crc32 (< 2^32), so
    a_i*x + b_i < 2^64 fits uint64 EXACTLY — no silent wraparound — and the
    mod-p reduction is the true universal-hash family the LSH band
    probability math (1-(1-j^r)^b) assumes.  Parameters derive from a fixed
    seed — signatures are reproducible across actors and processes."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, 2 ** 32, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, 2 ** 32, size=num_perm, dtype=np.int64).astype(np.uint64)

    def signature(self, sh: set[int]) -> np.ndarray:
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        # (P, S): a < 2^32 and x < 2^32 -> a*x + b < 2^64, exact in uint64
        prod = (self.a[:, None] * x[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return prod.min(axis=1)

    def band_hashes(self, sig: np.ndarray, bands: int = 16) -> list[int]:
        rows = self.num_perm // bands
        out = []
        for bi in range(bands):
            chunk = sig[bi * rows : (bi + 1) * rows]
            out.append(zlib.crc32(chunk.tobytes()) & 0xFFFFFFFF)
        return out


def simhash(text: str, bits: int = 64) -> int:
    """Charikar SimHash over whitespace tokens (crc32 token hashes doubled
    to 64 bits by hashing the token twice with different salts).
    Vectorized: one (n_tokens, 64) bit matrix, column-summed."""
    words = text.split()
    if not words:
        return 0
    hashes = np.fromiter(
        ((zlib.crc32(w.encode()) << 32) | zlib.crc32(w.encode(), 0xBEEF)
         for w in words),
        dtype=np.uint64, count=len(words),
    )
    shifts = np.arange(bits, dtype=np.uint64)
    bitm = ((hashes[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
    acc = (2 * bitm - 1).sum(axis=0)
    sig = np.uint64(0)
    for i in np.nonzero(acc > 0)[0]:
        sig |= np.uint64(1) << np.uint64(i)
    return int(sig)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_chunks(sig: int, n_chunks: int = 4) -> list[int]:
    """Pigeonhole chunks: distance <= n_chunks-1 pairs share a chunk."""
    width = 64 // n_chunks
    mask = (1 << width) - 1
    return [(c << width | ((sig >> (c * width)) & mask)) for c in range(n_chunks)]


# ---------------------------------------------------------------------------
# Ray pipelines
# ---------------------------------------------------------------------------

class MinHashSignatures:
    """Actor-pool stage: doc batch -> exploded (band_key, doc_id) rows."""

    def __init__(self, num_perm: int = 128, bands: int = 16, ngram: int = 3):
        self.hasher = MinHasher(num_perm)
        self.bands = bands
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_keys = [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            sig = self.hasher.signature(shingles(text or "", self.ngram))
            for band_id, bh in enumerate(self.hasher.band_hashes(sig, self.bands)):
                doc_ids.append(doc_id)
                band_keys.append((band_id << 32) | bh)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "band_key": pa.array(band_keys, pa.int64()),
        })


def _bucket_pairs(group: pa.Table) -> pa.Table:
    ids = sorted(set(group.column("doc_id").to_pylist()))
    a_ids, b_ids = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a_ids.append(ids[i])
            b_ids.append(ids[j])
    return pa.table({"a": pa.array(a_ids, pa.int64()), "b": pa.array(b_ids, pa.int64())})


def minhash_candidate_pairs(ds, num_perm: int = 128, bands: int = 16,
                            ngram: int = 3, concurrency=(1, 4)):
    """documents Dataset (doc_id, text) -> unique candidate pairs (a < b)."""
    exploded = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "ngram": ngram},
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1,
    )
    pairs = exploded.groupby("band_key").map_groups(_bucket_pairs, batch_format="pyarrow")
    # dedup identical pairs found in multiple bands
    import ray.data  # noqa: F401  (ds is a ray Dataset)
    from ray.data.aggregate import Count

    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands"))


def verify_jaccard_pairs(pairs_df, texts: dict[int, str], ngram: int = 3,
                         threshold: float = 0.5):
    """Exact-Jaccard verification of candidate pairs.  ``texts`` is the
    broadcast small side (ray.put at scale; plain dict here)."""
    out = []
    cache: dict[int, set[int]] = {}

    def sh(doc_id):
        if doc_id not in cache:
            cache[doc_id] = shingles(texts.get(doc_id, ""), ngram)
        return cache[doc_id]

    for a, b in pairs_df:
        j = jaccard(sh(a), sh(b))
        if j >= threshold:
            out.append((a, b, round(j, 6)))
    return out
