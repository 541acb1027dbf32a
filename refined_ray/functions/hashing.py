"""Stable, process-independent hashing.

Python's builtin ``hash`` is salted per process (PYTHONHASHSEED) and
therefore unusable for distributed partitioning: two Ray workers would
route the same key to different partitions.  Everything here is
deterministic across processes and platforms.

At 10^12-document scale 64-bit ids have expected birthday collisions
(~3e4 at 1e12 keys); production would widen `stable_hash64` to 128-bit
(two independent mixes).  64-bit is plenty for the sandbox scales and
keeps shuffle payloads narrow.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

_U64 = np.uint64
# splitmix64 constants — public-domain mixer (Vigna), also used by Java/JS PRNG libs.
_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    x = x.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        x += _SM_GAMMA
        x ^= x >> _U64(30)
        x *= _SM_M1
        x ^= x >> _U64(27)
        x *= _SM_M2
        x ^= x >> _U64(31)
    return x


def stable_hash64_bytes(data: bytes) -> int:
    """Stable 64-bit hash of a byte string (first 8 bytes of blake2b)."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def stable_hash64_str(s: str) -> int:
    return stable_hash64_bytes(s.encode("utf-8"))


def hash_str_array(strs, seed: int = 0) -> np.ndarray:
    """Vectorized stable uint64 hash of an array/list of strings.

    pandas ``hash_array`` (cython siphash13 with pandas' fixed default
    key — deterministic across processes and platforms) mixed through
    splitmix64 with the seed.  This is the bulk token/shingle hasher
    (~10M strs/s); for *identifier* hashing (page ids) use
    ``stable_hash64_str`` (blake2b).
    """
    import pandas as pd

    arr = strs if isinstance(strs, np.ndarray) else np.array(strs, dtype=object)
    out = pd.util.hash_array(arr, categorize=False)
    with np.errstate(over="ignore"):
        out = out + _U64(seed) * _SM_GAMMA
    return splitmix64(out)


def hash_u64_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Combine two uint64 arrays into one (order-sensitive)."""
    with np.errstate(over="ignore"):
        return splitmix64(a.astype(_U64) * _U64(0xC2B2AE3D27D4EB4F) + splitmix64(b.astype(_U64)))


def md5_hex(strs) -> list[str]:
    """md5 hex digest per string — matches DuckDB's ``md5()`` so exact-dedup
    content keys are oracle-comparable."""
    return [hashlib.md5(s.encode("utf-8")).hexdigest() for s in strs]


def rolling_window_hashes(codes: np.ndarray, length: int,
                          base: int) -> np.ndarray:
    """All length-``length`` window polynomial hashes of a uint64 code
    sequence in O(n) — the exact-substring-dedup kernel.

    h(i) = sum_{k<L} codes[i+k] * base^(L-1-k)  (mod 2^64), computed
    via the prefix trick: odd bases are invertible mod 2^64, so
    S[j] = sum_{t<j} codes[t]*base^(-t) gives
    h(i) = (S[i+L] - S[i]) * base^(i+L-1) — three vectorized passes,
    no per-window work.  A single 64-bit polynomial hash admits
    structured collisions; callers key on TWO hashes with independent
    odd bases (~128-bit combined), the same widening note as
    ``stable_hash64``.
    """
    n = int(codes.size)
    if n < length:
        return np.empty(0, dtype=_U64)
    base_u = _U64(base)
    if int(base) % 2 == 0:
        raise ValueError("rolling-hash base must be odd (invertible mod 2^64)")
    binv = _U64(pow(int(base), -1, 1 << 64))
    with np.errstate(over="ignore"):
        bpow = np.empty(n, dtype=_U64)
        bpow[0] = _U64(1)
        if n > 1:
            bpow[1:] = np.cumprod(np.full(n - 1, base_u, dtype=_U64))
        binvpow = np.empty(n, dtype=_U64)
        binvpow[0] = _U64(1)
        if n > 1:
            binvpow[1:] = np.cumprod(np.full(n - 1, binv, dtype=_U64))
        s = np.empty(n + 1, dtype=_U64)
        s[0] = _U64(0)
        np.cumsum(codes.astype(_U64) * binvpow, out=s[1:])
        return (s[length:] - s[:n - length + 1]) * bpow[length - 1:]
