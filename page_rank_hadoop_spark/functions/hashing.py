"""Portable deterministic hashing for dedup/LSH.

Spark's native ``xxhash64``/``hash`` are fastest but not reproducible in
DuckDB, so oracle-checked operators use md5-derived hashes (identical hex
in both engines). MinHash exploits that min-over-128-bit-values equals
min-over-hex-strings of fixed length: ``min(md5(salt || shingle))`` is a
valid minwise hash per salt, with no integer conversion needed anywhere.

For pure-Spark scale paths (not oracle-compared) prefer ``F.xxhash64`` —
it is codegen'd and several times cheaper than md5.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash(col: Column | str, salt: int | None = None) -> Column:
    """Deterministic 32-hex-char hash, optionally salted (for the i-th
    MinHash permutation)."""
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(f"{salt}|"), c)
    return F.md5(c)


MINHASH_PRIME = 4294967311  # smallest prime > 2^32


def minhash_signature(shingles: Column, n_hashes: int) -> Column:
    """MinHash signature as an array of n bigints (Carter-Wegman family).

    One md5 per shingle, split into two 32-bit halves (a, b); the i-th
    hash is ``(a + i·b) mod P`` with P the smallest prime > 2^32, so the
    n_hashes permutations cost n cheap integer passes instead of n md5
    passes (≈12× less hashing at n=12). All map-side, no shuffle; max
    intermediate value a + n·b < 2^32·(n+1) stays far below 2^63, so the
    arithmetic is overflow-free in both Spark and the DuckDB oracle.
    """
    ab = F.transform(
        F.transform(shingles, lambda s: F.md5(s)),
        lambda m: F.struct(
            F.conv(F.substring(m, 1, 8), 16, 10).cast("long").alias("a"),
            F.conv(F.substring(m, 9, 8), 16, 10).cast("long").alias("b"),
        ),
    )

    def perm(i: int):
        # one-param lambda on purpose: transform() treats two-param
        # lambdas as (element, index)
        return lambda x: (x["a"] + i * x["b"]) % MINHASH_PRIME

    sig = [F.array_min(F.transform(ab, perm(i))) for i in range(n_hashes)]
    return F.array(*sig)


def lsh_bands(signature: Column, n_bands: int, rows_per_band: int) -> Column:
    """Split a MinHash signature into band keys: array of (band_id, band
    hash) structs. Documents sharing any band key are near-dup candidates;
    the downstream band-key equi-join is the only shuffle in the pipeline.
    """
    as_str = F.transform(signature, lambda h: h.cast("string"))
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.array_join(F.slice(as_str, b * rows_per_band + 1, rows_per_band), "|")).alias(
                "key"
            ),
        )
        for b in range(n_bands)
    ]
    return F.array(*bands)


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash over a token array, portable form.

    Per token we take md5 and use its first 16 hex chars as a 64-bit
    pattern; each bit votes +1/−1 weighted by presence, and the sign vector
    is reassembled into a bigint. Expressed as pure array expressions:
    for each bit position, count tokens with that bit set vs total.
    """
    n = F.size(tokens_col)
    hashes = F.transform(tokens_col, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"))

    def bit_set(b: int):
        # one-param lambda on purpose (see salted() above)
        return lambda h: (F.shiftright(h, b) % 2) == 1

    # 60 usable bits from 15 hex chars; bit b set iff majority of tokens set it
    bits = [
        F.when(F.size(F.filter(hashes, bit_set(b))) * 2 > n, F.lit(1).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias(f"bit{b}")
        for b in range(60)
    ]
    out = F.lit(0).cast("long")
    for b, bit in enumerate(bits):
        out = out + F.shiftleft(bit, b)
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))
