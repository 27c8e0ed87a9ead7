"""Portable text hashing: one spec, two engines.

The dedup/similarity operators need hash functions that are
bit-identical in Spark (the engine) and DuckDB (the driver's oracle).
Neither engine's native hash matches the other, so these helpers build
the same arithmetic — positional polynomial shingle hashes and affine
MinHash permutations over a Mersenne-prime field — as BOTH a PySpark
Column expression and an ANSI-SQL string. Production deployments that
don't need cross-engine verification can swap ``xxhash64`` in for ~2x
throughput; semantics are otherwise identical.

All constants stay below 2^62 so ANSI overflow checking (Spark 4
default) never trips: poly hash < 31^7*255 < 2^45; affine step
a*h+b < 2^17 * 2^45 < 2^62.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MERSENNE = 2147483647  # 2^31 - 1

#: deterministic MinHash permutation parameters (a odd, b) — module
#: constants so Spark and SQL generation share them
def minhash_params(n_hashes: int) -> list[tuple[int, int]]:
    return [((2 * i + 1) * 2654435761 % 131071 | 1, (i * 40503 + 17) % 65521)
            for i in range(n_hashes)]


# ------------------------------------------------------------- shingles


def shingles_spark(col: Column, k: int) -> Column:
    """Distinct k-character shingles; texts shorter than k yield an
    empty array (both engines; avoids partial-shingle edge cases —
    DuckDB's ord('') errors and Spark's sequence(1,0) runs backwards)."""
    return F.when(
        F.length(col) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(col) - (k - 1)),
                lambda i: col.substr(i, F.lit(k)),
            )
        ),
    ).otherwise(F.expr("cast(array() as array<string>)"))


def shingles_sql(expr: str, k: int) -> str:
    return (
        f"(CASE WHEN length({expr}) >= {k} THEN list_distinct(list_transform("
        f"range(1, length({expr}) - {k - 1} + 1), "
        f"i -> substring({expr}, CAST(i AS INT), {k}))) "
        f"ELSE [] END)"
    )


# ----------------------------------------------------- polynomial hash


def poly_hash_spark(sh: Column, k: int) -> Column:
    """Positional base-31 hash of a k-char shingle (unrolled, integer)."""
    total = F.lit(0).cast("long")
    for j in range(k):
        total = total + F.ascii(sh.substr(j + 1, 1)) * F.lit(31 ** (k - 1 - j))
    return total


def poly_hash_sql(sh: str, k: int) -> str:
    terms = [
        f"ord(substring({sh}, {j + 1}, 1)) * {31 ** (k - 1 - j)}::BIGINT"
        for j in range(k)
    ]
    return "(" + " + ".join(terms) + ")"


def shingle_hashes_spark(col: Column, k: int, hash_fn: str = "poly") -> Column:
    """array<long> of distinct shingle hashes.

    ``hash_fn="poly"`` (default) is the portable positional base-31
    hash both engines reproduce — REQUIRED for DuckDB oracle parity,
    but structure-preserving: a constant character shift (e.g. a
    Caesar-rotated corpus) shifts every all-letter shingle's hash by
    the same constant, and the affine MinHash permutations map
    constant-shifted sets to constant-shifted sets, so collision
    statistics degrade on structured inputs (measured 4.7x the
    candidate pairs on a rotated copy of the same corpus).
    ``hash_fn="xxhash64"`` is the production setting: avalanched
    (reduced into the Mersenne field so the affine step can't
    overflow under ANSI), immune to input structure, ~2x faster —
    but not reproducible in the SQL oracle.

    Deliberately extracts the k-char shingle strings first and hashes
    those: UTF8String.substr is O(position) (no random character
    access), so hashing straight off text positions would probe the
    full string k times per position — measured ~1.5x slower than one
    shingle extraction + k probes of a k-char string."""
    if hash_fn == "xxhash64":
        return F.array_distinct(
            F.transform(
                shingles_spark(col, k),
                lambda sh: F.pmod(F.xxhash64(sh), F.lit(MERSENNE)),
            )
        )
    if hash_fn != "poly":
        raise ValueError("hash_fn must be 'poly' or 'xxhash64'")
    return F.array_distinct(
        F.transform(shingles_spark(col, k), lambda sh: poly_hash_spark(sh, k))
    )


def shingle_hashes_sql(expr: str, k: int) -> str:
    return (
        f"list_distinct(list_transform({shingles_sql(expr, k)}, "
        f"sh -> {poly_hash_sql('sh', k)}))"
    )


# -------------------------------------------------------------- minhash


def minhash_signature_spark(hashes: Column, n_hashes: int) -> Column:
    """array<long> MinHash signature from an array of shingle hashes.

    Note: the permutation lambdas are built by a closure factory —
    PySpark derives higher-order-function arity from the FULL Python
    parameter list, so defaulted captures (lambda h, a=a: …) silently
    turn a 1-arg transform into a broken 3-arg one."""

    def perm(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE)

    sig = [
        F.array_min(F.transform(hashes, perm(a, b)))
        for a, b in minhash_params(n_hashes)
    ]
    return F.array(*sig)


def minhash_signature_sql(hashes_expr: str, n_hashes: int) -> str:
    parts = [
        f"list_min(list_transform({hashes_expr}, h -> ({a}::BIGINT * h + {b}) % {MERSENNE}))"
        for a, b in minhash_params(n_hashes)
    ]
    return "[" + ", ".join(parts) + "]"


# -------------------------------------------------------------- simhash

#: independent 31-bit rehash streams; fingerprint bit b draws from
#: stream b // 31, bit b % 31 — one (48271,…) stream only has 31 usable
#: bits, which silently zeroed everything past bit 30 and capped
#: fingerprints at toy widths. Three streams cover bits <= 92.
_SIMHASH_STREAMS = ((48271, 11), (16807, 3), (69621, 7))


def _simhash_bit_value(b: int) -> int:
    """Signed two's-complement value of fingerprint bit b in an int64
    (bit 63 is the sign bit: -2^63, representable in BOTH engines as a
    literal, unlike +2^63)."""
    return (1 << b) if b < 63 else -(1 << 63)


def simhash_spark(hashes: Column, bits: int = 64) -> Column:
    """bits-wide SimHash of an array of shingle hashes: bit b is the
    majority vote of bit b across rehashed elements. Default 64 — the
    web-scale standard width; 16-bit fingerprints collide constantly at
    corpus scale, pushing all the work onto the hamming filter."""
    if not 1 <= bits <= 64:
        raise ValueError("bits must be in [1, 64]")

    def voter(a: int, c: int, pos: int):
        return lambda acc, h: acc + F.when(
            (F.shiftright((F.lit(a) * h + F.lit(c)) % F.lit(MERSENNE), pos) % 2) == 1,
            F.lit(1),
        ).otherwise(F.lit(-1))

    total = F.lit(0).cast("long")
    for b in range(bits):
        a, c = _SIMHASH_STREAMS[b // 31]
        votes = F.aggregate(hashes, F.lit(0).cast("long"), voter(a, c, b % 31))
        total = total + F.when(
            votes > 0, F.lit(_simhash_bit_value(b))
        ).otherwise(F.lit(0))
    return total


def simhash_sql(hashes_expr: str, bits: int = 64) -> str:
    parts = []
    for b in range(bits):
        a, c = _SIMHASH_STREAMS[b // 31]
        vote = (
            f"list_sum(list_transform({hashes_expr}, "
            f"h -> CASE WHEN (({a}::BIGINT * h + {c}) % {MERSENNE} >> {b % 31}) % 2 = 1 "
            f"THEN 1 ELSE -1 END))"
        )
        # parenthesize the value: :: binds tighter than unary minus, and
        # -9223372036854775808::BIGINT would cast the unsigned literal
        # (out of BIGINT range) before negating
        parts.append(
            f"(CASE WHEN {vote} > 0 THEN ({_simhash_bit_value(b)})::BIGINT ELSE 0 END)"
        )
    return "(" + " + ".join(parts) + ")::BIGINT"
