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


def shingle_hashes_spark(col: Column, k: int) -> Column:
    """array<long> of distinct polynomial shingle hashes."""
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


def simhash_spark(hashes: Column, bits: int = 16) -> Column:
    """bits-wide SimHash of an array of shingle hashes: bit b is the
    majority vote of bit b across rehashed elements."""
    def voter(b: int):
        return lambda acc, h: acc + F.when(
            (F.shiftright((F.lit(48271) * h + F.lit(11)) % F.lit(MERSENNE), b) % 2) == 1,
            F.lit(1),
        ).otherwise(F.lit(-1))

    total = F.lit(0).cast("long")
    for b in range(bits):
        votes = F.aggregate(hashes, F.lit(0).cast("long"), voter(b))
        total = total + F.when(votes > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return total


def simhash_sql(hashes_expr: str, bits: int = 16) -> str:
    parts = []
    for b in range(bits):
        vote = (
            f"list_sum(list_transform({hashes_expr}, "
            f"h -> CASE WHEN ((48271::BIGINT * h + 11) % {MERSENNE} >> {b}) % 2 = 1 "
            f"THEN 1 ELSE -1 END))"
        )
        parts.append(f"(CASE WHEN {vote} > 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")::BIGINT"
