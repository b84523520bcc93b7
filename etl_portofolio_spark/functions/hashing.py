"""Cross-engine-deterministic hashing primitives.

Spark's ``hash()``/``xxhash64()`` and DuckDB's ``hash()`` use different
algorithms, so every hashed operator (minhash, simhash, fingerprints,
LSH) is built on md5 — available and bit-identical in both engines —
making the DuckDB oracles exact.

``h32(s) = int(md5(s)[0:8], 16)`` — an unsigned 32-bit value carried in
a long. Spark: ``conv(substring(md5(s),1,8),16,10)``; DuckDB:
``CAST('0x'||substr(md5(s),1,8) AS BIGINT)`` (verified identical).

All pure Column expressions — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Modulus for rolling fingerprints: 2^31-1 keeps ``acc*31 + h32`` within
#: a 64-bit long (2^31 * 31 + 2^32 < 2^37).
FINGERPRINT_MOD = 2147483647


def h32(col: Column | str) -> Column:
    """Deterministic unsigned-32-bit hash of a string, as a long."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """DuckDB SQL text computing the same ``h32`` value."""
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"


def h60(col: Column | str) -> Column:
    """Deterministic unsigned-60-bit hash of a string, as a long.

    15 md5 nibbles: the widest md5 prefix that stays strictly positive
    in a SIGNED 64-bit integer in both engines (16 nibbles could set
    the sign bit, and Spark's conv() and DuckDB's '0x' cast disagree on
    overflow handling). Used where 32 bits collide too much — e.g. the
    simhash fingerprint, where block keys must be discriminative.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """DuckDB SQL text computing the same ``h60`` value."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


#: Mersenne prime 2^31-1: modulus for the affine minhash permutations.
#: With h, a, b < 2^31, a*h + b < 2^62 — no 64-bit overflow in Spark or
#: DuckDB BIGINT arithmetic.
MINHASH_MOD = 2147483647

#: (a_i, b_i) for the i-th permutation pi_i(h) = (a_i*h + b_i) % MOD.
#: Fixed Knuth-style constants; both the Spark plan and the generated
#: oracle SQL embed these same literals.
MINHASH_PARAMS: tuple[tuple[int, int], ...] = tuple(
    (((2 * i + 1) * 2654435761) % MINHASH_MOD or 1, (i * 40503 + 12345) % MINHASH_MOD)
    for i in range(64)
)


def minhash_perm(i: int, h: Column) -> Column:
    """The i-th affine permutation of a base hash already reduced mod MOD."""
    a, b = MINHASH_PARAMS[i]
    return (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_MOD)


def minhash_perm_sql(i: int, expr: str) -> str:
    """DuckDB SQL twin of :func:`minhash_perm`."""
    a, b = MINHASH_PARAMS[i]
    return f"(({expr}) * {a} + {b}) % {MINHASH_MOD}"


def salted_md5(salt: int, col: Column | str) -> Column:
    """``md5('{salt}:' || s)`` — the i-th minhash hash function.

    Min over lowercase fixed-width hex strings is the same total order
    as min over the underlying 128-bit integers, so minhash can stay in
    string space: no 64-bit overflow concerns, identical in DuckDB.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat(F.lit(f"{salt}:"), c))


def salted_md5_sql(salt: int, expr: str) -> str:
    """DuckDB SQL twin of :func:`salted_md5`."""
    return f"md5('{salt}:' || {expr})"


def rolling_fingerprint(tokens: Column, mod: int = FINGERPRINT_MOD) -> Column:
    """Order-sensitive rolling hash over a token array (doc fingerprint).

    ``acc = (acc*31 + h32(token)) % mod`` folded left-to-right from 0.
    DuckDB twin: ``list_reduce(list_prepend(0, hashes), (a,b)->(a*31+b)%mod)``.
    """
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(31) + h32(t)) % F.lit(mod),
    )
