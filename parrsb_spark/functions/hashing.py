"""Deterministic, engine-portable hashing.

Spark's ``hash()``/``xxhash64()`` and DuckDB's ``hash()`` disagree, so
every hash that must be reproducible by the SQL oracle is derived from
md5 (identical hex in both engines) and plain 64-bit modular arithmetic.

Spark:   conv(substring(md5(x), 1, 15), 16, 10)::BIGINT   (60 bits, no overflow)
DuckDB:  ('0x' || substr(md5(x), 1, 15))::BIGINT
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 60-bit md5 prefix keeps us clear of BIGINT overflow in both engines.
MD5_PREFIX_HEX_CHARS = 15

# Universal-hash family parameters for MinHash: h_k(x) = (a_k * x' + b_k) % P
# with x' = x % 2^31 - 1 so a*x' stays below 2^62 (signed-64 safe in SQL).
MOD_P = 1_000_000_007
MOD_X = 2_147_483_647
HASH_SALT_A = [2971215073, 1640531527, 2654435761, 40503, 2246822519,
               3266489917, 668265263, 374761393, 3537542053, 1181783497,
               2285562593, 3423571495, 1695981161, 2946901073, 1151004081,
               2862933555][:16]
HASH_SALT_B = [1013904223, 1442695040, 1664525, 22695477, 1103515245,
               134775813, 214013, 69069, 32719, 95273,
               77611, 186613, 914334, 271829, 413969, 999331][:16]
# Keep a_k odd-ish & < 2^31 so a*x' < 2^62.
HASH_SALT_A = [a % MOD_X for a in HASH_SALT_A]
HASH_SALT_B = [b % MOD_P for b in HASH_SALT_B]


def md5_long_col(col: Column) -> Column:
    """60-bit deterministic hash of a string column, oracle-portable."""
    return F.conv(F.substring(F.md5(col), 1, MD5_PREFIX_HEX_CHARS), 16, 10).cast("bigint")


def md5_long_sql_duckdb(expr: str) -> str:
    """DuckDB SQL text computing the same value as :func:`md5_long_col`."""
    return f"(('0x' || substr(md5({expr}), 1, {MD5_PREFIX_HEX_CHARS}))::BIGINT)"


def minhash_col(token_hash: Column, k: int) -> Column:
    """k-th universal hash of a 60-bit token hash (portable arithmetic)."""
    a, b = HASH_SALT_A[k], HASH_SALT_B[k]
    return (token_hash % MOD_X * F.lit(a) + F.lit(b)) % MOD_P


def minhash_sql_duckdb(token_hash_expr: str, k: int) -> str:
    a, b = HASH_SALT_A[k], HASH_SALT_B[k]
    return f"((({token_hash_expr}) % {MOD_X} * {a} + {b}) % {MOD_P})"
