"""Hashing helpers.

The reference scrubs PII with SHA-256 and FarmHash64 fingerprints
(``data_structures.py:1336-1353``). Spark-side:

  - ``sha256_hex`` -> built-in ``F.sha2`` (JVM, codegen).
  - ``fingerprint64`` -> ``F.xxhash64`` as the native 64-bit analog.
    Bit-exact BigQuery FARM_FINGERPRINT parity would need a pandas_udf over
    a farmhash library (not installed here); xxhash64 is the documented
    default and is stable across Spark versions.
  - ``md5_bigint`` -> first 15 hex chars of md5 as a non-negative bigint.
    Used wherever a hash must be REPRODUCIBLE IN ANY ENGINE (DuckDB oracle
    parity for minhash/simhash): md5 + hex-slice + base-16 parse exist in
    every SQL dialect, unlike xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def sha256_hex(col: Column | str) -> Column:
    return F.sha2(_c(col).cast("string"), 256)


def fingerprint64(col: Column | str) -> Column:
    return F.xxhash64(_c(col).cast("string"))


def md5_bigint(col: Column | str, *, seed: int | str = "") -> Column:
    """Portable 60-bit hash: bigint(md5(seed || value)[:15]).

    15 hex chars = 60 bits, always < 2^63 so the conv() result is exact and
    non-negative in every engine. DuckDB equivalent:
    ``from_hex(substr(md5(s), 1, 15))::BIT::BIGINT`` — see oracle builders.
    """
    s = F.concat(F.lit(str(seed)), _c(col).cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
