"""Portable deterministic hashing shared by the dedup/similarity operators.

MinHash/SimHash/LSH need a hash family that is reproducible across engines
(the DuckDB oracle must compute bit-identical signatures). Spark's
``xxhash64``/``hash`` and DuckDB's ``hash`` are different algorithms, so we
derive a 60-bit integer from the first 15 hex chars of md5 — md5 is md5
everywhere:

- Spark:  ``conv(substring(md5(s), 1, 15), 16, 10)`` cast to long
- DuckDB: ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``
- Python: ``int(hashlib.md5(s).hexdigest()[:15], 16)``

15 hex chars = 60 bits, always non-negative, no signed-overflow edge cases in
either engine. Seeded family: ``h_i(s) = H(i || '|' || s)``.

md5 here is a deterministic mixer, not a security primitive; at cluster scale
you would swap in xxhash64 (Spark-side only) once an oracle is not needed —
the operators take the hash builder as a parameter.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column | str, seed: int | str | None = None) -> Column:
    """60-bit portable hash of a string column (optionally seeded).

    ``seed`` may be an int or a short string tag (e.g. ``"arm"`` in the A/B
    split) — anything whose f-string form is stable; it is prepended as
    ``f"{seed}|"``.
    """
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}|"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def portable_hash64_py(s: str, seed: int | str | None = None) -> int:
    """Python mirror of :func:`portable_hash64` (for literal plane matrices)."""
    if seed is not None:
        s = f"{seed}|{s}"
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def dd_hash(expr: str, seed: str | None = None) -> str:
    """DuckDB SQL fragment mirror of :func:`portable_hash64`.

    ``seed`` is a SQL expression (e.g. a column or literal int) concatenated
    as ``seed || '|' || expr``.
    """
    inner = f"{seed} || '|' || {expr}" if seed is not None else expr
    return f"CAST('0x' || substr(md5({inner}), 1, 15) AS BIGINT)"
