"""Scalar column expressions shared across operators — all built-in
``pyspark.sql.functions`` compositions (JVM-side, codegen-friendly); no
Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def js_parse_int(col: Column | str) -> Column:
    """JS ``parseInt`` semantics (reference js:23973-23976): parse a leading
    optionally-signed integer prefix, NULL when there is none.

    ``parseInt("12px") -> 12``, ``parseInt("abc") -> null`` — a plain Spark
    ``cast("int")`` would return null for "12px"; the regexp keeps prefix
    parsing (SURVEY.md §2.2 P6).
    """
    c = F.col(col) if isinstance(col, str) else col
    prefix = F.regexp_extract(F.trim(c), r"^[+-]?\d+", 0)
    return F.when(prefix != "", prefix.cast("int"))


def epoch_us(name: str) -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ column (by name), treating the
    wall clock as UTC — the exact twin of DuckDB's ``epoch_us(ts)`` on a
    naive parquet timestamp, and independent of the session timezone
    (``unix_micros``/``cast(.. as bigint)`` are either illegal on NTZ or
    session-tz dependent; ``timestampdiff`` is pure wall-clock arithmetic).
    Events ``ts`` is guaranteed NTZ by sources/tables.py:load_table."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {name})"
    )


def epoch_s(name: str) -> Column:
    """Whole epoch seconds (floor) of a TIMESTAMP_NTZ column — matches
    DuckDB ``epoch_us(ts) // 1000000`` (integer div of the µs value, never
    float division)."""
    return F.call_function("div", epoch_us(name), F.lit(1_000_000))


def basename(col: Column | str) -> Column:
    """``os.path.basename(url)`` (flows/main_flow.py:143) as a column expr."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, "/"), -1)


def _md5_le_hex(col: Column | str) -> Column:
    """Hex string of the little-endian u64 of md5 bytes 8..15 — the value
    DuckDB's ``md5_number_lower`` computes (hex chars 17..32 with byte
    pairs reversed)."""
    c = F.col(col) if isinstance(col, str) else col
    hexpart = F.substring(F.md5(c), 17, 16)
    return F.concat(*[F.substring(hexpart, i, 2) for i in range(15, 0, -2)])


def stable_hash64(col: Column | str) -> Column:
    """Deterministic unsigned-ish 64-bit-range hash of a string, derived from
    the low 64 bits of md5 so it is reproducible across engines (DuckDB:
    ``md5_number_lower``). Returned as DECIMAL(20,0) because the value can
    exceed signed-bigint range.

    Decimal arithmetic is slow — in hash-per-shingle hot loops use the
    long-typed ``stable_hash_p31`` / ``stable_hash_u32`` residues instead.
    """
    return F.conv(_md5_le_hex(col), 16, 10).cast("decimal(20,0)")


def stable_hash_p31(col: Column | str) -> Column:
    """``stable_hash64 % (2^31-1)`` in pure long arithmetic (no decimal):
    u64 = hi32·2^32 + lo32 and 2^32 ≡ 2 (mod 2^31-1), so the residue is
    ``(2·hi32 + lo32) % p`` — bit-identical to the decimal pmod, ~5x
    cheaper and far smaller codegen."""
    le = _md5_le_hex(col)
    hi = F.conv(F.substring(le, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(le, 9, 8), 16, 10).cast("long")
    return F.pmod(2 * hi + lo, F.lit(2147483647).cast("long"))


def stable_hash_u32(col: Column | str) -> Column:
    """``stable_hash64 % 2^32`` in pure long arithmetic: the low 32 bits
    are the last 8 little-endian hex chars."""
    return F.conv(F.substring(_md5_le_hex(col), 9, 8), 16, 10).cast("long")


def token_array(col: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization with empty-token removal — the canonical
    tokenizer for dedup / text-analysis operators. Pure built-ins so the
    same semantics are expressible in the DuckDB oracle
    (``string_split_regex`` + ``list_filter``).
    """
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    toks = F.split(F.trim(c), r"\s+")
    return F.filter(toks, lambda t: t != "")


def cents(col: Column | str) -> Column:
    """Exact integer cents of a 2-decimal money double: ``round(x*100)`` as
    long. Both engines compute the identical product double and round
    half-away-from-zero, so the integer is cross-engine deterministic —
    the foundation for float-free money aggregation (SQL:
    ``CAST(ROUND(x * 100) AS BIGINT)``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, 0).cast("long")


def half_up_units(units_sum: Column, n: Column, mul: int) -> Column:
    """Half-up integer rounding of ``units_sum * mul / n`` for non-negative
    sums — exact decimal averages without any float rounding (SQL:
    ``(2 * s * mul + n) // (2 * n)``)."""
    num = 2 * units_sum * F.lit(mul).cast("long") + n
    den = 2 * n
    # Integer `div`, not float `/`: (num - pmod) is an exact multiple of den,
    # but routing it through a double loses exactness past 2^53 and the
    # truncating cast would then yield K-1 (same hazard tables.py documents
    # for the ns→µs conversion).
    return F.call_function("div", num, den)
