"""Vector (embedding) column functions — JVM-side, no UDFs.

Dot products and cosine similarity over ``array<float>`` columns via
``zip_with`` + ``aggregate`` in double precision; sign-bit bucketing for
LSH-style blocking. For very wide vectors where expression trees get large,
the documented alternative is an Arrow-batched Pandas UDF — at 64-dim these
stay comfortably in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_expr(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double precision."""
    pa = _c(a).cast("array<double>")
    pb = _c(b).cast("array<double>")
    return F.aggregate(
        F.zip_with(pa, pb, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column | str) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    num = dot_expr(a, b)
    den = norm_expr(a) * norm_expr(b)
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def l2_expr(a: Column | str, b: Column | str) -> Column:
    pa = _c(a).cast("array<double>")
    pb = _c(b).cast("array<double>")
    return F.sqrt(
        F.aggregate(
            F.zip_with(pa, pb, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def sign_bucket_expr(vec: Column | str, dims: list[int]) -> Column:
    """LSH bucket key: sign bits of the chosen dimensions packed into a long.

    Deterministic axis-aligned hyperplanes — two near-identical vectors land
    in the same bucket with high probability; used to block ANN candidate
    generation so the exact cosine only runs within buckets.
    """
    if len(dims) > 63:
        # the bucket key is a signed long: bit 63 would need the 1 << 63
        # literal, which overflows it (and 2^63 buckets is far beyond any
        # useful occupancy anyway)
        raise ValueError("sign_bucket_expr supports at most 63 dims")
    v = _c(vec)
    bit_terms = [
        F.when(F.element_at(v, d + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, d in enumerate(dims)
    ]
    out = F.lit(0)
    for t in bit_terms:
        out = out + t
    return out.cast("long")


def quantize_int8_expr(vec: Column | str, scale: float = 127.0) -> Column:
    """Symmetric int8 quantisation of a float vector (array<tinyint>).

    ``q_i = round(clamp(x_i, -1, 1) * scale)`` — the storage form embedding
    pipelines ship (4× smaller than float32, 8× smaller than float64);
    expression-only, so it runs inside whole-stage codegen on the scan.
    """
    v = _c(vec)
    s = F.lit(float(scale))
    return F.transform(
        v,
        lambda x: F.round(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), x)) * s)
        .cast("tinyint"),
    )


def dequantize_int8_expr(qvec: Column | str, scale: float = 127.0) -> Column:
    """Inverse of :func:`quantize_int8_expr`: array<tinyint> → array<double>."""
    return F.transform(
        _c(qvec), lambda q: q.cast("double") / F.lit(float(scale))
    )
