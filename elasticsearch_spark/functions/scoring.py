"""BM25 scoring, rank/score-compatible with the reference.

Reference semantics:
  - default similarity BM25 k1=1.2 b=0.75 discount_overlaps=true
    (index/similarity/SimilarityProviders.java:272-282, SimilarityService.java:55)
  - ES 7 wraps Lucene 8 BM25 in LegacyBM25Similarity => score multiplied by (k1+1)
    (SimilarityProviders.java:53; Lucene 8.5.1 dep per buildSrc/version.properties:3)
  - idf = ln(1 + (N - df + 0.5)/(df + 0.5)); avgdl = sum(dl)/N
  - doc length is quantized to one byte at index time via SmallFloat.intToByte4
    (Lucene norms; text norms on by default per TypeParsers.java:149,164), and the
    scorer decodes the lossy value -> we reproduce the quantize/dequantize exactly.

score(term, doc) = idf(term) * (k1+1) * tf / (tf + k1*(1 - b + b * dl_q/avgdl))

Everything is expressed as SQL snippets usable in BOTH Spark SQL and DuckDB so
the driver's oracle can verify value-identical scores.
"""

from __future__ import annotations

K1 = 1.2
B = 0.75


# ---------------------------------------------------------------- SmallFloat
def int_to_byte4(i: int) -> int:
    """Lucene SmallFloat.intToByte4 — 4-bit-mantissa float encoding of an int."""
    if i < 0:
        raise ValueError("negative length")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    encoded |= (shift + 1) << 3
    if encoded > 255:
        raise ValueError("length too large for byte4")
    return encoded


def byte4_to_int(b: int) -> int:
    """Lucene SmallFloat.byte4ToInt — decode the lossy doc length."""
    bits = b & 0x07
    shift = (b >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


def quantize_dl(dl: int) -> int:
    """The effective doc length BM25 sees: byte4ToInt(intToByte4(dl))."""
    return byte4_to_int(int_to_byte4(dl))


# --------------------------------------------------- dialect-portable SQL
def quantized_dl_sql(dl: str, dialect: str) -> str:
    """SQL for quantize_dl(dl): keep top-4 significant bits (round down).

    dl < 8 is exact; otherwise zero out all but the 4 most significant bits.
    """
    if dialect == "spark":
        shl = "shiftleft({a}, {s})"
        shr = "shiftright({a}, {s})"
    elif dialect == "duckdb":
        shl = "(({a}) << ({s}))"
        shr = "(({a}) >> ({s}))"
    else:
        raise ValueError(dialect)
    s = f"(cast(floor(log2(cast({dl} as double))) as int) - 3)"
    inner = shr.format(a=f"cast({dl} as bigint)", s=s)
    return f"(case when {dl} < 8 then cast({dl} as bigint) else {shl.format(a=inner, s=s)} end)"


def idf_sql(n_docs: str, df: str) -> str:
    """ln(1 + (N - df + 0.5)/(df + 0.5)) — portable across Spark SQL and DuckDB."""
    return f"ln(1.0 + ({n_docs} - {df} + 0.5) / ({df} + 0.5))"


def term_score_sql(tf: str, dl_q: str, avgdl: str, idf: str) -> str:
    """Per-(term,doc) BM25 contribution with the legacy (k1+1) factor."""
    norm = f"({K1} * (1.0 - {B} + {B} * cast({dl_q} as double) / ({avgdl})))"
    return f"(({idf}) * {K1 + 1.0} * cast({tf} as double) / (cast({tf} as double) + {norm}))"


def bm25_term_score(tf: float, dl: int, avgdl: float, n_docs: int, df: int) -> float:
    """Driver-side reference implementation (used by tests and the WAND kernel)."""
    import math

    dlq = quantize_dl(dl)
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    norm = K1 * (1.0 - B + B * dlq / avgdl)
    return idf * (K1 + 1.0) * tf / (tf + norm)
