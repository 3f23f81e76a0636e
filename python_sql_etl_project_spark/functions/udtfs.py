"""Python UDTF surface (SURVEY §2.11 — absent in the reference, completed
here as the third leg of the UDF/UDAF/UDTF triangle alongside the Arrow
pandas-UDF kernels and ``applyInPandasWithState``).

A UDTF is the LATERAL-join escape hatch: one input row → many output
rows with per-row Python logic Spark's built-ins can't express. It is a
row-at-a-time path, so by this engine's rules it is NOT used in any hot
registered query — the production chunker is the pure-SQL
``pack_chunk_overlap`` plan; the UDTF here implements the *identical
semantics* and a test pins the equivalence, demonstrating the surface
without paying its cost anywhere that scales.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

#: Mirror pack_chunk_overlap's geometry (operators/sampling.py).
CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8
_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP


@udtf(returnType="chunk_idx: bigint, chunk_tokens: bigint, chunk_text: string")
class ChunkDocument:
    """Sliding-window document chunker: yields (chunk_idx, token count,
    chunk text) per window of ``CHUNK_TOKENS`` tokens with
    ``CHUNK_OVERLAP``-token overlap — the same windows the SQL chunker
    derives with ``sequence``/``slice``."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract method
        if text is None:
            return
        w = text.strip().split()
        if not w:
            return
        if len(w) <= CHUNK_TOKENS:
            n_chunks = 1
        else:
            n_chunks = 1 + -(-(len(w) - CHUNK_TOKENS) // _STRIDE)
        for i in range(n_chunks):
            chunk = w[i * _STRIDE : i * _STRIDE + CHUNK_TOKENS]
            yield i, len(chunk), " ".join(chunk)


def register_udtfs(spark) -> None:
    """Register the UDTF surface on a session (SQL name: chunk_document)."""
    spark.udtf.register("chunk_document", ChunkDocument)
