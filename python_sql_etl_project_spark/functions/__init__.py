"""Public expression library: the engine's reusable column builders.

Everything here is a *Column-in, Column-out* expression factory (or a
lazily built Pandas UDF) with no action and no session dependency at
import time — composable into any DataFrame plan, the way
``pyspark.sql.functions`` composes. Implementations live next to the
operators that own them; this module is the stable import surface:

    from python_sql_etl_project_spark import functions as EF
    df.select(EF.tokens("body"), EF.cosine(a, b))
"""

from __future__ import annotations

from ..operators.dedup import shingles  # noqa: F401  (DataFrame-level)
from ..operators.similarity import (  # noqa: F401
    cosine_batch_udf,
    _band_code as lsh_band_code,
    _cosine as cosine,
    _cosine_prenorm as cosine_prenorm,
    _dot as dot,
    _norm as norm,
)
from ..operators.text import tokens  # noqa: F401

from .udtfs import ChunkDocument, register_udtfs

__all__ = [
    "ChunkDocument",
    "register_udtfs",
    "tokens",
    "shingles",
    "dot",
    "norm",
    "cosine",
    "cosine_prenorm",
    "cosine_batch_udf",
    "lsh_band_code",
]
