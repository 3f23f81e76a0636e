"""Property-based tests (hypothesis) for the core relational operators.

Example-based tests pin known cases; these pin the ALGEBRAIC contracts —
the semantic subtleties SURVEY §7.3 calls out (keep-first determinism,
anti-join set semantics, orphan-repair closure) — across arbitrary
small inputs, including duplicates, nulls, and empty frames.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from python_sql_etl_project_spark.operators.relational import (
    anti_join,
    coercion_filter,
    dedupe_first,
    repair_orphan_keys,
)

KEYS = st.integers(min_value=0, max_value=5)
ROWS = st.lists(
    st.tuples(KEYS, st.integers(min_value=0, max_value=100)), max_size=25
)

SLOW_OK = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, rows, cols=("k", "v")):
    pdf = pd.DataFrame(rows or [(0, 0)], columns=list(cols))
    df = spark.createDataFrame(pdf)
    return df.limit(0) if not rows else df


@SLOW_OK
@given(rows=ROWS)
def test_dedupe_first_keeps_min_ordered_row(spark, rows):
    """dedupe_first == pandas sort_values + drop_duplicates(keep='first')."""
    got = sorted(
        (r["k"], r["v"])
        for r in dedupe_first(_df(spark, rows), "k", ["v"]).collect()
    )
    expect = sorted(
        pd.DataFrame(rows, columns=["k", "v"])
        .sort_values(["v"], kind="stable")
        .drop_duplicates(subset=["k"], keep="first")
        .itertuples(index=False)
    ) if rows else []
    assert got == expect


@SLOW_OK
@given(left=ROWS, right=st.lists(KEYS, max_size=10))
def test_anti_join_is_set_difference(spark, left, right):
    ldf = _df(spark, left)
    rdf = _df(spark, [(k, 0) for k in right])
    got = sorted((r["k"], r["v"]) for r in anti_join(ldf, rdf, "k").collect())
    expect = sorted((k, v) for k, v in left if k not in set(right))
    assert got == expect


@SLOW_OK
@given(fact=ROWS, dim=st.lists(KEYS, max_size=10))
def test_repair_orphan_keys_closure(spark, fact, dim):
    """After repair: every fact key exists in the dimension, original dim
    rows survive untouched, and no duplicate keys are introduced."""
    fact_df = _df(spark, fact)
    dim_df = _df(spark, [(k, k * 10) for k in set(dim)], cols=("k", "label"))
    repaired = repair_orphan_keys(fact_df, dim_df, "k", {"label": -1})
    rows = repaired.collect()
    keys = [r["k"] for r in rows]
    assert len(keys) == len(set(keys))  # no dup keys introduced
    assert set(k for k, _ in fact) <= set(keys)  # closure over fact keys
    originals = {r["k"]: r["label"] for r in rows if r["k"] in set(dim)}
    assert originals == {k: k * 10 for k in set(dim)}  # dim rows untouched


WIDE_KEYS = st.integers(min_value=2**53, max_value=2**62)


@SLOW_OK
@given(keys=st.lists(WIDE_KEYS, min_size=1, max_size=10, unique=True))
def test_coercion_filter_bigint_exact_above_2_53(spark, keys):
    """Wide integral PKs survive bigint coercion EXACTLY (no double
    round-trip low-bit loss) while junk rows are still dropped — the
    direct-cast fast path in ``coercion_filter``."""
    rows = [(str(k),) for k in keys] + [("abc",), (None,), ("",)]
    pdf = pd.DataFrame(rows, columns=["k"])
    df = spark.createDataFrame(pdf)
    out = coercion_filter(df, "k", "bigint")
    assert dict(out.dtypes)["k"] == "bigint"
    got = sorted(r["k"] for r in out.collect())
    assert got == sorted(keys)  # exact, junk dropped


def test_coercion_filter_bigint_float_strings(spark):
    """Float-shaped and scientific strings keep pd.to_numeric semantics on
    the bigint path ('7.0'→7, '1e5'→100000, '7.9' truncates)."""
    df = spark.createDataFrame(
        pd.DataFrame([("7.0",), ("7.9",), ("1e5",), ("x",)], columns=["k"])
    )
    got = sorted(r["k"] for r in coercion_filter(df, "k", "bigint").collect())
    assert got == [7, 7, 100000]


MORTON_COORD = st.integers(min_value=0, max_value=1023)
COORD_PAIRS = st.lists(
    st.tuples(MORTON_COORD, MORTON_COORD), min_size=1, max_size=30, unique=True
)


def _morton_py(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@SLOW_OK
@given(pairs=COORD_PAIRS)
def test_morton_col_is_the_bit_interleave_bijection(spark, pairs):
    """morton_col == the reference Python interleave on arbitrary coords,
    and distinct (a, b) pairs always yield distinct codes (bijectivity —
    the property Z-order file pruning relies on)."""
    from python_sql_etl_project_spark.load.layout import morton_col

    df = _df(spark, pairs, cols=("a", "b"))
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", morton_col(F.col("a"), F.col("b"), 10).alias("z")
        ).collect()
    }
    expected = {(a, b): _morton_py(a, b, 10) for a, b in pairs}
    assert got == expected
    assert len(set(got.values())) == len(pairs)


@SLOW_OK
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40,
        unique=True,
    ),
    probes=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40,
        unique=True,
    ),
)
def test_bloom_membership_properties(spark, keys, probes):
    """No false negatives for ANY key set (the safety property), and the
    filter is deterministic across rebuilds."""
    from python_sql_etl_project_spark.operators.sketch import (
        _pos_sql,
        bloom_build,
    )

    kdf = _df(spark, [(k, 0) for k in keys], cols=("k", "pad")).select("k")
    words = {r["idx"]: r["w"] for r in bloom_build(kdf, "k", spark).collect()}
    words2 = {r["idx"]: r["w"] for r in bloom_build(kdf, "k", spark).collect()}
    assert words == words2

    pdf = _df(spark, [(p, 0) for p in set(keys) | set(probes)], cols=("k", "pad"))
    pos = pdf.selectExpr(
        "k",
        f"CAST({_pos_sql('k', 0, 'STRING')} AS BIGINT) AS p0",
        f"CAST({_pos_sql('k', 1, 'STRING')} AS BIGINT) AS p1",
    ).collect()

    def hit(w, p):
        return ((w.get(p // 64, 0) >> (p % 64)) & 1) == 1

    for r in pos:
        if r["k"] in keys:
            assert hit(words, r["p0"]) and hit(words, r["p1"]), r["k"]
