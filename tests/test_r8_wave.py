"""Invariants for the round-8 wave beyond the oracle hash gate.

* ``fn_variant_shred`` — the VARIANT heterogeneity must be REAL (two
  distinct per-row ``schema_of_variant`` shapes in the corpus) and the
  missing-path NULL semantics must align exactly with the narrow shape.
* ``win_event_path_trigrams`` — every mined path holds <= 3 segments,
  user counts never exceed session counts, and the session total equals
  the distinct (user, day) population.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from python_sql_etl_project_spark import registry
from python_sql_etl_project_spark.session import read_table

SF = "/root/testdata/sf0.001"

registry.load_all()


def test_variant_shred_shapes_are_heterogeneous(spark):
    docs = read_table(spark, SF, "documents")
    js = F.when(
        F.col("lang") == "en",
        F.to_json(
            F.struct(
                F.col("doc_id").alias("id"),
                F.struct(F.col("n_chars").alias("chars")).alias("meta"),
                F.array(F.col("lang"), F.col("source")).alias("tags"),
            )
        ),
    ).otherwise(
        F.to_json(
            F.struct(
                F.col("doc_id").alias("id"),
                F.array(F.col("lang")).alias("tags"),
            )
        )
    )
    shapes = (
        docs.select(F.schema_of_variant(F.parse_json(js)).alias("s"))
        .distinct()
        .collect()
    )
    assert len(shapes) == 2, shapes  # wide (meta) + narrow
    assert any("meta" in r["s"] for r in shapes)
    assert any("meta" not in r["s"] for r in shapes)


def test_variant_shred_null_semantics_match_shape(spark):
    out = registry.QUERIES["fn_variant_shred"](spark, SF)
    # missing-path NULLs appear exactly on the narrow (non-en) shape
    bad = out.filter(
        ((F.col("tag0") == "en") & (F.col("meta_chars").isNull()))
        | ((F.col("tag0") != "en") & F.col("meta_chars").isNotNull())
        | ((F.col("tag0") == "en") & (F.col("n_tags") != 2))
        | ((F.col("tag0") != "en") & (F.col("n_tags") != 1))
    ).count()
    assert bad == 0
    n_docs = read_table(spark, SF, "documents").count()
    assert out.count() == n_docs


def test_event_path_trigrams_invariants(spark):
    out = registry.QUERIES["win_event_path_trigrams"](spark, SF)
    rows = out.collect()
    assert all(1 <= len(r["path"].split(">")) <= 3 for r in rows)
    assert all(1 <= r["n_users"] <= r["n_sessions"] for r in rows)
    ev = read_table(spark, SF, "events")
    user_days = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .count()
    )
    assert sum(r["n_sessions"] for r in rows) == user_days
