"""Durability-selectable staging (VERDICT r3 item 1).

Every multi-consumer materialization routes through
``staging.materialize``; these tests prove the three modes are
output-equivalent on the two heaviest composite operators (curate_corpus,
canonicalize_surfaces) — byte-identical row sets — and that the durable
modes actually persist to the configured location (reliable → Spark
checkpoint dir; parquet → staging tables on disk).
"""

import os

import pytest

from nativeextractor_spark import staging


@pytest.fixture
def staged(tmp_path):
    """Restore process-wide staging config after each test."""
    yield tmp_path
    staging.configure(mode=None)
    staging._config["dir"] = None


def _corpus(spark):
    def good(seed):
        body = " ".join(f"word{seed}x{i}" for i in range(55))
        return body + " the and that have mail x@y.zw done"

    hdr = "shared boilerplate header\n"
    rows = [
        ("a", hdr + good(1)),
        ("b", hdr + good(2)),
        ("c", hdr + good(1)),
        ("d", "junk " * 3),
        ("e", hdr + good(1) + " tail55"),
    ]
    return spark.createDataFrame(rows, "url string, text string")


def _run_curate(spark):
    from nativeextractor_spark.textops.pipeline import curate_corpus

    out, metrics = curate_corpus(
        _corpus(spark), lsh_num_hashes=6, lsh_k=3, lsh_min_shared_bands=2
    )
    return sorted((r.url, r.text) for r in out.collect()), metrics


def _run_canonicalize(spark):
    from nativeextractor_spark.kg.canonicalize import canonicalize_surfaces

    surfaces = spark.createDataFrame(
        [("Acme Corporation",), ("acme corporation",), ("ACME Corporation",),
         ("Globex Industries",), ("globex  industries",), ("Zebra",),
         ("Antonín Dvořák",), ("Antonín Dvořák Jr",)],
        "surface string",
    )
    return sorted(
        (r.surface, r.norm, r.surface_id, r.canonical_id)
        for r in canonicalize_surfaces(surfaces, jaccard_threshold=0.4).collect()
    )


@pytest.mark.parametrize("mode", ["reliable", "parquet"])
def test_curate_corpus_mode_equivalence(spark, staged, mode):
    staging.configure(mode=None)  # default local
    base_rows, base_metrics = _run_curate(spark)
    staging.configure(mode=mode, staging_dir=str(staged))
    rows, metrics = _run_curate(spark)
    assert rows == base_rows
    assert metrics == base_metrics


@pytest.mark.parametrize("mode", ["reliable", "parquet"])
def test_canonicalize_mode_equivalence(spark, staged, mode):
    staging.configure(mode=None)
    base = _run_canonicalize(spark)
    staging.configure(mode=mode, staging_dir=str(staged))
    assert _run_canonicalize(spark) == base


def test_parquet_mode_actually_stages(spark, staged):
    staging.configure(mode="parquet", staging_dir=str(staged))
    df = spark.range(10).withColumnRenamed("id", "u")
    out = staging.materialize(df.selectExpr("u", "u + 1 as v"), "probe")
    assert sorted(r.v for r in out.collect()) == list(range(1, 11))
    staged_dirs = os.listdir(os.path.join(str(staged), "parquet"))
    assert any(d.startswith("probe-") for d in staged_dirs)
    # the staged relation is a fresh parquet scan: column pruning applies
    plan = out.select("v")._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    assert "struct<v:bigint>" in plan.split("ReadSchema")[1][:80]


def test_reliable_mode_sets_checkpoint_dir(spark, staged):
    staging.configure(mode="reliable", staging_dir=str(staged))
    df = spark.range(5).selectExpr("id * 2 as x")
    out = staging.materialize(df, "probe")
    assert sorted(r.x for r in out.collect()) == [0, 2, 4, 6, 8]
    ckdir = spark.sparkContext.getCheckpointDir()
    assert ckdir is not None


def test_parquet_mode_handles_empty_stage(spark, staged):
    """An empty intermediate (e.g. canonicalize's edge list when nothing
    is a near-duplicate) writes no parquet part files — the read-back must
    use the explicit schema instead of inference, preserving both the
    empty result and the exact column types."""
    staging.configure(mode="parquet", staging_dir=str(staged))
    df = spark.range(10).selectExpr(
        "id as u", "cast(id as string) as s", "array(id, id) as arr"
    ).where("u < 0")
    out = staging.materialize(df, "empty")
    assert out.count() == 0
    # parquet read-back widens nullability at every level (Spark reader
    # behavior); names and value types must match exactly
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
    ]
    # canonicalize end-to-end with NO near-duplicates under parquet mode
    from nativeextractor_spark.kg.canonicalize import canonicalize_surfaces

    surfaces = spark.createDataFrame(
        [("alpha",), ("omega",), ("zebra",)], "surface string"
    )
    rows = canonicalize_surfaces(surfaces).collect()
    assert len(rows) == 3
    assert all(r.canonical_id == r.surface_id for r in rows)


def test_env_var_mode_selection(spark, staged, monkeypatch):
    staging.configure(mode=None)
    monkeypatch.setenv("SPARK_GRAFT_STAGING", "parquet")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(staged))
    out = staging.materialize(spark.range(3), "envprobe")
    assert out.count() == 3
    assert any(
        d.startswith("envprobe-")
        for d in os.listdir(os.path.join(str(staged), "parquet"))
    )


def test_bad_mode_rejected():
    with pytest.raises(ValueError):
        staging.configure(mode="nope")
