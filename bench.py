"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "docs_per_sec": ..., ...}

Modes:
  python bench.py                  # headline suite (driver per-round mode)
  SPARK_GRAFT_SCALING=1 python bench.py
      # additionally runs the extraction+triples job at local[8] and
      # local[32] in subprocesses and reports scaling efficiency
      # (the sandbox evidence for the north rule's N→4N criterion),
      # updating BENCH/BASELINE.md
  python bench.py --scale-worker N  # internal: one scaling measurement
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _sf() -> float:
    base = os.path.basename(SF_DIR.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _n_pages(sf: float) -> int:
    return max(int(sf * 500_000), 500)


def _pages_path(sf: float) -> str:
    return f"/tmp/ne_bench_pages_sf{sf}.parquet"


def _ensure_pages(spark, sf: float) -> str:
    path = _pages_path(sf)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from nativeextractor_spark.datagen import generate_pages_df

        generate_pages_df(spark, n_pages=_n_pages(sf)).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def _mk_spark(master: str | None = None, cpus: int | None = None):
    from nativeextractor_spark.session import get_spark

    c = cpus or CPUS
    return get_spark(
        "nativeextractor-bench",
        master=master or f"local[{c}]",
        shuffle_partitions=max(c, 8),
    )


def _headline(spark, sf: float) -> dict[str, float]:
    """The headline suite; returns per-query seconds."""
    from pyspark.sql import functions as F

    from nativeextractor_spark.kg.canonicalize import canonicalize_surfaces
    from nativeextractor_spark.kg.pipeline import default_kg_miners
    from nativeextractor_spark.kg.triples import extract_triples, weight_triples
    from nativeextractor_spark.operators.extract import extract_occurrences
    from nativeextractor_spark.textops import lsh_duplicate_pairs
    from nativeextractor_spark.queries import QUERIES

    pages_path = _ensure_pages(spark, sf)
    pages = spark.read.parquet(pages_path)
    miners = default_kg_miners()
    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    timed("occurrences", lambda: extract_occurrences(pages, miners).count())
    triples = extract_triples(pages, miners)
    timed("triples", lambda: triples.count())
    timed("triple_weights", lambda: weight_triples(triples).count())
    surfaces = (
        triples.select(F.col("subj").alias("surface"))
        .unionByName(triples.select(F.col("obj").alias("surface")))
        .distinct()
    )
    timed("canonicalize", lambda: canonicalize_surfaces(surfaces).count())
    timed(
        "dedup_lsh_pages",
        lambda: lsh_duplicate_pairs(
            pages.select(F.col("url").alias("doc_id"), "text"), num_hashes=4
        ).count(),
    )
    timed("tpch_q1", lambda: QUERIES["tpch_q1"](spark, SF_DIR).count())
    timed("ann_topk", lambda: QUERIES["ann_topk"](spark, SF_DIR).count())
    return timings


def _scale_worker(cpus: int) -> None:
    """One scaling measurement: extraction+triples wall time on local[cpus]."""
    sf = _sf()
    spark = _mk_spark(master=f"local[{cpus}]", cpus=cpus)
    from nativeextractor_spark.kg.pipeline import default_kg_miners
    from nativeextractor_spark.kg.triples import extract_triples
    from nativeextractor_spark.operators.extract import extract_occurrences

    pages_path = _ensure_pages(spark, sf)
    pages = spark.read.parquet(pages_path)
    miners = default_kg_miners()
    # warm up JVM/Python workers with a tiny job so we time compute, not init
    pages.limit(64).count()
    t0 = time.perf_counter()
    n_occ = extract_occurrences(pages, miners).count()
    n_tri = extract_triples(pages, miners).count()
    secs = time.perf_counter() - t0
    print(
        "SCALEWORKER "
        + json.dumps(
            {"cpus": cpus, "secs": round(secs, 3), "occ": n_occ, "tri": n_tri}
        )
    )
    spark.stop()


def _run_scaling(sf: float) -> dict:
    """Run the same job at local[8] and local[32]; efficiency per north rule."""
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scale-worker", str(cpus)],
            capture_output=True,
            text=True,
            env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
            timeout=3600,
        )
        for line in out.stdout.splitlines():
            if line.startswith("SCALEWORKER "):
                results[cpus] = json.loads(line[len("SCALEWORKER "):])
        if cpus not in results:
            raise RuntimeError(f"scale worker {cpus} failed: {out.stderr[-2000:]}")
    n_pages = _n_pages(sf)
    tp8 = n_pages / results[8]["secs"]
    tp32 = n_pages / results[32]["secs"]
    eff = (tp32 / tp8) / 4.0
    return {
        "docs_per_sec_local8": round(tp8, 1),
        "docs_per_sec_local32": round(tp32, 1),
        "scaling_efficiency_8_to_32": round(eff, 3),
        "secs_local8": results[8]["secs"],
        "secs_local32": results[32]["secs"],
    }


def _write_baseline_md(sf: float, timings: dict, scaling: dict, n_pages: int):
    os.makedirs("BENCH", exist_ok=True)
    lines = [
        "# BENCH/BASELINE.md — measured numbers",
        "",
        f"Input: deterministic synthetic pages table, sf={sf}, {n_pages} pages",
        f"(generator: `nativeextractor_spark.datagen.generate_pages_df`, seed 42).",
        "",
        "## Headline timings (local[{}])".format(CPUS),
        "",
        "| query | sec |",
        "| --- | --- |",
    ]
    for k, v in timings.items():
        lines.append(f"| {k} | {v} |")
    lines += [
        "",
        "## Scaling (north rule: throughput efficiency >= 0.8 from N to 4N)",
        "",
        "Same extraction+triples job, same input, local[8] vs local[32]:",
        "",
        f"- docs/sec @ local[8]:  {scaling['docs_per_sec_local8']}",
        f"- docs/sec @ local[32]: {scaling['docs_per_sec_local32']}",
        f"- efficiency (tp32/tp8)/4: **{scaling['scaling_efficiency_8_to_32']}**",
        "",
        "Sandbox evidence per driver instruction (no real cluster available).",
    ]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--scale-worker":
        _scale_worker(int(sys.argv[2]))
        return
    sf = _sf()
    spark = _mk_spark()
    t0 = time.perf_counter()
    timings = _headline(spark, sf)
    total = round(time.perf_counter() - t0, 3)
    n_pages = _n_pages(sf)
    result = {
        "metric": "kg_pipeline_headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_pages": n_pages,
        "docs_per_sec_extract": round(n_pages / timings["occurrences"], 1),
        "cpus": CPUS,
    }
    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        spark.stop()
        scaling = _run_scaling(sf)
        result.update(scaling)
        _write_baseline_md(sf, timings, scaling, n_pages)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
