"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "docs_per_sec": ..., ...}

Modes:
  python bench.py                  # headline suite (driver per-round mode)
  SPARK_GRAFT_SCALING=1 python bench.py
      # additionally runs the mining→triples job on an emulated cluster of
      # 1 executor (8 pinned cores) vs 4 executors (4×8 disjoint pinned
      # cores, disjoint input shards, concurrent) and reports N→4N scaling
      # efficiency (the sandbox evidence for the north rule), updating
      # BENCH/BASELINE.md
  python bench.py --scale-worker SHARD N_SHARDS  # internal: one executor
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


def _scale_pages_path() -> str:
    return "/tmp/ne_bench_pages_scaling.parquet"


SCALE_N_PAGES = 400_000
SCALE_FILES = 96


def _ensure_pages(spark, sf: float) -> str:
    path = _pages_path(sf)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from nativeextractor_spark.datagen import generate_pages_df

        # many small files: the local-mode analogue of a 100 TB table's
        # plentiful input splits — both parallelism levels get enough tasks
        n_files = max(min(_n_pages(sf) // 100, 512), 8)
        generate_pages_df(spark, n_pages=_n_pages(sf)).repartition(
            n_files
        ).write.mode("overwrite").parquet(path)
    return path


def _ensure_scale_pages(spark) -> str:
    path = _scale_pages_path()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from nativeextractor_spark.datagen import generate_pages_df

        generate_pages_df(spark, n_pages=SCALE_N_PAGES).repartition(
            SCALE_FILES
        ).write.mode("overwrite").parquet(path)
    return path


def _mk_spark(master: str | None = None, cpus: int | None = None):
    from nativeextractor_spark.session import get_spark

    c = cpus or CPUS
    return get_spark(
        "nativeextractor-bench",
        master=master or f"local[{c}]",
        shuffle_partitions=max(c, 8),
        extra_conf={
            # small-data stand-in for a 100 TB table's plentiful 128 MB
            # splits: split fine enough that every slot gets many task waves
            # (tail latency of 1-wave-per-slot dominates otherwise)
            "spark.sql.files.maxPartitionBytes": "131072",
            "spark.sql.files.openCostInBytes": "65536",
        },
    )


def _warm_workers(spark, cpus: int) -> None:
    """Start every Python worker and build the per-process unicode tables
    before timing (a real cluster amortizes this over hours of work)."""
    import pandas as pd

    def k(batches):
        from nativeextractor_spark.functions.unicode import class_mask
        from nativeextractor_spark.kg.pipeline import default_kg_miners

        class_mask("delim")
        # compile every default miner + build its lookup tables in this
        # worker process (first-batch cost a long-lived executor pays once)
        for m in default_kg_miners():
            list(m.find("warm a@b.cd http://x.io 2020-01-02 spark"))
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    spark.range(cpus * 4, numPartitions=cpus * 4).mapInPandas(
        k, schema="n long"
    ).count()
    # JIT-warm the JVM shuffle/exchange/sort/agg codegen paths too: the
    # first shuffle-heavy row otherwise pays one-time compilation that a
    # long-lived cluster executor amortizes over hours (measured: the
    # dedup row runs ~2x its warm floor when it is the session's first
    # big exchange). A small range-based groupBy+join exercises exchange
    # write/read, hash agg, and broadcast paths in ~2 s.
    from pyspark.sql import functions as F

    a = spark.range(200_000).select(
        (F.col("id") % 1000).alias("k"), F.xxhash64("id").alias("v")
    )
    b = a.groupBy("k").agg(F.count("*").alias("c"), F.min("v").alias("m"))
    a.join(b, "k").where(F.col("v") == F.col("m")).count()


def _force(df) -> None:
    """Materialize EVERY output column via a noop datasource write.

    The r4 bench timed `.count()`, and Catalyst rightly prunes computed
    columns a count does not need: for projection-shaped operators whose
    cost lives in their output expressions (gopher repetition metrics,
    line dedup's rebuilt text, simhash bits, span stats), count() measured
    only the surviving cardinality skeleton — exposed by the r5 sf1 run,
    where those rows timed the SAME at 10x the data. The noop write runs
    the full plan, all columns, no sink cost — what a real downstream
    consumer pays."""
    df.write.format("noop").mode("overwrite").save()


def _headline(
    spark, sf: float
) -> tuple[dict[str, float], dict[str, float], list[str], dict]:
    """The headline suite; returns (steady-state seconds, cold first-run
    seconds, single-pass row names, extra JSON fields) per query. Every row is forced with
    :func:`_force` (full materialization — r5 methodology fix). Rows in
    the single-pass list report their COLD first run as the steady
    number (they crossed the 30 s threshold — see timed()); consumers
    comparing rows across that boundary need the marker (ADVICE r5)."""
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
    cold: dict[str, float] = {}
    single_pass: list[str] = []
    extra: dict = {}

    def timed(name, fn):
        # steady-state measurement: run twice, report the min (first
        # executions pay one-time Janino codegen + JIT + page-cache fills
        # that a long-lived cluster amortizes — measured ~2x on the
        # shuffle-heavy rows); the cold first-run numbers ride along in
        # the JSON under queries_cold for anyone who wants them. Rows
        # slower than 30 s report the single run: at that size the
        # one-time costs are a negligible fraction of the row (measured
        # <15% on the long rows vs ~2x on sub-10s ones), and the second
        # pass would only bloat the suite's wall clock
        # release the previous rows' dereferenced localCheckpoint blocks
        # BEFORE timing: ContextCleaner frees them only after a GC notices
        # the weak refs, and letting that happen mid-row both inflates the
        # row and (r7, sf1) accumulated enough pinned heap to OOM the tail
        # of the suite
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn()
        c = round(time.perf_counter() - t0, 3)
        cold[name] = c
        if c > 30:
            # single-pass: the cold run IS the published number for this
            # row — recorded in queries_single_pass so JSON consumers
            # never compare it 1:1 against a min-of-2 row (ADVICE r5)
            timings[name] = c
            single_pass.append(name)
            return
        t0 = time.perf_counter()
        fn()
        w = round(time.perf_counter() - t0, 3)
        timings[name] = min(c, w)

    timed("occurrences", lambda: _force(extract_occurrences(pages, miners)))
    # time the triples extraction UNPERSISTED (a persisted df's second
    # count would just read the cache), then persist+fill untimed: the
    # downstream stages consume triples without re-mining (a real
    # pipeline materializes this stage — see StageCheckpoint)
    plain_triples = extract_triples(pages, miners)
    timed("triples", lambda: _force(plain_triples))
    triples = extract_triples(pages, miners).persist()
    triples.count()
    timed("triple_weights", lambda: _force(weight_triples(triples)))
    surfaces = (
        triples.where(F.col("subj_type") == "NER")
        .select(F.col("subj").alias("surface"))
        .unionByName(
            triples.where(F.col("obj_type") == "NER")
            .select(F.col("obj").alias("surface"))
        )
        # narrow-merge the 2x500 tiny cached partitions before the distinct's
        # map side: same plan shape at scale, without paying ~1000 task
        # launches per pass over a 50k-page cache
        .coalesce(4 * CPUS)
        .distinct()
    )
    timed("canonicalize", lambda: _force(canonicalize_surfaces(surfaces)))
    # the KG stages are done with the cached triples — release the storage
    # memory before the dedup/curation queries contend for heap
    triples.unpersist()
    timed(
        "dedup_lsh_pages",
        lambda: _force(lsh_duplicate_pairs(
            pages.select(F.col("url").alias("doc_id"), "text"),
            num_hashes=4,
            k=3,
            hash_flavor="xx64",
            shingle="word_hash",  # r3 scale flavor: token-hash shingles,
            # no per-shingle string building (7-8x the string flavor)
        )),
    )
    # star-glob scan over the pages table: the r3 fast_star engine (attempt
    # outcomes via C regex calls, guard/leak state closed-form) — 5.3x the
    # naive machine walk, ~2x the r2 prefiltered exact engine, at parity
    # with the (unfaithful) plain-finditer ceiling
    from nativeextractor_spark.miners import GlobMiner

    timed(
        "glob_star_pages",
        lambda: _force(extract_occurrences(pages, [GlobMiner("s*k")])),
    )
    # star-first glob (r4 fast_star_first engine: token-start anchored
    # candidates, one C regex call each — 3.5-4x the naive machine walk)
    timed(
        "glob_star_first_pages",
        lambda: _force(extract_occurrences(pages, [GlobMiner("*k")])),
    )
    # multi-star trailing glob (r5 fast_multi_star engine: the reference's
    # '*i*k*' golden class — no-leak failure closed forms, one C regex
    # call per anchored candidate, measured 3.5-4.4x the naive walk)
    timed(
        "glob_multi_star_pages",
        lambda: _force(extract_occurrences(pages, [GlobMiner("*i*k*")])),
    )
    # simhash over the full pages table: JVM zero-shuffle projection engine
    # (r3; the r2 Python-md5 kernel measures ~0.9 s here but pays the Arrow
    # text transfer into Python workers the JVM engine avoids at scale)
    from nativeextractor_spark.textops import simhash

    timed(
        "simhash_pages",
        lambda: _force(simhash(
            pages.select(F.col("url").alias("doc_id"), "text"),
            token_hash="xx64",
            engine="project",
        )),
    )
    # corpus-curation ops over a lines-ified view of the full sf pages
    # table (5-token lines; pages carry no newlines natively)
    from nativeextractor_spark.textops import (
        drop_duplicate_lines,
        gopher_repetition,
    )

    lines_df = pages.select(
        F.col("url").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(1, greatest(cast(ceil(size(split(text, ' ')) / 5.0) as int), 1)),"
            " i -> array_join(slice(split(text, ' '), (i-1)*5+1, 5), ' ')), chr(10))"
        ).alias("text"),
    ).localCheckpoint(eager=True)
    timed("gopher_repetition", lambda: _force(gopher_repetition(lines_df)))
    # the faithful span-union flavor (r4): one token-offset window + fold
    # interval merge, dup merge filtered to n>=5 — measured at parity
    # with the count flavor
    timed(
        "gopher_repetition_span",
        lambda: _force(gopher_repetition(
            lines_df, dup_flavor="span", assume_unique=True
        )),
    )
    timed("line_dedup", lambda: _force(drop_duplicate_lines(lines_df)))
    # END-TO-END curation pipeline (r5 headline row): Gopher quality +
    # faithful span-repetition filters -> exact dedup -> corpus-wide line
    # dedup -> LSH near dedup -> PII redaction, production flavors
    # (xx64/word_hash, hash line keys) over the lines-ified corpus
    from nativeextractor_spark.textops.pipeline import curate_corpus

    def run_curate():
        out, metrics = curate_corpus(lines_df, id_col="doc_id")
        return metrics["n_output"]

    timed("curate_corpus", run_curate)

    # r7 (VERDICT #4): the FULL Lee-et-al-style stack with ExactSubstr
    # span dedup ON between line and near dedup — new row, so the suite
    # total is not 1:1 comparable with r6's without excluding it; the
    # per-stage metrics of the last run ride in the bench JSON under
    # curate_span_stage_metrics
    def run_curate_span():
        out, metrics = curate_corpus(
            lines_df, id_col="doc_id", span_dedup=True
        )
        extra["curate_span_stage_metrics"] = dict(metrics)
        return metrics["n_output"]

    timed("curate_corpus_span", run_curate_span)
    # planted-skew LSH (r5): 10% of docs share one 200-token shingle
    # prefix -> one oversized LSH bucket per band; the max_bucket cap must
    # keep the self-join bounded instead of quadratic (~12.5M pairs at
    # 50k pages)
    hot_prefix = (
        "array_join(transform(sequence(1, 200), i -> concat('hot', i)), ' ')"
    )
    skew_df = pages.select(
        F.col("url").alias("doc_id"),
        F.when(
            F.xxhash64("url") % 10 == 0,
            F.expr(
                f"concat({hot_prefix}, ' ', array_join(slice(split(text, ' '), 1, 5), ' '))"
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).localCheckpoint(eager=True)
    timed(
        "skew_lsh_capped",
        lambda: _force(lsh_duplicate_pairs(
            skew_df,
            num_hashes=8,
            k=3,
            max_bucket=200,
            hash_flavor="xx64",
            shingle="word_hash",
        )),
    )
    # ExactSubstr-style duplicate-span stats (r4): corpus-wide 8-token
    # gram counts on 8-byte keys, dup-only join build side
    from nativeextractor_spark.textops.spans import duplicate_span_stats

    timed(
        "dup_span_stats",
        lambda: _force(duplicate_span_stats(
            pages.select(F.col("url").alias("doc_id"), "text"),
            n_tokens=8,
            assume_unique=True,
        )),
    )
    # these two read the driver-provided sf tables; a synthetic-pages-only
    # sf dir (the sf1 scale-up run uses one) skips them rather than fail
    if os.path.exists(os.path.join(SF_DIR, "lineitem.parquet")):
        timed("tpch_q1", lambda: _force(QUERIES["tpch_q1"](spark, SF_DIR)))
    if os.path.exists(os.path.join(SF_DIR, "embeddings.parquet")):
        timed("ann_topk", lambda: _force(QUERIES["ann_topk"](spark, SF_DIR)))
    # regex parity engine over the corpus: the vectorized DFA executor
    # (NumPy batch gathers; 30x the r1 per-char scalar loop) — the two
    # reference regexes from tests/regex_miner.c
    from nativeextractor_spark.miners.regex_dfa import DfaMiner

    dfa_miners = [
        DfaMiner("EMAIL", r"[^@ \t\r\n]+@[^@ \t\r\n]+\.[^@ \t\r\n]+"),
        DfaMiner("TEL_NO", r"[+]?[(]?[0-9]{3}[)]?[-\s.]?[0-9]{3}[-\s.]?[0-9]{4,6}"),
    ]
    timed(
        "regex_dfa_mine",
        lambda: _force(extract_occurrences(pages, dfa_miners)),
    )
    return timings, cold, single_pass, extra


def _drain_python_workers(timeout_s: int = 180) -> None:
    """Block until no pyspark.daemon worker processes remain (or timeout).

    A stopped SparkSession's straggler tasks can keep their Python
    workers alive for minutes; any timing measurement started meanwhile
    (the scaling pairs) runs against a contended box."""
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        r = subprocess.run(
            ["pgrep", "-f", "pyspark.daemon"], capture_output=True
        )
        if r.returncode != 0:
            return
        time.sleep(2)


def _has_taskset() -> bool:
    import shutil

    return shutil.which("taskset") is not None


EXECUTOR_CORES = 8


def _scale_worker(shard: int, n_shards: int, cores: int = EXECUTOR_CORES,
                  n_files: int = 0) -> None:
    """One *executor* of the scaling measurement: an independent Spark
    process on EXECUTOR_CORES cores (the caller pins it with taskset),
    running the mining→triples job over its shard of the input files.

    n_shards=1 is the size-N cluster (one executor, whole input);
    n_shards=4 runs four of these concurrently on disjoint core sets over
    disjoint file shards — the 4N-executor cluster. Per-executor config is
    identical, exactly like adding executors to a real cluster.
    """
    import glob as globmod

    from pyspark.sql import SparkSession

    from nativeextractor_spark.kg.pipeline import default_kg_miners
    from nativeextractor_spark.kg.triples import extract_triples

    builder = (
        SparkSession.builder.appName(f"ne-scale-exec{shard}")
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "8m")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    pages_path = _ensure_scale_pages(spark)
    files = sorted(globmod.glob(f"{pages_path}/part-*.parquet"))
    if n_files:
        files = files[:n_files]
    shard_files = files[shard::n_shards]
    pages = spark.read.parquet(*shard_files)
    miners = default_kg_miners()
    _warm_workers(spark, cores)
    # best of 2: damps OS/VM scheduling noise (the 4N wall is a max over
    # executors, so per-executor variance directly erodes the ratio)
    secs = float("inf")
    n_tri = 0
    for _ in range(2):
        t0 = time.perf_counter()
        n_tri = extract_triples(pages, miners).count()
        secs = min(secs, time.perf_counter() - t0)
    n_docs = pages.count()
    print(
        "SCALEWORKER "
        + json.dumps(
            {"shard": shard, "n_shards": n_shards, "secs": round(secs, 3),
             "tri": n_tri, "files": len(shard_files), "docs": n_docs}
        )
    )
    spark.stop()


def _spawn_executor(shard: int, n_shards: int, cores: int, n_files: int):
    """Spawn one executor process pinned to its own disjoint core set."""
    lo = shard * cores
    pin = (
        ["taskset", "-c", f"{lo}-{lo + cores - 1}"] if _has_taskset() else []
    )
    return subprocess.Popen(
        pin
        + [
            sys.executable,
            os.path.abspath(__file__),
            "--scale-worker",
            str(shard),
            str(n_shards),
            str(cores),
            str(n_files),
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
    )


def _parse_scaleworker(stdout: str) -> dict:
    for line in stdout.splitlines():
        if line.startswith("SCALEWORKER "):
            return json.loads(line[len("SCALEWORKER "):])
    raise RuntimeError("scale worker produced no result")


def _measure_pair(cores: int, n_files: int) -> dict:
    """Efficiency of 1 executor vs 4 concurrent executors of `cores` each.

    Executors are independent pinned Spark processes over disjoint file
    shards — how executors divide a shuffle-free scan on a real cluster.
    Throughput uses per-executor measured job time (startup/warmup excluded,
    same as on the single run).
    """
    out, _ = _spawn_executor(0, 1, cores, n_files).communicate(timeout=3600)
    single = _parse_scaleworker(out)
    procs = [_spawn_executor(i, 4, cores, n_files) for i in range(4)]
    shards = [_parse_scaleworker(p.communicate(timeout=3600)[0]) for p in procs]
    secs4 = max(s["secs"] for s in shards)
    n_docs = single["docs"]
    tp1 = n_docs / single["secs"]
    tp4 = sum(s["docs"] for s in shards) / secs4
    return {
        "executor_cores": cores,
        "n_docs": n_docs,
        "docs_per_sec_N": round(tp1, 1),
        "docs_per_sec_4N": round(tp4, 1),
        "efficiency": round((tp4 / tp1) / 4.0, 3),
        "secs_N": single["secs"],
        "secs_4N": round(secs4, 3),
        "triples_N": single["tri"],
        "triples_4N_total": sum(s["tri"] for s in shards),
    }


def _hw_calibration() -> dict:
    """Hardware ceiling: per-process slowdown of a pure C-regex scan (the
    same kind of work the miners do) when 8 → 32 processes run concurrently.
    This box is virtualized; memory-path contention caps ANY scan-heavy
    job's 8→32 efficiency at 1/slowdown regardless of framework.
    """
    code = (
        "import re, time\n"
        "text = ('lorem ipsum dolor sit amet consectetur ' * 4000)\n"
        "pat = re.compile(r'[a-z]+')\n"
        "t0 = time.perf_counter()\n"
        "for _ in range(60):\n"
        "    n = sum(1 for _ in pat.finditer(text))\n"
        "print(time.perf_counter() - t0)\n"
    )

    def measure(n):
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", code], stdout=subprocess.PIPE, text=True
            )
            for _ in range(n)
        ]
        return sum(float(p.communicate()[0].strip()) for p in procs) / n

    t8, t32 = measure(8), measure(32)
    slowdown = t32 / t8
    return {
        "regex_scan_secs_8proc": round(t8, 3),
        "regex_scan_secs_32proc": round(t32, 3),
        "hw_slowdown_8_to_32": round(slowdown, 3),
        "hw_efficiency_ceiling_8_to_32": round(1.0 / slowdown, 3),
    }


def _run_scaling(sf: float) -> dict:
    """North-rule evidence, three measurements:

    - pair B (headline): N = 1×2-core executor vs 4N = 4×2-core executors
      (8 cores total at 4N — inside the box's contention-free regime);
    - pair A: N = 1×8-core executor vs 4N = 4×8-core executors (all 32
      cores at 4N — runs into the VM's memory-path ceiling);
    - hardware calibration: the same 8→32 contention measured on a pure
      C-regex scan with no Spark at all, giving the box's efficiency
      ceiling; pair A is additionally reported normalized against it.
    """
    pair_b = _measure_pair(2, 32)
    pair_a = _measure_pair(8, 0)
    hw = _hw_calibration()
    normalized_a = round(
        min(pair_a["efficiency"] / hw["hw_efficiency_ceiling_8_to_32"], 1.0), 3
    )
    return {
        "pair_small_executors": pair_b,
        "pair_large_executors": pair_a,
        "hw_calibration": hw,
        "scaling_efficiency_N_to_4N": pair_b["efficiency"],
        "pair_large_efficiency_normalized_to_hw": normalized_a,
        "docs_per_sec_N": pair_b["docs_per_sec_N"],
        "docs_per_sec_4N": pair_b["docs_per_sec_4N"],
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
        "Methodology v2 (r5): every row is forced through a noop datasource",
        "write (FULL materialization of every output column) — r4 and earlier",
        "timed `.count()`, which let Catalyst prune computed columns of",
        "projection-shaped operators (gopher metrics, line-dedup text, span",
        "stats), under-measuring those rows by up to ~7x. Steady-state",
        "min-of-2 per row; cold first runs ride along in the bench JSON.",
        "r5-vs-r4 comparisons are only valid within the same methodology.",
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
        "A cluster of size N is emulated as N independent executor processes,",
        "each its own Spark pinned (taskset) to a disjoint core set, reading a",
        "disjoint shard of the input files — how executors divide a",
        "shuffle-free scan on a real cluster. Same deterministic pages input,",
        "workers warmed before timing.",
        "",
        "### Headline pair: 1 executor vs 4 executors (2 cores each)",
        "",
        f"- docs/sec @ N:  {scaling['pair_small_executors']['docs_per_sec_N']}",
        f"- docs/sec @ 4N: {scaling['pair_small_executors']['docs_per_sec_4N']}",
        f"- efficiency (tp_4N/tp_N)/4: **{scaling['pair_small_executors']['efficiency']}**",
        "",
        "### Large-executor pair: 1 vs 4 executors (8 cores each; 4N = all 32 cores)",
        "",
        f"- docs/sec @ N:  {scaling['pair_large_executors']['docs_per_sec_N']}",
        f"- docs/sec @ 4N: {scaling['pair_large_executors']['docs_per_sec_4N']}",
        f"- raw efficiency: {scaling['pair_large_executors']['efficiency']}",
        f"- normalized to the hardware ceiling below: **{scaling['pair_large_efficiency_normalized_to_hw']}**",
        "",
        "### Hardware calibration (no Spark)",
        "",
        "A pure C-regex scan (same work class as the miners) in 8 vs 32",
        "concurrent processes on this VM slows down",
        f"{scaling['hw_calibration']['hw_slowdown_8_to_32']}× per process —",
        "the box's own memory-path ceiling for 8→32 is",
        f"{scaling['hw_calibration']['hw_efficiency_ceiling_8_to_32']} efficiency.",
        "The job scales at the hardware limit; on real multi-host executors",
        "(independent memory systems) the small-executor pair is the",
        "representative number.",
        "",
        "Sandbox evidence per driver instruction (no real cluster available).",
    ]
    # preserve hand-maintained sections below the generated block —
    # everything from the explicit marker on (fallback: the first
    # "### Run history", the pre-r6 convention; the r6 scaling-mode run
    # silently deleted the hand-added sf1/spot-check/ANN sections that
    # sat between the generated block and the history table)
    tail = ""
    try:
        with open("BENCH/BASELINE.md") as f:
            old = f.read()
        idx = old.find("<!-- hand-maintained")
        if idx == -1:
            idx = old.find("### Run history")
        if idx != -1:
            tail = "\n" + old[idx:]
    except FileNotFoundError:
        pass
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n" + tail)


def main() -> None:
    if len(sys.argv) >= 6 and sys.argv[1] == "--scale-worker":
        _scale_worker(
            int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])
        )
        return
    sf = _sf()
    if os.environ.get("SPARK_GRAFT_SCALING_ONLY") == "1":
        # pairs-only mode for chasing a clean measurement window: no
        # headline phase perturbing the box first, no BASELINE.md rewrite
        spark = _mk_spark()
        _ensure_scale_pages(spark)
        spark.stop()
        _drain_python_workers()
        print(json.dumps(_run_scaling(sf)))
        return
    # stamp the measurement window's quality into every bench JSON: the
    # quiet value of hw_slowdown_8_to_32 on this VM is ~1.14; readings
    # much above it mean co-tenant memory-bandwidth load was inflating
    # the shuffle-heavy rows while this ran (r6: identical back-to-back
    # runs swung 1.4-3x purely with this number — see BENCH/BASELINE.md)
    window_cal = _hw_calibration()
    spark = _mk_spark()
    t0 = time.perf_counter()
    timings, cold, single_pass, extra = _headline(spark, sf)
    wall = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    n_pages = _n_pages(sf)
    result = {
        "metric": "kg_pipeline_headline_total",
        "value": total,
        "unit": "sec",
        # r5: rows are forced through a noop write (FULL materialization);
        # r4-and-earlier .count() rows under-measured projection-shaped
        # operators by up to ~7x — cross-round value comparisons are only
        # valid within the same methodology (see BENCH/BASELINE.md)
        "methodology": "v2-full-materialization",
        "queries": timings,
        "queries_cold_first_run": cold,
        # rows whose steady number IS the cold single run (crossed the
        # 30 s threshold) — not 1:1 comparable with min-of-2 rows
        "queries_single_pass": sorted(single_pass),
        "wall_secs_incl_cold_runs": wall,
        "sf": sf,
        "n_pages": n_pages,
        "docs_per_sec_extract": round(n_pages / timings["occurrences"], 1),
        "cpus": CPUS,
        "window_calibration_prerun": window_cal,
    }
    result.update(extra)
    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        spark.stop()
        # spark.stop() can return while straggler tasks' Python workers
        # are still burning cores (measured: a lingering redact stage
        # wrecked the r5 pair measurement to 0.47) — drain them before
        # timing the pinned executors
        _drain_python_workers()
        scaling = _run_scaling(sf)
        result.update(scaling)
        _write_baseline_md(sf, timings, scaling, n_pages)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
