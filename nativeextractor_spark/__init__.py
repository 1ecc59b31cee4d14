"""nativeextractor_spark — a from-scratch PySpark-native KG-construction engine.

Reimplements the capabilities of SpongeData-cz/nativeextractor (a C11 streamed
entity-extraction engine, reference at /root/reference) as an idiomatic PySpark
pipeline: DataFrame/SQL plans, vectorized Arrow/pandas kernels for the miner
core (never per-row Python UDFs), broadcast dictionaries for gazetteers, and
shuffle-aware KG stages (triples, entity linking, MinHash-LSH canonicalization,
connected components, graph materialization with per-partition lineage).

This is NOT a port: the reference defines *what* is computed (miner semantics,
occurrence records, filter/sort rules — see SURVEY.md); the execution strategy
is Spark-first.
"""

__version__ = "0.1.0"
