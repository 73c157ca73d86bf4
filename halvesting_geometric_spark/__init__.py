"""halvesting_geometric_spark — a from-scratch PySpark-native link-graph
analytics engine with the query/data-processing capabilities of the reference
repo ``Madjakul/HALvesting-Geometric`` (read-only at ``/root/reference``).

The reference defines *what* is computed (data model, extraction →
entity-resolution → edge-table dataflow, gather/scatter message passing, and
output-equality criteria); this package re-expresses it Spark-first:
DataFrame/Catalyst plans, Arrow-vectorized pandas UDFs only where built-in
operators genuinely cannot express the semantics, explicit partition/skew
handling, and per-iteration checkpoint + lineage tables for resumability.

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, shuffle-partition tuning)
- ``schemas``    StructType constants for transcripts/vertices/edges/metrics
- ``datagen``    deterministic seeded synthetic transcripts (FIXTURES.md §1)
- ``sources``    table IO — parquet-backed catalog with an Iceberg gate
- ``operators``  extraction, id assignment, graph core, PageRank, connected
                 components (large-star/small-star), label propagation,
                 triangle counting, dedup, similarity, text stats
- ``functions``  reusable column expressions (marker extraction, hashing)
- ``plans``      checkpoint/lineage/metrics manager, superstep driver loop
- ``streaming``  incremental edge ingestion (Trigger.AvailableNow)
"""

__version__ = "0.1.0"
