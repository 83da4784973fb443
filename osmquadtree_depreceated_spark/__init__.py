"""osmquadtree_depreceated_spark — a from-scratch PySpark-native quadtree tiling
and spatial-join engine with the capabilities of the `osmquadtree` reference
(jharris2268/osmquadtree-depreceated, read-only at /root/reference).

Architecture (Spark-first, NOT a port):
  * qtcore/     pure-NumPy quadtree cell algebra (the golden math) + a literal
                scalar oracle used only by tests.
  * functions/  Spark Column expression builders: native closed-form point-cell
                keys (whole-stage-codegen, zero Python in the hot path), the
                distributed Common-ancestor aggregate as min/max + bit math,
                text analysis, similarity hashing.
  * sources/    docs(doc_id, spans) codec + deterministic synthetic generators;
                TPC-H-derived spatial table synthesis used by the driver gate.
  * operators/  calcqts pipeline, tile grouping, spatial joins (bbox, pnpoly,
                kNN), geometry construction, dedup, ANN, incremental update.
  * plans/      lineage + snapshot/resume bookkeeping (Parquet-backed locally,
                Iceberg-shaped API for production).
  * oracle/     programmatic DuckDB SQL generators mirroring every operator so
                the driver's side-by-side correctness gate has a true oracle.
"""

__version__ = "0.1.0"
