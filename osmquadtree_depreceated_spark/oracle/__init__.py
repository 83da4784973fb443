"""Programmatic SQL generation.

`sqlgen` emits semantically-identical expression strings for two dialects —
Spark SQL (consumed by the engine's native Column builders through F.expr,
so the hot path stays inside whole-stage codegen) and DuckDB SQL (consumed
by the driver's side-by-side correctness oracle).  `duck_calc` additionally
unrolls the buffered quadtree recursion into an 18-level CTE chain so even
the non-closed-form algorithm has a true independent oracle.
"""

from .sqlgen import SPARK, DUCK, point_cell_sql, common_finish_sql  # noqa: F401
