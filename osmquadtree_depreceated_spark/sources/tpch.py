"""Deterministic spatial synthesis over the driver's TPC-H-ish tables.

The driver's correctness gate runs each engine query against a DuckDB oracle
over the same parquet tables, so the synthetic spatial layer (nodes / way
node-refs / relations) is defined ONCE as dialect-neutral SQL (pure integer
arithmetic + CASE — parses identically in Spark SQL and DuckDB) and
registered as temp views on the Spark side / prepended as CTEs on the oracle
side.  Every coordinate is fixed-point int64 (1e-7 degrees) in the domain
lon ∈ [-1°, 1°], lat ∈ [50°, 52°] per FIXTURES.md, with a 3-city hotspot
skew (30% of nodes inside ~0.02°-radius clusters) to exercise depth-18 cell
skew and the salted aggregation path.
"""

from __future__ import annotations

BASE_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# nodes: one per part row; 30% in 3 city hotspots (~±0.02°), rest uniform.
NODES_SQL = """
select
  p_partkey as node_id,
  case when p_partkey % 10 < 3 then
    (case when p_partkey % 3 = 0 then -5000000
          when p_partkey % 3 = 1 then 3000000
          else 8000000 end)
      + ((p_partkey * 1103515245) % 400001) - 200000
  else ((p_partkey * 48271) % 20000001) - 10000000 end as lon,
  case when p_partkey % 10 < 3 then
    (case when p_partkey % 3 = 0 then 505000000
          when p_partkey % 3 = 1 then 515000000
          else 511000000 end)
      + ((p_partkey * 69069) % 400001) - 200000
  else (500000000 + ((p_partkey * 69621) % 20000001)) end as lat
from part
"""

# way node-refs: each order is a way whose member nodes are its lineitems'
# parts in linenumber order (the natural parent-child shape of the
# reference's way->node refs, elements/elements.go:156-160).
WAY_REFS_SQL = """
select
  l_orderkey as way_id,
  cast(l_linenumber as bigint) as pos,
  l_partkey as ref
from lineitem
"""

# relations: each customer is a relation whose members are its orders (ways).
RELS_SQL = """
select
  o_custkey as rel_id,
  o_orderkey as member_way
from orders
"""

# documents augmented with planted duplicates for the dedup operators:
#   +1000000: near-duplicate (80%-prefix copy) for every 5th doc
#   +2000000: exact duplicate for every 7th doc
DOCS_AUG_SQL = """
select doc_id, text, lang, source, n_chars from documents
union all
select doc_id + 1000000 as doc_id,
       substr(text, 1, cast(floor(n_chars * 4.0 / 5.0) as int)) as text,
       lang, source,
       cast(floor(n_chars * 4.0 / 5.0) as int) as n_chars
from documents where doc_id % 5 = 0
union all
select doc_id + 2000000 as doc_id, text, lang, source, n_chars
from documents where doc_id % 7 = 0
"""

_SYNTH = {
    "nodes": NODES_SQL,
    "way_refs": WAY_REFS_SQL,
    "rels": RELS_SQL,
    "docs_aug": DOCS_AUG_SQL,
}


def load_base_tables(spark, sf_dir: str, tables=None):
    """Register the driver parquet tables as temp views; returns dict of
    DataFrames.  Scans are plain `spark.read.parquet` so Catalyst handles
    pushdown/pruning; at production scale these would be Iceberg tables
    partitioned on the cell key (SURVEY.md §4)."""
    out = {}
    for t in tables or BASE_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.createOrReplaceTempView(t)
        out[t] = df
    return out


def register_synth_views(spark):
    """Create the synthesized spatial views on the Spark side (base views
    must already be registered)."""
    out = {}
    for name, sql in _SYNTH.items():
        df = spark.sql(sql)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def synth_cte_prefix(*names: str) -> str:
    """CTE prefix defining the requested synthesized views for the DuckDB
    oracle (base views are pre-registered by the driver)."""
    use = names or tuple(_SYNTH)
    parts = [f"{n} as ({_SYNTH[n]})" for n in use]
    return "with " + ",\n".join(parts)
