from .tpch import (  # noqa: F401
    BASE_TABLES,
    NODES_SQL,
    WAY_REFS_SQL,
    RELS_SQL,
    DOCS_AUG_SQL,
    load_base_tables,
    register_synth_views,
    synth_cte_prefix,
)
from .docs import (  # noqa: F401
    DOCS_SCHEMA,
    generate_docs,
    parse_spans,
    spans_checksum,
)
