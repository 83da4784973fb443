"""Reference SQL-surface compatibility (SURVEY.md §2.8).

The reference's query layer (/root/reference/sqlselect/) is a strict subset
of Spark SQL — SELECT / WHERE / ORDER BY / JOIN USING / UNION ALL / VALUES /
CASE / IN / BETWEEN — so `spark.sql` covers it natively once the geometry
tables are registered with the reference's virtual columns
(packeddatastore.go:351-378): osm_id, z_order, way_area, quadtree, and tag
keys resolved as columns.

The quirks that differ from standard SQL are provided as explicit Column
builders so fixture queries can reproduce reference behavior:
  * LIKE is PREFIX-ONLY ('abc%' -> startswith; anything else false)
    (sqlselect/functions.go:309-314)
  * substr's from=0 is treated as 1 with count-1; out-of-range -> NULL
    (functions.go:137-165)
  * makeinteger/makefloat parse-or-0 (functions.go:95-123)
  * UNION means UNION ALL (no dedup) (sql.y:112-119, tables.go:53-74)
  * reference's strreplace is dead code (functions.go:44 bug) — we expose
    the documented-correct replace and record the divergence (FIXTURES.md §3)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def ref_like(col, pattern: str) -> Column:
    """Reference likeOp (functions.go:309-314), EXACTLY: a pattern ending
    in '%' is a LITERAL-prefix match on pattern[:-1] ('%' and '_' have no
    wildcard meaning anywhere — 'a_b%' matches names starting with the
    three literal chars 'a_b'); any pattern not ending in '%' is constant
    false.  NULL input compares false (the reference's typed compare
    falls through), hence the coalesce."""
    c = F.col(col) if isinstance(col, str) else col
    if pattern.endswith("%"):
        return F.coalesce(c.startswith(pattern[:-1]), F.lit(False))
    return F.lit(False)


def ref_substr_bytes(col, frm: int, count: int | None = None) -> Column:
    """Reference substrFunc (functions.go:137-165) at BYTE parity: the
    reference slices the raw Go byte string (``strs[fri-1:fri+toi-1]``)
    with bounds checked against ``len(strs)`` — BYTES, not characters.
    Returns the sliced bytes as ``binary`` (NULL on the reference's
    out-of-range conditions), so gates can compare the exact bytes even
    when a slice splits a UTF-8 codepoint."""
    if count is None:
        return F.lit(None).cast("binary")
    c = F.col(col) if isinstance(col, str) else col
    if frm == 0:
        frm, count = 1, count - 1
    ln = F.octet_length(c)
    in_range = (
        (F.lit(frm) >= 1) & (F.lit(frm) <= ln)
        & (F.lit(count) >= 1) & (F.lit(frm + count - 1) <= ln)
    )
    sliced = F.substring(F.encode(c, "UTF-8"), frm, count)
    return F.when(in_range, sliced).otherwise(F.lit(None).cast("binary"))


def ref_substr(col, frm: int, count: int | None = None) -> Column:
    """Reference substrFunc (functions.go:137-165), EXACTLY: THREE-arg
    only (any other arity returns NULL); from=0 acts as from=1 with
    count-1; bounds are BYTE offsets (Go ``len``/slicing): NULL unless
    1 <= from' <= octet_len(s), count' >= 1 and
    from' + count' - 1 <= octet_len(s).  The byte slice is returned as a
    string; a slice that splits a multibyte codepoint is sanitized with
    ``make_valid_utf8`` (U+FFFD substitution, identical to Python's
    ``errors='replace'`` — probed) where the reference keeps the raw
    invalid bytes Spark strings cannot hold (FIXTURES.md §3); use
    ``ref_substr_bytes`` for exact-byte comparisons."""
    if count is None:
        return F.lit(None).cast("string")
    raw = ref_substr_bytes(col, frm, count)
    return F.make_valid_utf8(raw.cast("string"))


def make_integer(col: str) -> Column:
    """parse-or-0 (functions.go:95-108).  Takes a column name / SQL
    fragment.  makeNumVal cuts the RUNTIME VALUE at '::' before parsing
    (osmselect.go:109-116) — makeinteger('5::int') is 5 even when the
    '::' arrives in the data — hence the split_part."""
    return F.expr(
        f"coalesce(try_cast(split_part(cast(({col}) as string), '::', 1) "
        f"as bigint), 0)"
    )


def make_float(col: str) -> Column:
    """parse-or-0 with the same runtime '::' strip (osmselect.go:130-143)."""
    return F.expr(
        f"coalesce(try_cast(split_part(cast(({col}) as string), '::', 1) "
        f"as double), 0.0)"
    )


def ref_charlength(col) -> Column:
    """Reference charlengthFunc (functions.go:125-133), exposed in the
    dialect as both ``char_length`` and ``length`` (functions.go:401):
    Go ``len(s)`` = BYTE length, and any non-STRING input — including
    NULL — returns 0, not NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.octet_length(c), F.lit(0)).cast("long")


def numchar(col, ch: str) -> Column:
    """Count non-overlapping occurrences of `ch` (functions.go:52-67,
    strings.Count).  Counted via byte lengths (occurrence count is the
    same in bytes or characters for valid UTF-8 needles).  An EMPTY
    needle is Go strings.Count's degenerate case: rune count + 1."""
    c = F.col(col) if isinstance(col, str) else col
    if not ch:
        return (F.length(c) + F.lit(1)).cast("long")
    return (
        (F.octet_length(c) - F.octet_length(F.replace(c, F.lit(ch), F.lit(""))))
        / F.lit(len(ch.encode("utf-8")))
    ).cast("long")


def maxwidth(col, sep: str = "\n") -> Column:
    """Longest split-segment BYTE length (functions.go:69-93 measures
    segments with Go ``len``).  The reference accepts a custom separator
    as the optional second argument and returns NULL for an empty
    separator (functions.go:76-83); the separator is split LITERALLY
    (strings.Split), hence the re.escape before Spark's regex split."""
    import re as _re

    c = F.col(col) if isinstance(col, str) else col
    if not sep:
        return F.lit(None).cast("long")
    return F.array_max(
        F.transform(F.split(c, _re.escape(sep)), lambda s: F.octet_length(s))
    )


def register_geometry_views(spark, points: DataFrame | None = None,
                            lines: DataFrame | None = None,
                            polygons: DataFrame | None = None,
                            tag_keys=("highway", "name", "building",
                                      "natural", "boundary")) -> None:
    """Register planet_osm_point / _line / _polygon temp views with the
    reference's virtual-column surface: osm_id, z_order, way_area, quadtree,
    plus tag keys as columns (tags map -> element_at)."""
    for name, df in (("planet_osm_point", points), ("planet_osm_line", lines),
                     ("planet_osm_polygon", polygons)):
        if df is None:
            continue
        # osm_id sign-decode (packeddatastore.go:354-359): the reference
        # packs the element type into the id's top bits and NEGATES the
        # serving id when they decode to relation (id>>59 == 2) — so
        # `osm_id < 0` means "assembled relation geometry" to every
        # downstream consumer.  Here the origin is an explicit `kind`
        # column (with a plain `id`); way/node-only tables keep their
        # natural id column.
        if "kind" in df.columns and "id" in df.columns:
            cols = [
                F.when(F.col("kind") == "relation", -F.col("id"))
                .otherwise(F.col("id")).alias("osm_id"),
            ]
        elif "way_id" in df.columns:
            cols = [F.col("way_id").alias("osm_id")]
        else:
            cols = [F.col("node_id").alias("osm_id")]
        if "z_order" in df.columns:
            cols.append(F.col("z_order"))
        if "way_area" in df.columns:
            cols.append(F.col("way_area"))
        if "cell" in df.columns:
            cols.append(F.col("cell").alias("quadtree"))
        # the reference exposes the geometry blob as column `way`
        # (packeddatastore.go:361-362); here it is the WKB blob the
        # caller attached (functions/wkb.py) — same name, same role
        if "way" in df.columns:
            cols.append(F.col("way"))
        for k in tag_keys:
            cols.append(F.expr(f"element_at(tags, '{k}')").alias(k))
        df.select(*cols).createOrReplaceTempView(name)
