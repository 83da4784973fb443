"""Reference-dialect SQL string shim (plans/refsql.py vs
sqlselect/osmselect.go:109-143, functions.go, sql.y)."""

import pytest
from pyspark.sql import functions as F

from osmquadtree_depreceated_spark.plans.refsql import (
    ref_sql,
    rewrite_ref_sql,
)


def test_pgcast_strip_numeric_only():
    assert rewrite_ref_sql("select 5::integer, 2.5::float from t") == \
        "select 5, 2.5 from t"
    # non-numeric :: untouched (the reference lexer only strips on
    # number tokens) — including identifiers that END in a digit
    assert "name::text" in rewrite_ref_sql("select name::text from t")
    assert "col2::int" in rewrite_ref_sql("select col2::int from t")


def test_union_means_union_all():
    got = rewrite_ref_sql("select a from t union select a from u")
    assert got == "select a from t union all select a from u"
    # already-ALL stays single
    got2 = rewrite_ref_sql("select a from t union all select a from u")
    assert got2.count("union all") == 1
    # 'union' inside a string literal is untouched
    got3 = rewrite_ref_sql("select 'union' as u from t")
    assert got3 == "select 'union' as u from t"


def test_like_is_literal_prefix_or_false():
    # trailing % -> literal-prefix startswith (null-safe false)
    got = rewrite_ref_sql("select * from t where name like 'ab%'")
    assert "startswith((name), 'ab')" in got and "like" not in got
    # '_' and embedded '%' are LITERAL characters (likeOp has no
    # wildcards): 'a_b%' is a prefix match on the 3 chars a,_,b
    got2 = rewrite_ref_sql("select * from t where name like 'a_b%'")
    assert "startswith((name), 'a_b')" in got2
    got3 = rewrite_ref_sql("select * from t where name like 'a%b%'")
    assert "startswith((name), 'a%b')" in got3
    # no trailing % -> constant false, operand still referenced
    dead = rewrite_ref_sql("select * from t where name like '%ab'")
    assert "(false and (name) is not null)" in dead
    dead2 = rewrite_ref_sql("select * from t where f(x, 1) like 'a_b'")
    assert "(false and (f(x, 1)) is not null)" in dead2
    # a prefix whose content LOOKS like a macro call must stay a literal
    # (the emitted prefix is re-masked so the macro scan never sees it)
    trap = rewrite_ref_sql("select name like 'substr(x%' as a from t")
    assert "startswith((name), 'substr(x')" in trap
    # backslashes in reference literals are RAW (altlex.go:225-238);
    # the Spark re-emission doubles them so the runtime value matches
    bs = rewrite_ref_sql("select name like 'a\\b%' as b from t")
    assert "startswith((name), 'a\\\\b')" in bs


def test_not_like():
    got = rewrite_ref_sql("select * from t where name not like 'ab%'")
    assert "(not coalesce(startswith((name), 'ab'), false))" in got
    # NOT of the constant-false shape = keep every row
    got2 = rewrite_ref_sql("select * from t where name not like '%ab'")
    assert "(not (false and (name) is not null))" in got2


def test_macro_expansion_nested():
    got = rewrite_ref_sql("select makeinteger(substr(name, 2, 3)) from t")
    assert "try_cast" in got and "substring(encode((name)" in got
    assert "makeinteger" not in got and "substr(" not in got.replace(
        "substring(", "")


def test_substr_reference_rules():
    # 3-arg expands with the overflow->NULL guard
    got = rewrite_ref_sql("select substr(name, 2, 3) from t")
    assert "+ " in got and "octet_length((name))" in got and "null" in got
    # any other arity is constant NULL (functions.go:138-141)
    got2 = rewrite_ref_sql("select substr(name, 2) from t")
    assert "cast(null as string)" in got2


def test_strreplace_is_documented_replace():
    got = rewrite_ref_sql("select strreplace(a, 'x', 'y') from t")
    assert got == "select replace((a), ('x'), ('y')) from t"


def test_unbalanced_parens_raise():
    with pytest.raises(ValueError, match="unbalanced"):
        rewrite_ref_sql("select makeinteger(substr(name, 2 from t")


def test_ref_sql_executes_quirks(spark):
    df = spark.createDataFrame(
        [(1, "n1", "motorway"), (2, "x7", None), (3, "n24", "footway")],
        ["osm_id", "name", "highway"],
    )
    df.createOrReplaceTempView("planet_osm_line")
    out = ref_sql(spark, """
select osm_id, makeinteger(substr(name, 2, 1)) as nm_num,
       substr(name, 2, 9) as over9,
       makefloat(highway) as hw_f,
       numchar(name, 'n') as n_n,
       substr(name, 0, 2) as c0
from planet_osm_line
where name like 'n%' and 7::integer = 7
union
select osm_id, makeinteger(substr(name, 2, 1)) as nm_num,
       substr(name, 2, 9) as over9,
       makefloat(highway) as hw_f,
       numchar(name, 'n') as n_n,
       substr(name, 0, 2) as c0
from planet_osm_line
where name like '%way'
""").collect()
    rows = sorted(
        (r.osm_id, r.nm_num, r.over9, r.hw_f, r.n_n, r.c0) for r in out
    )
    # branch 2 is constant-false (non-prefix LIKE); (2,9) overflows both
    # names -> NULL per substrFunc's fri+toi-1 > len rule
    assert rows == [(1, 1, None, 0.0, 1, "n"), (3, 2, None, 0.0, 1, "n")]


def test_ref_sql_not_like_null_operand(spark):
    # reference: NOT(likeOp)=true even for a NULL operand — the row with
    # name NULL must be KEPT by `not like`
    df = spark.createDataFrame(
        [(1, "ab"), (2, None), (3, "xy")], ["i", "name"]
    )
    df.createOrReplaceTempView("t_nl")
    got = {r.i for r in ref_sql(
        spark, "select i from t_nl where name not like 'ab%'"
    ).collect()}
    assert got == {2, 3}


def test_ref_sql_union_all_duplicates(spark):
    spark.createDataFrame([(1,)], ["a"]).createOrReplaceTempView("t_u")
    got = ref_sql(
        spark, "select a from t_u union select a from t_u"
    ).collect()
    assert len(got) == 2  # reference UNION never dedups


def test_ref_sql_runtime_pgcast_strip(spark):
    # makeNumVal cuts the RUNTIME VALUE at '::' (osmselect.go:109-116):
    # makeinteger over a column whose DATA contains '5::int' yields 5,
    # not 0 — the strip is not only a lexer affair
    df = spark.createDataFrame(
        [(1, "5::int"), (2, "5.5::real"), (3, "::9"), (4, "7"),
         (5, None)],
        ["i", "v"],
    )
    df.createOrReplaceTempView("t_pg")
    got = {
        r.i: (r.mi, r.mf)
        for r in ref_sql(
            spark,
            "select i, makeinteger(v) as mi, makefloat(v) as mf from t_pg",
        ).collect()
    }
    assert got == {
        1: (5, 5.0),        # '5::int' -> '5'
        2: (0, 5.5),        # '5.5' parses float, not int -> mi 0
        3: (0, 0.0),        # '::9' -> '' -> parse fail -> 0
        4: (7, 7.0),
        5: (0, 0.0),        # NULL input -> 0 (coalesce)
    }


def test_ref_sql_maxwidth_two_arg(spark):
    # maxwidthFunc (functions.go:69-92): optional custom separator,
    # split LITERALLY; empty separator -> NULL; arity > 2 -> NULL
    df = spark.createDataFrame([(1, "ab,c,dddd")], ["i", "v"])
    df.createOrReplaceTempView("t_mw")
    row = ref_sql(spark, """
select maxwidth(v, ',') as w2, maxwidth(v) as w1,
       maxwidth(v, '.') as wdot, maxwidth(v, '') as wempty,
       maxwidth(v, ',', ',') as w3
from t_mw""").collect()[0]
    assert row.w2 == 4          # 'dddd'
    assert row.w1 == 9          # no newline -> whole string
    assert row.wdot == 9        # '.' is literal, not regex any-char
    assert row.wempty is None   # empty separator -> NULL
    assert row.w3 is None       # arity 3 -> NULL


def test_way_column_can_serve_packed_blob(spark):
    # the reference's `way` value IS the packed geometry blob
    # (packeddatastore.go:361-362).  The serving views take whatever
    # `way` column the caller attaches — WKB (gate q46's choice) or the
    # byte-faithful packed blob via functions/geomblob.py.  A verbatim
    # dialect query selecting `way` then returns reference-format bytes.
    from osmquadtree_depreceated_spark.functions.geomblob import (
        pack_linestring_rows, pack_linestring_udf, unpack_blob,
    )
    from osmquadtree_depreceated_spark.plans.sqlcompat import (
        register_geometry_views,
    )

    df = spark.createDataFrame(
        [(8, [1, 2], [10, 20], [30, 40], 5, "nb")],
        "way_id long, refs array<long>, lons array<long>, "
        "lats array<long>, z_order long, name string",
    ).withColumn(
        "way",
        pack_linestring_udf()("refs", "lons", "lats",
                              F.col("z_order"), F.lit(1)),
    ).withColumn("tags", F.create_map(F.lit("name"), F.col("name")))
    register_geometry_views(spark, lines=df, tag_keys=("name",))
    [row] = ref_sql(
        spark, "select osm_id, way from planet_osm_line where "
               "name like 'n%'"
    ).collect()
    assert row.osm_id == 8
    assert bytes(row.way) == pack_linestring_rows(
        [[1, 2]], [[10, 20]], [[30, 40]], [5], [1]
    )[0]
    d = unpack_blob(bytes(row.way))
    assert d["zo"] == 5 and list(d["rings"][0][1]) == [10, 20]
