"""Reference-dialect SQL string shim (plans/refsql.py vs
sqlselect/osmselect.go:109-143, functions.go, sql.y)."""

import pytest

from osmquadtree_depreceated_spark.plans.refsql import (
    ref_sql,
    rewrite_ref_sql,
)


def test_pgcast_strip_numeric_only():
    assert rewrite_ref_sql("select 5::integer, 2.5::float from t") == \
        "select 5, 2.5 from t"
    # non-numeric :: untouched (the reference lexer only strips on
    # number tokens)
    assert "name::text" in rewrite_ref_sql("select name::text from t")


def test_union_means_union_all():
    got = rewrite_ref_sql("select a from t union select a from u")
    assert got == "select a from t union all select a from u"
    # already-ALL stays single
    got2 = rewrite_ref_sql("select a from t union all select a from u")
    assert got2.count("union all") == 1
    # 'union' inside a string literal is untouched
    got3 = rewrite_ref_sql("select 'union' as u from t")
    assert got3 == "select 'union' as u from t"


def test_like_prefix_kept_other_shapes_false():
    keep = rewrite_ref_sql("select * from t where name like 'ab%'")
    assert "like 'ab%'" in keep
    dead = rewrite_ref_sql("select * from t where name like '%ab'")
    assert "(false and (name) is not null)" in dead
    dead2 = rewrite_ref_sql("select * from t where f(x, 1) like 'a_b'")
    assert "(false and (f(x, 1)) is not null)" in dead2
    # underscore makes even a trailing-% pattern non-prefix
    dead3 = rewrite_ref_sql("select * from t where name like 'a_b%'")
    assert "false" in dead3


def test_macro_expansion_nested():
    got = rewrite_ref_sql("select makeinteger(substr(name, 2, 3)) from t")
    assert "try_cast" in got and "substring((name)" in got
    assert "makeinteger" not in got and "substr(" not in got.replace(
        "substring(", "")


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
select osm_id, makeinteger(substr(name, 2, 3)) as nm_num,
       makefloat(highway) as hw_f,
       numchar(name, 'n') as n_n,
       substr(name, 0, 2) as c0
from planet_osm_line
where name like 'n%' and 7::integer = 7
union
select osm_id, makeinteger(substr(name, 2, 3)) as nm_num,
       makefloat(highway) as hw_f,
       numchar(name, 'n') as n_n,
       substr(name, 0, 2) as c0
from planet_osm_line
where name like '%way'
""").collect()
    rows = sorted((r.osm_id, r.nm_num, r.hw_f, r.n_n, r.c0) for r in out)
    # branch 2 is constant-false (non-prefix LIKE); branch 1 keeps n1/n24
    assert rows == [(1, 1, 0.0, 1, "n"), (3, 24, 0.0, 1, "n")]


def test_ref_sql_union_all_duplicates(spark):
    spark.createDataFrame([(1,)], ["a"]).createOrReplaceTempView("t_u")
    got = ref_sql(
        spark, "select a from t_u union select a from t_u"
    ).collect()
    assert len(got) == 2  # reference UNION never dedups
