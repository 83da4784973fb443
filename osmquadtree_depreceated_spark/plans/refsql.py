"""Reference-dialect SQL string front end.

The reference accepts SQL text through its own lexer/parser
(sqlselect/osmselect.go, sqlselect/sql.y) with three departures from
standard SQL that Spark SQL will not reproduce by itself:

  * numeric literals may carry a PostgreSQL-style ``::type`` suffix that
    the LEXER simply strips (osmselect.go:109-143 makeNumVal/makeFloatVal
    cut the value at ``::``);
  * ``LIKE`` has NO wildcards: a pattern ending in ``%`` is a
    literal-prefix match on everything before that final ``%`` (``_``
    and embedded ``%`` are ordinary characters), any other pattern is
    constant false, and NULL input compares false
    (functions.go:309-314); ``NOT LIKE`` negates that result;
  * the quirk scalar functions substr / makeinteger / makefloat /
    numchar / maxwidth / strreplace / char_length (alias length)
    (functions.go:95-165,309-414,401); substr / maxwidth / char_length
    measure and slice BYTES (Go ``len``), not characters, and
    char_length(NULL) is 0.

``rewrite_ref_sql`` turns such a query string into plain Spark SQL by
macro-expanding the quirk functions into native expressions (everything
stays inside whole-stage codegen — no UDF registration, nothing Python
at execution time) and ``ref_sql`` runs it against the registered
planet_osm_* views (plans/sqlcompat.register_geometry_views).

strreplace expands to the DOCUMENTED-correct replace: the reference's
own strreplace body is dead code that returns its input unchanged
(functions.go:44 bug) — recorded as a divergence in FIXTURES.md §3.

Limits (documented): the LIKE rewrite recognizes an identifier /
qualified-name / call / parenthesized left operand; a non-prefix pattern
behind a stranger operand shape raises rather than mis-rewriting.
"""

from __future__ import annotations

import re

# ----------------------------------------------------- string masking

_STR_RE = re.compile(r"'(?:[^']|'')*'")


def _mask_strings(sql: str) -> tuple[str, list[str]]:
    """Replace string literals with \x00<idx>\x00 placeholders so the
    rewriters never touch quoted content."""
    found: list[str] = []

    def _sub(m):
        found.append(m.group(0))
        return f"\x00{len(found) - 1}\x00"

    return _STR_RE.sub(_sub, sql), found


def _unmask(sql: str, found: list[str]) -> str:
    """Re-emit the masked literals as SPARK literals: the reference
    lexer reads quoted strings RAW (altlex.go:225-238, no escape
    processing at all), but Spark's parser treats backslash as an
    escape — so every backslash is doubled to keep the runtime value
    byte-identical to the reference's."""
    for i, s in enumerate(found):
        sql = sql.replace(f"\x00{i}\x00", s.replace("\\", "\\\\"))
    return sql


# ------------------------------------------------- call-site scanning

def _find_call(sql: str, name: str, start: int = 0):
    """First `name(args...)` at/after `start` (case-insensitive, not part
    of a longer identifier): (lo, hi, [arg, ...]) with args split at
    top-level commas, or None."""
    pat = re.compile(rf"(?<![\w.]){re.escape(name)}\s*\(", re.IGNORECASE)
    m = pat.search(sql, start)
    if not m:
        return None
    depth, i = 1, m.end()
    args, a0 = [], m.end()
    while i < len(sql) and depth:
        ch = sql[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                args.append(sql[a0:i].strip())
        elif ch == "," and depth == 1:
            args.append(sql[a0:i].strip())
            a0 = i + 1
        i += 1
    if depth:
        raise ValueError(f"unbalanced parens in {name}(...) call")
    return m.start(), i, [a for a in args if a != ""]


def _expand_all(sql: str, name: str, render) -> str:
    """Expand every `name(...)` via render(args) -> str, innermost-last
    (repeated scans until none remain)."""
    guard = 0
    while True:
        hit = _find_call(sql, name)
        if hit is None:
            return sql
        lo, hi, args = hit
        sql = sql[:lo] + render(args) + sql[hi:]
        guard += 1
        if guard > 500:
            raise ValueError(f"runaway {name} expansion")


# ------------------------------------------------------ quirk macros

def _strip_pgcast(e: str) -> str:
    """makeNumVal/makeFloatVal cut the RUNTIME VALUE at '::' before
    parsing (osmselect.go:109-116): makeinteger('5::int') is 5 even when
    the '::' arrives in the data, not the query text.  split_part returns
    the whole string when no '::' is present, and NULL for NULL."""
    return f"split_part(cast(({e}) as string), '::', 1)"


def _mi(args):
    if len(args) != 1:  # reference: arity != 1 -> NULL (functions.go:96-99)
        return "cast(null as bigint)"
    # '5.5' parses as float, not int, so makeinteger('5.5') is 0
    # (functions.go:102-107: only an INTEGER makeNumVal result survives);
    # Spark's try_cast string->bigint rejects decimals the same way
    return f"coalesce(try_cast({_strip_pgcast(args[0])} as bigint), 0)"


def _mf(args):
    if len(args) != 1:  # functions.go:111-114
        return "cast(null as double)"
    return (
        f"coalesce(try_cast({_strip_pgcast(args[0])} as double), "
        f"cast(0.0 as double))"
    )


def _nc(args):
    # strings.Count occurrence count (functions.go:52-67) — identical
    # measured in bytes or characters; byte lengths keep every macro on
    # the reference's Go-len semantics.  Empty needle is strings.Count's
    # degenerate case: RUNE count + 1 (character_length dodges the
    # length-macro rescan; its `_` prefix fails the \b lookbehind).
    s, c = args
    return (
        f"cast(case when octet_length(({c})) = 0 "
        f"then character_length(({s})) + 1 "
        f"else (octet_length(({s})) - octet_length(replace(({s}), ({c}), "
        f"''))) / octet_length(({c})) end as bigint)"
    )


def _cl(args):
    """charlengthFunc (functions.go:125-133), dialect names
    ``char_length`` AND ``length`` (functions.go:401): Go ``len(s)`` =
    BYTE length; NULL (and any non-string, which this text-level macro
    cannot detect — documented FIXTURES.md §3) returns 0, not NULL."""
    if len(args) != 1:
        return "cast(null as bigint)"
    s = args[0]
    return f"cast(coalesce(octet_length(({s})), 0) as bigint)"


def _mw(args):
    """maxwidthFunc (functions.go:69-92): arity 1 (separator '\\n') or 2
    (custom separator expression); any other arity -> NULL, and an empty
    or NULL separator -> NULL.  The separator is a LITERAL string in the
    reference (strings.Split), so the regex-split operand is \\Q..\\E
    quoted with java.util.regex.Pattern.quote's chunking — every
    embedded '\\E' is rewritten to '\\E\\\\E\\Q' (end quote, escaped
    literal backslash+E, reopen quote) so ANY separator value splits
    literally."""
    if len(args) == 1:
        s = args[0]
        return (
            f"array_max(transform(split(({s}), '\\n'), "
            f"t -> octet_length(t)))"
        )
    if len(args) != 2:
        return "cast(null as bigint)"
    s, sep = args
    quoted = (
        f"concat('\\\\Q', replace(({sep}), '\\\\E', "
        f"'\\\\E\\\\\\\\E\\\\Q'), '\\\\E')"
    )
    return (
        f"(case when ({sep}) is null or octet_length(({sep})) = 0 "
        f"then cast(null as bigint) "
        f"else array_max(transform(split(({s}), {quoted}), "
        f"t -> octet_length(t))) end)"
    )


def _sr(args):
    s, a, b = args
    return f"replace(({s}), ({a}), ({b}))"


def _sub3(s, f, c):
    """substrFunc (functions.go:137-165) exactly: from=0 -> from 1 with
    count-1; NULL unless 1 <= from' <= len AND count' >= 1 AND
    from' + count' - 1 <= len — where len and the slice are BYTES (Go
    ``len``/``strs[fri-1:fri+toi-1]``).  The byte slice is decoded back
    to a string; a slice splitting a multibyte codepoint is sanitized by
    make_valid_utf8 (U+FFFD, == Python errors='replace' — probed) where
    the reference keeps raw invalid bytes (FIXTURES.md §3)."""
    adj_f = f"(case when ({f}) = 0 then 1 else ({f}) end)"
    adj_c = f"(case when ({f}) = 0 then ({c}) - 1 else ({c}) end)"
    return (
        f"(case when {adj_f} >= 1 and {adj_f} <= octet_length(({s})) "
        f"and {adj_c} >= 1 "
        f"and {adj_f} + {adj_c} - 1 <= octet_length(({s})) "
        f"then make_valid_utf8(cast(substring(encode(({s}), 'UTF-8'), "
        f"{adj_f}, {adj_c}) as string)) else null end)"
    )


def _substr(args):
    if len(args) == 3:
        return _sub3(*args)
    # the reference returns NULL for any other arity (functions.go:138-141)
    return "cast(null as string)"


_MACROS = (
    ("makeinteger", _mi),
    ("makefloat", _mf),
    ("numchar", _nc),
    ("maxwidth", _mw),
    ("strreplace", _sr),
    ("substr", _substr),
    ("char_length", _cl),
    ("length", _cl),
)


# ------------------------------------------------------ LIKE rewrite

_LIKE_RE = re.compile(r"\blike\s*(\x00\d+\x00)", re.IGNORECASE)
_IDENT_CH = re.compile(r"[\w.\"]")


def _operand_span(sql: str, end: int) -> int:
    """Start index of the expression ending (exclusive) at `end`:
    identifier / qualified name / call / parenthesized group."""
    i = end - 1
    while i >= 0 and sql[i].isspace():
        i -= 1
    if i < 0:
        raise ValueError("LIKE with no left operand")
    if sql[i] == ")":
        depth = 0
        while i >= 0:
            if sql[i] == ")":
                depth += 1
            elif sql[i] == "(":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        if depth:
            raise ValueError("unbalanced parens before LIKE")
        j = i - 1  # a call? absorb the function name
        while j >= 0 and _IDENT_CH.match(sql[j]):
            j -= 1
        return j + 1
    if sql[i] == "\x00":  # a masked string-literal operand
        j = sql.rindex("\x00", 0, i)
        return j
    j = i
    while j >= 0 and _IDENT_CH.match(sql[j]):
        j -= 1
    if j == i:
        raise ValueError(
            f"cannot locate LIKE operand before position {end}; "
            "parenthesize it or use the Column builders"
        )
    return j + 1


def _rewrite_like(masked: str, strings: list[str]) -> str:
    """likeOp (functions.go:309-314) exactly: a pattern ending in '%' is
    a LITERAL-prefix match on pattern[:-1] ('%'/'_' are never wildcards),
    anything else is constant false; NULL input compares false.  NOT LIKE
    (sql.y:286-288) negates that result — including the constant-false
    case (ref: NOT false = true for every row, null operand included)."""
    out, pos = masked, 0
    while True:
        m = _LIKE_RE.search(out, pos)
        if not m:
            return out
        lit = strings[int(m.group(1).strip("\x00"))]
        pat = lit[1:-1].replace("''", "'")
        # optional NOT between the operand and LIKE
        before = out[:m.start()].rstrip()
        negated = (
            before[-3:].lower() == "not"
            and (len(before) == 3 or not _IDENT_CH.match(before[-4]))
        )
        op_end = len(before) - 3 if negated else m.start()
        lo = _operand_span(out, op_end)
        operand = out[lo:op_end].strip()
        if pat.endswith("%"):
            # emit the prefix as a fresh MASKED literal: the macro scan
            # runs after this rewrite, and a raw in-place literal whose
            # content mentions a macro name (e.g. pattern "substr(x%")
            # would be mis-parsed as a call; _unmask applies the Spark
            # escaping uniformly at the end
            idx = len(strings)
            strings.append("'" + pat[:-1].replace("'", "''") + "'")
            base = (
                f"coalesce(startswith(({operand}), \x00{idx}\x00), false)"
            )
        else:
            base = f"(false and ({operand}) is not null)"
        repl = f"(not {base})" if negated else base
        out = out[:lo] + repl + out[m.end():]
        pos = lo + len(repl)


# ------------------------------------------------------------ driver

# number-token ::casts only (osmselect.go makeNumVal strips on NUMBER
# tokens; 'ident2::type' must NOT lose its suffix — the lookbehind
# rejects a match whose number is glued to an identifier)
_PGCAST_RE = re.compile(
    r"(?<![A-Za-z_.\d])(\d+(?:\.\d+)?)\s*::\s*[A-Za-z_]+"
)
# reference UNION has NO distinct variant and never dedups: sql.y:112-119
# routes UNION straight to the concatenating table (tables.go:53-74)
_UNION_RE = re.compile(r"\bunion\b(?!\s+all\b)", re.IGNORECASE)


def rewrite_ref_sql(sql: str) -> str:
    """Reference-dialect SQL text -> plain Spark SQL (pure string
    transform, unit-testable without a session)."""
    masked, strings = _mask_strings(sql)
    masked = _PGCAST_RE.sub(r"\1", masked)       # 5::integer -> 5
    masked = _UNION_RE.sub("union all", masked)  # UNION means UNION ALL
    masked = _rewrite_like(masked, strings)
    for name, render in _MACROS:
        masked = _expand_all(masked, name, render)
    return _unmask(masked, strings)


def ref_sql(spark, sql: str):
    """Run a verbatim reference-dialect query against the registered
    planet_osm_* views."""
    return spark.sql(rewrite_ref_sql(sql))
