"""Transform chain: the reference's 12 row-wise transforms as Column
expressions (reference behavior: `/root/reference/src/utils/transform.ts:14-181`).

Two modes:

* ``strict_js_compat=True`` (default) reproduces the reference's
  JavaScript falsy/null quirks exactly — needed for byte-parity with
  reference outputs (SURVEY.md §4 "genuinely custom pieces" #3):
    - concat drops falsy values (null, '', numeric 0, NaN, false) before
      joining (`transform.ts:18-29` filter(Boolean));
    - uppercase/lowercase/trim stringify with null→'' (`transform.ts:43-77`);
    - split of null → [] (`transform.ts:79-89`);
    - replace/extract of null/no-match → '' (`transform.ts:91-101,139-155`);
    - addPrefix/addSuffix turn a falsy source (incl. 0) into ''
      (`transform.ts:103-125`);
    - toNumber = parseFloat semantics: leading-numeric prefix parse,
      NaN/unparsable → 0 (`transform.ts:127-137`);
    - extract regex: group-1-if-nonempty else full match (`match[1] || match[0]`).
* ``strict_js_compat=False``: clean Spark/SQL semantics (null in → null
  out) — the mode the DuckDB oracle uses.

Everything stays JVM-side (built-in functions, whole-stage codegen);
only Transformation(type='function') may drop to Python, and then via
the user's own callable (DataFrame→DataFrame, so they can choose a
pandas_udf).
"""

from __future__ import annotations

import re
from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openetl_spark.spec import Transformation

# parseFloat's accepted prefix: optional sign, digits[.digits] or .digits,
# optional exponent. Everything after the prefix is ignored by JS.
_PARSEFLOAT_RE = r"^\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?"

# JS whitespace (ECMA-262 WhiteSpace + LineTerminator, what String.trim
# strips): tab, LF, VT, FF, CR, space, NBSP, Ogham space, the Zs range,
# LS, PS, NNBSP, MMSP, ideographic space, BOM — as a Java regex
# character-class body (Java's bare `\s` is ASCII-only by default).
_JS_WS = (
    "\\t\\n\\x0B\\f\\r "
    "\u00A0\u1680\u2000-\u200A\u2028\u2029\u202F\u205F\u3000\uFEFF"
)


def _field_type(df: DataFrame, name: str):
    """Schema type of ``name``, resolving dotted struct paths the same
    way ``F.col`` does (``user.age`` → the nested field's type) — a flat
    top-level lookup would misread nested numerics/booleans as strings
    and break the JS falsy/stringify rules for dotted fields."""
    cur = df.schema
    for part in name.split("."):
        if not isinstance(cur, T.StructType):
            return None
        nxt = {fld.name: fld.dataType for fld in cur.fields}.get(part)
        if nxt is None:
            return None
        cur = nxt
    return cur


def _is_numeric(df: DataFrame, name: str) -> bool:
    return isinstance(_field_type(df, name), T.NumericType)


def _truthy(df: DataFrame, name: str) -> Column:
    """JS Boolean(x) over a typed column: null/''/0/NaN/false are falsy."""
    c = F.col(name)
    dt = _field_type(df, name)
    if isinstance(dt, T.NumericType):
        cond = c.isNotNull() & (c != 0)
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            cond = cond & ~F.isnan(c)
        return cond
    if isinstance(dt, T.BooleanType):
        return c.isNotNull() & c
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return c.isNotNull()  # JS objects/arrays are always truthy
    return c.isNotNull() & (c.cast("string") != "")


def js_number_to_string(x: float) -> str:
    """ECMA-262 §6.1.6.1.20 Number::toString(10), reimplemented exactly:
    shortest round-trip decimal digits (Python ``repr`` — same
    shortest-representation contract JS engines use), positional
    notation for decimal exponents in (-6, 21], un-zero-padded ``e±``
    notation outside. Pinned against hand-computed JS vectors in
    tests."""
    import decimal
    import math

    if math.isnan(x):
        return "NaN"
    if x == math.inf:
        return "Infinity"
    if x == -math.inf:
        return "-Infinity"
    if x == 0:
        return "0"  # JS String(-0) === '0'
    sign = "-" if x < 0 else ""
    dt = decimal.Decimal(repr(abs(float(x)))).as_tuple()
    digits = list(dt.digits)
    exp = dt.exponent
    while len(digits) > 1 and digits[-1] == 0:
        digits.pop()
        exp += 1
    s = "".join(map(str, digits))
    k = len(s)
    n = exp + k  # value = 0.s × 10^n
    if k <= n <= 21:
        body = s + "0" * (n - k)
    elif 0 < n <= 21:
        body = s[:n] + "." + s[n:]
    elif -6 < n <= 0:
        body = "0." + "0" * (-n) + s
    else:
        mant = s[0] + ("." + s[1:] if k > 1 else "")
        body = f"{mant}e{'+' if n - 1 >= 0 else '-'}{abs(n - 1)}"
    return sign + body


def _js_number_string_udf():
    @F.pandas_udf(T.StringType())
    def fmt(xs: pd.Series) -> pd.Series:
        return xs.map(
            lambda v: None if v is None else js_number_to_string(float(v))
        )

    return fmt


def _js_string(df: DataFrame, name: str, exact: bool = False) -> Column:
    """JS String(x) for a typed column. The material divergence from a
    plain cast: JS renders integral doubles without the trailing ``.0``
    (String(1.0) === '1') — handled JVM-side. Non-integral extremes
    (Spark casts |x| ≥ 1e7 / < 1e-3 to ``1.0E7``-style scientific; JS
    switches at 1e21 / 1e-7 with different spelling) match only under
    ``exact=True``, which routes float columns through the ECMA
    formatter pandas UDF — exact JS output, at Arrow-batch cost, so it
    is opt-in per transform (``exact_number_format`` option) rather
    than the default hot path."""
    c = F.col(name)
    dt = _field_type(df, name)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        if exact:
            return _js_number_string_udf()(c.cast("double"))
        d = c.cast("double")
        as_long = d.try_cast("long")
        integral = (
            ~F.isnan(d)
            & as_long.isNotNull()
            & (as_long.cast("double") == d)
            & (F.abs(d) < F.lit(1e15))
        )
        return F.when(integral, as_long.cast("string")).otherwise(c.cast("string"))
    return c.cast("string")


def _str_or_empty(df: DataFrame, name: str, exact: bool = False) -> Column:
    return F.coalesce(_js_string(df, name, exact), F.lit(""))


def _has(df: DataFrame, name: str) -> bool:
    """Strict mode treats a missing column like JS row[field] ===
    undefined (falsy, stringifies to ''), matching the reference where
    transforms run on projected rows and absent properties are
    undefined — not an analysis error."""
    top = name.split(".")[0]
    return top in df.columns


def _scan_groups(pat: str) -> list[str | None]:
    """Lexical walk shared by ``_count_groups`` and
    ``_pattern_group_names``: one entry per CAPTURING group in source
    order — the declared name for ``(?<name>...)``, ``None`` for a
    plain ``(...)``. Escape- and character-class-aware, so ``\\(?<x>``
    or ``[(?<x>]`` never registers a group (ADVICE r04: the old
    regex-findall name scan did, making ``$<x>`` render Java ``${x}``
    and throw at regexp_replace time). Python's re.compile rejects
    some Java-valid syntax (possessive quantifiers), so don't parse."""
    groups: list[str | None] = []
    i = 0
    L = len(pat)
    while i < L:
        ch = pat[i]
        if ch == "\\":
            i += 2  # escaped char (including an escaped backslash)
        elif ch == "[":
            i += 1
            if i < L and pat[i] == "^":
                i += 1
            if i < L and pat[i] == "]":
                i += 1  # leading ] is literal inside a class
            while i < L and pat[i] != "]":
                i += 2 if pat[i] == "\\" else 1
            i += 1  # closing ]
        elif ch == "(":
            if i + 1 >= L or pat[i + 1] != "?":
                groups.append(None)
            elif pat[i + 2 : i + 3] == "<" and pat[i + 3 : i + 4] not in ("", "=", "!"):
                # (?<name>...) — capturing in both Java and JS;
                # lookbehinds (?<= / (?<! are excluded above
                end = pat.find(">", i + 3)
                groups.append(pat[i + 3 : end] if end != -1 else None)
            i += 1
        else:
            i += 1
    return groups


def _pattern_group_names(pattern: str) -> frozenset[str]:
    """Java-dialect named capture groups ``(?<name>...)`` declared in
    ``pattern`` (a group name must start with a letter — Java rejects
    others, and lookbehind sigils never reach here)."""
    return frozenset(
        n for n in _scan_groups(pattern)
        if n is not None and re.fullmatch(r"[A-Za-z][A-Za-z0-9]*", n)
    )


def _js_replacement_to_java(repl: str, group_names: frozenset[str] = frozenset()) -> str:
    """Translate the JS String.replace replacement dialect to Java's:
    JS `$$`→literal $, `$&`→whole match ($0 in Java), `$n` passes
    through, `$<name>`→Java's `${name}` (r03), any OTHER `$` is literal
    in JS but an illegal group ref in Java (escape it); backslashes are
    literal in JS replacements but escapes in Java. ``group_names`` is
    the set of named groups the SEARCH pattern declares: JS resolves
    `$<name>` against them — literal text when the pattern has no named
    groups at all, empty string when it has some but not this one —
    while Java's `${name}` throws on an undeclared group, so both cases
    must be rewritten here rather than passed through. ``$\\```
    (preceding portion) and ``$'`` (following portion) never reach this
    translator: templates containing them route to the Arrow-batched
    ``_replace_with_portions`` path (r04), since Java replacement
    templates cannot express per-match portions."""
    out = []
    i = 0
    while i < len(repl):
        ch = repl[i]
        if ch == "\\":
            out.append("\\\\")
            i += 1
        elif ch == "$":
            nxt = repl[i + 1] if i + 1 < len(repl) else ""
            if nxt == "$":
                out.append("\\$")
                i += 2
            elif nxt == "&":
                out.append("$0")
                i += 2
            elif nxt.isdigit():
                out.append("$" + nxt)
                i += 2
            elif nxt == "<":
                end = repl.find(">", i + 2)
                name = repl[i + 2 : end] if end != -1 else ""
                if (
                    end != -1
                    and re.fullmatch(r"[A-Za-z][A-Za-z0-9]*", name)
                    and name in group_names
                ):
                    out.append("${" + name + "}")
                    i = end + 1
                elif end != -1 and group_names:
                    # JS: well-formed $<name> for an undeclared group,
                    # with named groups present, renders as ''
                    i = end + 1
                else:
                    # JS: malformed $< — or any $<name> when the
                    # pattern has NO named groups — is literal text
                    out.append("\\$")
                    i += 1
            else:
                out.append("\\$")
                i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _js_replace_full(s: str, pattern: re.Pattern, repl: str) -> str:
    """Reference-exact global String.replace for replacement templates
    Java can't express: ``$\\``` (portion before the match) and ``$'``
    (portion after), alongside `$$`/`$&`/`$n`/`$<name>`. Pure-Python
    per-match rendering (the same template walk JS does,
    `transform.ts:91-101` via RegExp(search, 'g')). Only invoked when
    the template actually uses ``$\\``` / ``$'`` — the common dialect
    stays on JVM regexp_replace."""
    out = []
    last = 0
    for m in pattern.finditer(s):
        if m.start() < last:
            # Python's finditer can yield a non-empty match at the same
            # position as a preceding empty match; JS lastIndex has
            # already advanced past it — skip to stay reference-exact.
            continue
        out.append(s[last : m.start()])
        piece = []
        i = 0
        while i < len(repl):
            ch = repl[i]
            nxt = repl[i + 1] if i + 1 < len(repl) else ""
            if ch == "$" and nxt == "$":
                piece.append("$")
                i += 2
            elif ch == "$" and nxt == "&":
                piece.append(m.group(0))
                i += 2
            elif ch == "$" and nxt == "`":
                piece.append(s[: m.start()])
                i += 2
            elif ch == "$" and nxt == "'":
                piece.append(s[m.end() :])
                i += 2
            elif ch == "$" and nxt.isdigit():
                gi = int(nxt)
                if 1 <= gi <= pattern.groups:
                    piece.append(m.group(gi) or "")
                else:
                    piece.append("$" + nxt)  # JS: out-of-range ref is literal
                i += 2
            elif ch == "$" and nxt == "<":
                end = repl.find(">", i + 2)
                name = repl[i + 2 : end] if end != -1 else ""
                if end != -1 and name in pattern.groupindex:
                    piece.append(m.group(name) or "")
                    i = end + 1
                else:
                    piece.append("$")
                    i += 1
            else:
                piece.append(ch)
                i += 1
        out.append("".join(piece))
        last = m.end()
        if m.start() == m.end():  # zero-width: advance like JS lastIndex
            if last < len(s):
                out.append(s[last])
            last += 1
    out.append(s[last:] if last <= len(s) else "")
    return "".join(out)


def _replace_with_portions(src: Column, search: str, repl: str) -> Column:
    """Arrow-batched replace for the ``$\\```/``$'`` dialect. The search
    pattern compiles with Python ``re`` here (vs Java elsewhere) — the
    documented trade for supporting portion refs at all; the dialects
    agree on the reference's test patterns. JS named-group syntax
    ``(?<name>…)`` translates to Python's ``(?P<name>…)`` (lookbehinds
    ``(?<=``/``(?<!`` excluded), so templates mixing ``$<name>`` with
    portion refs keep working on this path."""
    pattern = re.compile(re.sub(r"\(\?<([A-Za-z][A-Za-z0-9]*)>", r"(?P<\1>", search))

    @F.pandas_udf(T.StringType())
    def _do(col: pd.Series) -> pd.Series:
        return col.map(lambda s: _js_replace_full("" if s is None else s, pattern, repl))

    return _do(src)


def _count_groups(pat: str) -> int:
    """Capturing-group count: unescaped '(' not starting a (?...)
    construct, plus named groups — one shared tokenizer with
    ``_pattern_group_names`` (see ``_scan_groups``)."""
    return len(_scan_groups(pat))


def apply_transforms(
    df: DataFrame,
    transforms: Sequence[Transformation],
    strict_js_compat: bool = True,
) -> DataFrame:
    """Sequential fold of the transform chain (≈ reference `transform()`).

    Chained ``withColumn`` projections collapse into a single Project
    node under Catalyst's CollapseProject rule, so a 12-step chain costs
    one codegen'd projection at execution time.
    """
    for t in transforms:
        df = _apply_one(df, t, strict_js_compat)
    return df


def _apply_one(df: DataFrame, t: Transformation, js: bool) -> DataFrame:
    o = t.options
    kind = t.type

    if kind == "concat":
        props: list[str] = list(o["properties"])
        glue = o.get("glue", " ")
        to = o["to"]
        if js:
            # JS: properties.map(p=>row[p]).filter(Boolean).join(glue) —
            # falsy values vanish entirely (no doubled glue).
            exact = bool(o.get("exact_number_format"))
            parts = [
                F.when(_truthy(df, p), _js_string(df, p, exact)).otherwise(F.lit(None))
                if _has(df, p)
                else F.lit(None).cast("string")  # undefined -> filtered
                for p in props
            ]
            expr = F.concat_ws(glue, *parts)  # concat_ws skips nulls
        else:
            expr = F.concat_ws(glue, *[F.col(p).cast("string") for p in props])
        return df.withColumn(to, expr)

    if kind == "renameKey":
        # Copy (dotted-path capable) value to new key; original retained
        # (`transform.ts:31-41` does not delete the source key). A
        # missing source in strict mode is JS row[from] === undefined →
        # null, not an analysis error (same contract as _has elsewhere).
        if js and not _has(df, o["from"]):
            return df.withColumn(o["to"], F.lit(None))
        return df.withColumn(o["to"], F.col(o["from"]))

    if kind in ("uppercase", "lowercase", "trim"):
        fld = o["field"]
        to = o.get("to", fld)
        if js and not _has(df, fld):
            src = F.lit("")  # String(undefined ?? '')
        else:
            src = _str_or_empty(df, fld) if js else F.col(fld).cast("string")
        if kind == "trim" and js:
            # JS String.trim strips ALL JS whitespace (WhiteSpace +
            # LineTerminator: tab/vt/ff/space/NBSP/BOM, the Zs spaces,
            # LF/CR/LS/PS). Java's default `\s` is ASCII-only, so spell
            # the class out instead of relying on it.
            expr = F.regexp_replace(src, f"^[{_JS_WS}]+|[{_JS_WS}]+$", "")
        else:
            expr = {"uppercase": F.upper, "lowercase": F.lower, "trim": F.trim}[kind](src)
        return df.withColumn(to, expr)

    if kind == "split":
        fld, delim, to = o["field"], o["delimiter"], o["to"]
        if js and not _has(df, fld):
            return df.withColumn(to, F.array().cast("array<string>"))
        # JS String.split takes a literal; Spark split() takes a regex → escape.
        expr = F.split(F.col(fld).cast("string"), re.escape(delim))
        if js:
            expr = F.coalesce(expr, F.array().cast("array<string>"))
        return df.withColumn(to, expr)

    if kind == "replace":
        fld = o["field"]
        to = o.get("to", fld)
        repl = o["replace"]
        if js:
            src = F.lit("") if not _has(df, fld) else _str_or_empty(df, fld)
            if "$`" in repl or "$'" in repl:
                # portion refs need per-match surgery — Arrow-batched path
                return df.withColumn(to, _replace_with_portions(src, o["search"], repl))
            repl = _js_replacement_to_java(repl, _pattern_group_names(o["search"]))
        else:
            src = F.col(fld).cast("string")
        return df.withColumn(to, F.regexp_replace(src, o["search"], repl))

    if kind in ("addPrefix", "addSuffix"):
        fld = o["field"]
        to = o.get("to", fld)
        affix = o["prefix"] if kind == "addPrefix" else o["suffix"]
        if js:
            # `${prefix}${row[field] || ''}` — falsy (incl. numeric 0) → ''.
            if not _has(df, fld):
                base = F.lit("")
            else:
                exact = bool(o.get("exact_number_format"))
                base = F.when(
                    _truthy(df, fld), _js_string(df, fld, exact)
                ).otherwise(F.lit(""))
        else:
            base = F.col(fld).cast("string")
        expr = (
            F.concat(F.lit(affix), base) if kind == "addPrefix" else F.concat(base, F.lit(affix))
        )
        return df.withColumn(to, expr)

    if kind == "toNumber":
        fld = o["field"]
        to = o.get("to", fld)
        if js:
            if not _has(df, fld):
                return df.withColumn(to, F.lit(0.0))
            if _is_numeric(df, fld):
                num = F.col(fld).cast("double")
                expr = F.when(num.isNull() | F.isnan(num), F.lit(0.0)).otherwise(num)
            else:
                prefix = F.regexp_extract(F.col(fld).cast("string"), _PARSEFLOAT_RE, 0)
                # try_cast: ANSI mode (Spark 4 default) would throw on ''.
                expr = F.coalesce(prefix.try_cast("double"), F.lit(0.0))
        else:
            expr = F.col(fld).try_cast("double")
        return df.withColumn(to, expr)

    if kind == "extract":
        fld, to = o["field"], o["to"]
        if js and not _has(df, fld):
            return df.withColumn(to, F.lit(""))
        if "pattern" in o and o["pattern"] is not None:
            src = _str_or_empty(df, fld) if js else F.col(fld).cast("string")
            pat = o["pattern"]
            if _count_groups(pat) >= 1:
                g1 = F.regexp_extract(src, pat, 1)
                g0 = F.regexp_extract(src, pat, 0)
                # JS `match[1] || match[0]`: empty group-1 falls back.
                expr = F.when(g1 != "", g1).otherwise(g0)
            else:
                expr = F.regexp_extract(src, pat, 0)
        elif o.get("start") is not None and o.get("end") is not None:
            start, end = int(o["start"]), int(o["end"])
            src = _str_or_empty(df, fld) if js else F.col(fld).cast("string")
            # JS String.slice semantics incl. negative indices: clamp
            # relative to the string length, empty when end <= start.
            n = F.length(src)
            s_idx = (
                F.greatest(n + F.lit(start), F.lit(0)) if start < 0
                else F.least(F.lit(start), n)
            )
            e_idx = (
                F.greatest(n + F.lit(end), F.lit(0)) if end < 0
                else F.least(F.lit(end), n)
            )
            ln = F.greatest(e_idx - s_idx, F.lit(0))
            expr = F.substring(src, s_idx + F.lit(1), ln)
        else:
            # reference requires pattern OR both start+end; otherwise the
            # row passes through unchanged (transform.ts default: warn)
            return df
        return df.withColumn(to, expr)

    if kind == "mergeObjects":
        fields: list[str] = list(o["fields"])
        # Spark structs keep null members; the reference drops undefined
        # only (defined-null is kept, `transform.ts:157-172`) — identical
        # for typed columns, which are always "defined". A MISSING column
        # is undefined, so strict mode drops it from the struct instead
        # of failing analysis (reference: spread of undefined is a no-op).
        if js:
            fields = [f for f in fields if _has(df, f)]
        return df.withColumn(o["to"], F.struct(*[F.col(f) for f in fields]))

    if kind == "function":
        # First-class custom transform (declared but dead in the
        # reference, `transform.ts:174-176` / `types.ts:201-214`).
        fn = o["fn"]
        return fn(df)

    raise ValueError(f"unknown transformation type {kind!r}")
