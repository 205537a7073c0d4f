"""Transform-chain golden tests.

Port of the reference's transform expectations (fixture shape from
`tests/transform.test.ts:5-20`, behaviors documented in SURVEY.md §2
A10-A18): JS falsy quirks in strict mode, clean SQL semantics
otherwise. Reimplemented from the documented behavior — not copied.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from openetl_spark.functions.transforms import apply_transforms
from openetl_spark.spec import Transformation

SCHEMA = T.StructType(
    [
        T.StructField("firstname", T.StringType()),
        T.StructField("lastname", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("nickname", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

ROWS = [
    ("Jorge", "Lukas", "jorge@supercoolsoftware.com", "260", "  Lucky  ", 1.5),
    ("Jane", None, "jane@example.com", "abc", None, 0.0),
]


@pytest.fixture(scope="module")
def contacts(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def one(df, **kw):
    return [r.asDict() for r in df.orderBy("firstname").collect()]


def test_concat_drops_falsy(contacts):
    # JS: [first, last, score].filter(Boolean).join(' ') — None and 0 vanish
    out = apply_transforms(
        contacts,
        [Transformation("concat", {"properties": ["firstname", "lastname", "score"], "glue": " ", "to": "full"})],
    )
    rows = one(out)
    assert rows[1]["full"] == "Jorge Lukas 1.5"
    assert rows[0]["full"] == "Jane"  # null lastname AND 0.0 score dropped


def test_concat_clean_mode(contacts):
    out = apply_transforms(
        contacts,
        [Transformation("concat", {"properties": ["firstname", "lastname"], "glue": "-", "to": "full"})],
        strict_js_compat=False,
    )
    rows = one(out)
    # concat_ws skips nulls but keeps other values verbatim
    assert rows[1]["full"] == "Jorge-Lukas"
    assert rows[0]["full"] == "Jane"


def test_rename_keeps_original(contacts):
    out = apply_transforms(
        contacts, [Transformation("renameKey", {"from": "email", "to": "contact_email"})]
    )
    rows = one(out)
    assert rows[0]["contact_email"] == rows[0]["email"] == "jane@example.com"


def test_case_and_trim_null_to_empty(contacts):
    out = apply_transforms(
        contacts,
        [
            Transformation("uppercase", {"field": "firstname", "to": "up"}),
            Transformation("lowercase", {"field": "lastname", "to": "lo"}),
            Transformation("trim", {"field": "nickname", "to": "nick"}),
        ],
    )
    rows = one(out)
    assert rows[1]["up"] == "JORGE" and rows[1]["lo"] == "lukas" and rows[1]["nick"] == "Lucky"
    # JS: String(null ?? '') — null becomes ''
    assert rows[0]["lo"] == "" and rows[0]["nick"] == ""


def test_split_null_to_empty_array(contacts):
    out = apply_transforms(
        contacts,
        [Transformation("split", {"field": "email", "delimiter": "@", "to": "parts"})],
    )
    rows = one(out)
    assert rows[1]["parts"] == ["jorge", "supercoolsoftware.com"]
    out2 = apply_transforms(
        contacts, [Transformation("split", {"field": "nickname", "delimiter": ".", "to": "p"})]
    )
    assert one(out2)[0]["p"] == []  # null → []


def test_split_escapes_regex_delimiter(spark):
    df = spark.createDataFrame([("a.b.c",)], "s string")
    out = apply_transforms(
        df, [Transformation("split", {"field": "s", "delimiter": ".", "to": "p"})]
    )
    # '.' must split literally, not as regex-any
    assert out.collect()[0]["p"] == ["a", "b", "c"]


def test_replace_regex_global(contacts):
    out = apply_transforms(
        contacts,
        [Transformation("replace", {"field": "email", "search": r"[aeiou]", "replace": "*", "to": "masked"})],
    )
    rows = one(out)
    assert rows[1]["masked"] == "j*rg*@s*p*rc**ls*ftw*r*.c*m"


def test_prefix_suffix_falsy_to_empty(contacts):
    out = apply_transforms(
        contacts,
        [
            Transformation("addPrefix", {"field": "score", "prefix": "s=", "to": "p"}),
            Transformation("addSuffix", {"field": "lastname", "suffix": "!", "to": "sfx"}),
        ],
    )
    rows = one(out)
    assert rows[1]["p"] == "s=1.5" and rows[1]["sfx"] == "Lukas!"
    # JS `${prefix}${row[field] || ''}`: 0.0 and null → ''
    assert rows[0]["p"] == "s=" and rows[0]["sfx"] == "!"


def test_tonumber_parsefloat_semantics(contacts):
    out = apply_transforms(
        contacts, [Transformation("toNumber", {"field": "id", "to": "idn"})]
    )
    rows = one(out)
    assert rows[1]["idn"] == 260.0
    assert rows[0]["idn"] == 0.0  # parseFloat('abc') → NaN → 0


def test_tonumber_leading_prefix(spark):
    df = spark.createDataFrame(
        [("12.5abc",), ("  -3e2xyz",), ("x12",), ("",)], "s string"
    )
    out = apply_transforms(df, [Transformation("toNumber", {"field": "s", "to": "n"})])
    got = [r["n"] for r in out.collect()]
    assert got == [12.5, -300.0, 0.0, 0.0]  # parseFloat prefix parse


def test_extract_regex_group_fallback(contacts):
    out = apply_transforms(
        contacts,
        [Transformation("extract", {"field": "email", "pattern": r"@(\w+)", "to": "domain"})],
    )
    rows = one(out)
    assert rows[1]["domain"] == "supercoolsoftware"  # group 1
    out2 = apply_transforms(
        contacts,
        [Transformation("extract", {"field": "email", "pattern": r"\w+@", "to": "user"})],
    )
    assert one(out2)[1]["user"] == "jorge@"  # no group → match[0]


def test_extract_substring(contacts):
    out = apply_transforms(
        contacts,
        [Transformation("extract", {"field": "firstname", "start": 1, "end": 4, "to": "mid"})],
    )
    rows = one(out)
    assert rows[1]["mid"] == "org"  # JS slice(1,4)


def test_merge_objects(contacts):
    out = apply_transforms(
        contacts,
        [Transformation("mergeObjects", {"fields": ["firstname", "email"], "to": "obj"})],
    )
    rows = one(out)
    assert rows[1]["obj"]["firstname"] == "Jorge"
    assert rows[1]["obj"]["email"] == "jorge@supercoolsoftware.com"


def test_custom_function_transform(contacts):
    from pyspark.sql import functions as F

    out = apply_transforms(
        contacts,
        [
            Transformation(
                "function",
                {"fn": lambda df: df.withColumn("shout", F.concat(F.upper("firstname"), F.lit("!")))},
            )
        ],
    )
    assert one(out)[1]["shout"] == "JORGE!"


def test_chain_order_matters(contacts):
    out = apply_transforms(
        contacts,
        [
            Transformation("lowercase", {"field": "firstname", "to": "x"}),
            Transformation("addPrefix", {"field": "x", "prefix": ">>", "to": "x"}),
            Transformation("uppercase", {"field": "x", "to": "x"}),
        ],
    )
    assert one(out)[1]["x"] == ">>JORGE"


def test_unknown_transform_raises(contacts):
    with pytest.raises(ValueError, match="unknown transformation"):
        apply_transforms(contacts, [Transformation("frobnicate", {})])


def test_replace_js_dollar_dialect(spark):
    """JS replacement-string semantics: lone $ literal, $& whole match,
    $$ literal dollar (Java would throw / misparse these)."""
    df = spark.createDataFrame([("10 USD",)], "s string")
    t = lambda repl: apply_transforms(
        df, [Transformation("replace", {"field": "s", "search": "USD", "replace": repl, "to": "t"})]
    ).collect()[0]["t"]
    assert t("$") == "10 $"
    assert t("[$&]") == "10 [USD]"
    assert t("$$") == "10 $"
    assert t("a\\b") == "10 a\\b"  # backslash literal in JS


def test_extract_slice_negative_indices(spark):
    df = spark.createDataFrame([("hello",)], "s string")

    def sl(start, end):
        return apply_transforms(
            df, [Transformation("extract", {"field": "s", "start": start, "end": end, "to": "x"})]
        ).collect()[0]["x"]

    assert sl(-3, -1) == "ll"
    assert sl(1, 3) == "el"
    assert sl(-2, 5) == "lo"
    assert sl(3, 1) == ""  # end <= start → empty
    assert sl(0, 99) == "hello"  # clamped


def test_extract_requires_pattern_or_both_bounds(spark):
    df = spark.createDataFrame([("hello",)], "s string")
    out = apply_transforms(
        df, [Transformation("extract", {"field": "s", "start": 1, "to": "x"})]
    )
    assert "x" not in out.columns  # passes through unchanged (reference default)


def test_trim_strips_all_js_whitespace(spark):
    df = spark.createDataFrame([("\tabc\n",)], "s string")
    out = apply_transforms(df, [Transformation("trim", {"field": "s", "to": "x"})])
    assert out.collect()[0]["x"] == "abc"


def test_missing_column_is_js_undefined(spark):
    """Transforms referencing non-selected fields behave like the
    reference (row[field] === undefined), not like an analysis error."""
    df = spark.createDataFrame([("Jo",)], "a string")
    out = apply_transforms(
        df,
        [
            Transformation("concat", {"properties": ["a", "ghost"], "glue": " ", "to": "c"}),
            Transformation("toNumber", {"field": "ghost", "to": "n"}),
            Transformation("uppercase", {"field": "ghost", "to": "u"}),
            Transformation("split", {"field": "ghost", "delimiter": ",", "to": "sp"}),
            Transformation("extract", {"field": "ghost", "pattern": "x", "to": "e"}),
            Transformation("addPrefix", {"field": "ghost", "prefix": "p-", "to": "pf"}),
        ],
    )
    r = out.collect()[0]
    assert r["c"] == "Jo" and r["n"] == 0.0 and r["u"] == "" and r["sp"] == []
    assert r["e"] == "" and r["pf"] == "p-"


def test_extract_java_only_regex_syntax(spark):
    # possessive quantifier: valid Java regex, rejected by Python re —
    # must not crash plan building
    df = spark.createDataFrame([("aaab",)], "s string")
    out = apply_transforms(
        df, [Transformation("extract", {"field": "s", "pattern": "a*+b", "to": "x"})]
    )
    assert out.collect()[0]["x"] == "aaab"


# ---------------------------------------- exact JS number formatting (r03)

JS_NUMBER_VECTORS = [
    # (python value, exactly what JS String(x) produces)
    (1e21, "1e+21"),
    (1e20, "100000000000000000000"),
    (123456789012345680000.0, "123456789012345680000"),
    (1e-6, "0.000001"),
    (1e-7, "1e-7"),
    (1.5e-7, "1.5e-7"),
    (0.1 + 0.2, "0.30000000000000004"),
    (12345678.5, "12345678.5"),
    (10000000.0, "10000000"),
    (0.0001, "0.0001"),
    (-0.0, "0"),
    (5e-324, "5e-324"),
    (1.7976931348623157e308, "1.7976931348623157e+308"),
    (-42.5, "-42.5"),
    (float("nan"), "NaN"),
    (float("inf"), "Infinity"),
    (float("-inf"), "-Infinity"),
]


def test_js_number_to_string_vectors():
    from openetl_spark.functions.transforms import js_number_to_string

    for x, want in JS_NUMBER_VECTORS:
        assert js_number_to_string(x) == want, (x, js_number_to_string(x), want)


def test_exact_number_format_closes_exponent_divergence(spark):
    """ROADMAP #6 closed (opt-in): with exact_number_format, concat
    renders doubles byte-for-byte as JS String(x) — including the 1e21 /
    1e-7 exponent thresholds the JVM cast path documents as divergent."""
    vals = [(i, v) for i, (v, _) in enumerate(JS_NUMBER_VECTORS[:13])]
    df = spark.createDataFrame(vals, "id long, x double")
    out = apply_transforms(
        df,
        [Transformation("concat", {"properties": ["x"], "to": "s",
                                   "exact_number_format": True})],
        strict_js_compat=True,
    )
    got = {r["id"]: r["s"] for r in out.collect()}
    for i, (v, want) in enumerate(JS_NUMBER_VECTORS[:13]):
        # concat filters falsy: String(-0) never survives ('' instead)
        want_concat = "" if v == 0 else want
        assert got[i] == want_concat, (v, got[i], want_concat)


def test_replace_named_group_reference(spark):
    """r03: JS `$<name>` replacement refs translate to Java `${name}` —
    named-group round-trip through the strict replace transform."""
    df = spark.createDataFrame([(1, "john.smith@corp.com")], "id long, email string")
    out = apply_transforms(
        df,
        [Transformation("replace", {
            "field": "email", "to": "display",
            "search": r"(?<user>[^.@]+)\.(?<family>[^@]+)@.*",
            "replace": "$<family>, $<user>"})],
        strict_js_compat=True,
    )
    assert out.collect()[0]["display"] == "smith, john"


def test_replace_malformed_named_ref_stays_literal(spark):
    df = spark.createDataFrame([(1, "abc")], "id long, s string")
    out = apply_transforms(
        df,
        [Transformation("replace", {"field": "s", "to": "t",
                                    "search": "b", "replace": "$<"})],
        strict_js_compat=True,
    )
    assert out.collect()[0]["t"] == "a$<c"


def test_replace_portion_refs(spark):
    """r04: JS portion refs — $` (before match) and $' (after match) —
    exact per-match semantics, verified against Node behavior:
    'abcd'.replace(/c/g, "$`") === 'abab d'? no: 'ab' + 'ab' + 'd'."""
    df = spark.createDataFrame([("abcd",), ("",)], "s string")
    t = lambda repl, search="c": [
        r["t"]
        for r in apply_transforms(
            df,
            [Transformation("replace", {"field": "s", "search": search, "replace": repl, "to": "t"})],
        ).collect()
    ]
    # 'abcd'.replace(/c/g, '$`') -> 'ab' + 'ab' + 'd' = 'ababd'
    assert t("$`") == ["ababd", ""]
    # 'abcd'.replace(/c/g, "$'") -> 'ab' + 'd' + 'd' = 'abdd'
    assert t("$'") == ["abdd", ""]
    # combined with $& and literals: 'abcd'.replace(/c/g, "[$`|$&|$']")
    assert t("[$`|$&|$']") == ["ab[ab|c|d]d", ""]
    # $$` is a literal dollar then backtick, NOT a portion ref
    assert t("$$`") == ["ab$`d", ""]
    # global multi-match: 'aXbXc'.replace(/X/g, "($')")
    df2 = spark.createDataFrame([("aXbXc",)], "s string")
    out = apply_transforms(
        df2,
        [Transformation("replace", {"field": "s", "search": "X", "replace": "($')", "to": "t"})],
    ).collect()[0]["t"]
    assert out == "a(bXc)b(c)c"
    # group refs still work on the portion path
    out2 = apply_transforms(
        df2,
        [Transformation("replace", {"field": "s", "search": "(X)b", "replace": "$1$`!", "to": "t"})],
    ).collect()[0]["t"]
    assert out2 == "aXa!Xc"


def test_replace_portion_refs_zero_width_and_named_groups(spark):
    """Review findings r04: (1) Python finditer can yield a non-empty
    match at the same position as a preceding empty match — JS lastIndex
    has moved past it, so it must be skipped ('aa'.replace(/a*?/g,'-')
    === '-a-a-'); (2) JS named-group syntax (?<g>...) must compile on
    the portion path (Python spells it (?P<g>...))."""
    df = spark.createDataFrame([("aa",)], "s string")

    def t(search, repl):
        return apply_transforms(
            df,
            [Transformation("replace", {"field": "s", "search": search, "replace": repl, "to": "t"})],
        ).collect()[0]["t"]

    # zero-width matches through the portion path: each empty match
    # advances one char, and the char is kept, never replaced
    assert t("a*?", "[$']") == "[aa]a[a]a[]"
    # named group + portion ref in one template
    assert t("(?<mid>a)a", "<$<mid>|$`>") == "<a|>"


def test_group_name_scan_skips_escapes_and_classes():
    """ADVICE r04: the name scan must share _count_groups' lexical walk
    — a literal '(?<x>' after an escaped paren or inside [...] is NOT a
    named group (the old regex scan registered it, rendering ${x} and
    throwing at regexp_replace time)."""
    from openetl_spark.functions.transforms import (
        _count_groups,
        _pattern_group_names,
    )

    assert _pattern_group_names(r"\(?<x>") == frozenset()
    assert _pattern_group_names(r"[(?<x>]") == frozenset()
    assert _pattern_group_names(r"(?<yy>a)b") == frozenset({"yy"})
    assert _pattern_group_names(r"(?<=a)(?<!b)(?<n>c)") == frozenset({"n"})
    # count and names come from one tokenizer: they must agree
    assert _count_groups(r"(?<yy>a)(b)") == 2
    assert _count_groups(r"\(a[(](?<=x)") == 0
