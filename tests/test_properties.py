"""Property-based differential tests (hypothesis) — SURVEY.md §5
carry-over: the reference had only hand-written example tests; the
engine gets randomized sweeps.

* random filter specs: compile_filters (Spark Column) vs an
  independent SQL rendering run in DuckDB on the same parquet;
* toNumber strict mode vs a pure-Python parseFloat reimplementation;
* extract substring vs JS String.slice semantics;
* concat vs JS filter(Boolean).join;
* REST paginator: for any (n_items, page_size, limit) the row stream
  is exactly range(min(n, limit)) and page count is minimal.

Each Spark property batches all generated rows into ONE DataFrame per
example to keep job counts low.
"""

import math
import re

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from openetl_spark.functions.filters import compile_filters
from openetl_spark.functions.transforms import apply_transforms
from openetl_spark.sources.rest import paged_fetch
from openetl_spark.spec import Filter, FilterGroup, Transformation

SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# ------------------------------------------------------- filter property

NUMERIC_FIELDS = {"c_acctbal": (-1000.0, 10000.0), "c_custkey": (0, 150), "c_nationkey": (0, 24)}
STRING_FIELDS = {"c_mktsegment": ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]}


def leaf_strategy():
    def num_leaf(draw):
        field = draw(st.sampled_from(sorted(NUMERIC_FIELDS)))
        lo, hi = NUMERIC_FIELDS[field]
        op = draw(st.sampled_from(["=", "!=", ">", ">=", "<", "<=", "between", "not_between", "in", "not_in"]))
        if op in ("between", "not_between"):
            a = draw(st.floats(lo, hi, allow_nan=False))
            b = draw(st.floats(lo, hi, allow_nan=False))
            return Filter(field, op, (min(a, b), max(a, b)))
        if op in ("in", "not_in"):
            vals = draw(st.lists(st.integers(int(lo), int(hi)), min_size=1, max_size=4))
            return Filter(field, op, vals)
        return Filter(field, op, draw(st.floats(lo, hi, allow_nan=False)))

    def str_leaf(draw):
        field = draw(st.sampled_from(sorted(STRING_FIELDS)))
        op = draw(st.sampled_from(["=", "!=", "in", "not_in", "contains", "starts_with"]))
        if op in ("in", "not_in"):
            return Filter(field, op, draw(st.lists(st.sampled_from(STRING_FIELDS[field]), min_size=1, max_size=3)))
        v = draw(st.sampled_from(STRING_FIELDS[field]))
        if op in ("contains", "starts_with"):
            v = v[: max(1, len(v) // 2)]
        return Filter(field, op, v)

    return st.composite(num_leaf)(), st.composite(str_leaf)()


def filters_strategy():
    num, s = leaf_strategy()
    leaf = st.one_of(num, s)
    group = st.builds(
        FilterGroup,
        op=st.sampled_from(["AND", "OR"]),
        filters=st.lists(leaf, min_size=1, max_size=3),
    )
    return st.lists(st.one_of(leaf, group), min_size=1, max_size=3)


def render_sql(flt) -> str:
    """Independent SQL rendering of the canonical filter vocabulary
    (deliberately NOT sharing code with the engine's Column compiler)."""
    if isinstance(flt, FilterGroup):
        joined = f" {flt.op} ".join(f"({render_sql(f)})" for f in flt.filters)
        return joined or "TRUE"
    f, op, v = flt.field, flt.operator, flt.value

    def lit(x):
        if isinstance(x, str):
            return "'" + x.replace("'", "''") + "'"
        return repr(float(x)) if isinstance(x, float) else repr(x)

    if op in ("=", "!=", ">", ">=", "<", "<="):
        sql_op = {"=": "=", "!=": "<>"}.get(op, op)
        return f"{f} {sql_op} {lit(v)}"
    if op == "between":
        return f"{f} BETWEEN {lit(v[0])} AND {lit(v[1])}"
    if op == "not_between":
        return f"{f} NOT BETWEEN {lit(v[0])} AND {lit(v[1])}"
    if op == "in":
        return f"{f} IN ({', '.join(lit(x) for x in v)})"
    if op == "not_in":
        return f"{f} NOT IN ({', '.join(lit(x) for x in v)})"
    if op == "contains":
        return f"position({lit(v)} IN {f}) > 0"
    if op == "starts_with":
        return f"{f} LIKE {lit(v + '%')}"
    raise AssertionError(op)


@pytest.fixture(scope="module")
def customer_df(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


@pytest.fixture(scope="module")
def customer_con(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'")
    yield con
    con.close()


@given(filters=filters_strategy())
@settings(**SETTINGS)
def test_filter_compile_matches_duckdb(spark, customer_df, customer_con, filters):
    pred = compile_filters(filters)
    got = sorted(r["c_custkey"] for r in customer_df.filter(pred).select("c_custkey").collect())
    where = " AND ".join(f"({render_sql(f)})" for f in filters)
    exp = sorted(
        r[0] for r in customer_con.execute(f"SELECT c_custkey FROM customer WHERE {where}").fetchall()
    )
    assert got == exp, f"WHERE {where}"


# ----------------------------------------------------- transform properties

def js_parsefloat(s) -> float:
    """Pure-Python reimplementation of JS parseFloat(str) || 0."""
    if s is None:
        return 0.0
    # re.ASCII: JS parseFloat accepts ASCII digits only (Python's \d
    # would otherwise match e.g. Arabic-Indic digits)
    m = re.match(r"^\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", str(s), re.ASCII)
    if not m:
        return 0.0
    try:
        v = float(m.group(0).strip())
    except ValueError:
        return 0.0
    if math.isnan(v):
        return 0.0
    return v


@given(strings=st.lists(
    st.one_of(
        st.none(),
        st.text(alphabet=" +-.e0123456789xyzXYZ", max_size=12),
        st.from_regex(r"[+-]?\d{1,8}(\.\d{1,6})?([eE][+-]?\d{1,2})?", fullmatch=True),
    ),
    min_size=1, max_size=50,
))
@settings(**SETTINGS)
def test_tonumber_matches_parsefloat(spark, strings):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "i long, s string")
    out = apply_transforms(df, [Transformation("toNumber", {"field": "s", "to": "n"})])
    got = {r["i"]: r["n"] for r in out.collect()}
    for i, s in enumerate(strings):
        exp = js_parsefloat(s)
        assert got[i] == pytest.approx(exp), f"input {s!r}: spark={got[i]} js={exp}"


@given(
    rows=st.lists(st.tuples(st.text(max_size=10)), min_size=1, max_size=30),
    start=st.integers(0, 12),
    end=st.integers(0, 14),
)
@settings(**SETTINGS)
def test_extract_substring_matches_js_slice(spark, rows, start, end):
    if end < start:
        start, end = end, start
    df = spark.createDataFrame([(i, r[0]) for i, r in enumerate(rows)], "i long, s string")
    out = apply_transforms(
        df, [Transformation("extract", {"field": "s", "start": start, "end": end, "to": "x"})]
    )
    got = {r["i"]: r["x"] for r in out.collect()}
    for i, (s,) in enumerate(rows):
        assert got[i] == s[start:end], f"slice({start},{end}) of {s!r}"


@given(rows=st.lists(
    st.tuples(
        st.one_of(st.none(), st.text(max_size=6)),
        # bounded 3-decimal floats: inside this range Spark's double→
        # string and JS Number→string agree for non-integral values,
        # and the engine handles the integral .0-stripping; exponent-
        # notation thresholds (1e21 / 1e-7) are a documented divergence
        st.one_of(
            st.none(),
            st.floats(-1e6, 1e6, allow_nan=False).map(lambda x: round(x, 3)),
            st.just(float("nan")),
            st.just(0.0),
        ),
    ),
    min_size=1, max_size=30,
))
@settings(**SETTINGS)
def test_concat_matches_js_filter_boolean(spark, rows):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "i long, a string, b double"
    )
    out = apply_transforms(
        df, [Transformation("concat", {"properties": ["a", "b"], "glue": "|", "to": "x"})]
    )
    got = {r["i"]: r["x"] for r in out.collect()}

    def js_str(x):
        # JS Number -> string: integers render without .0
        if isinstance(x, float) and not math.isnan(x) and x == int(x) and abs(x) < 1e15:
            return str(int(x))
        return str(x)

    for i, (a, b) in enumerate(rows):
        parts = [p for p in (a, b) if p]  # JS falsy filter: None, '', 0, NaN
        parts = [js_str(p) for p in parts if not (isinstance(p, float) and math.isnan(p))]
        assert got[i] == "|".join(parts), f"inputs {(a, b)!r}"


# ------------------------------------------------------ paginator property

@given(
    n_items=st.integers(0, 500),
    page_size=st.integers(1, 100),
    limit=st.one_of(st.none(), st.integers(0, 600)),
)
@settings(max_examples=50, deadline=None)
def test_paginator_exhaustive(n_items, page_size, limit):
    calls = []

    def fetch(opts):
        calls.append(1)
        off = int(opts["offset"] or 0)
        return {"data": [{"id": i} for i in range(off, min(off + opts["limit"], n_items))]}

    res = paged_fetch(fetch, pagination="offset", items_per_page=page_size, total_limit=limit)
    expect = min(n_items, limit) if limit is not None else n_items
    assert [r["id"] for r in res.rows] == list(range(expect))
    # minimal page count: ceil(expect/page)+boundary-confirm at most
    assert len(calls) <= max(1, math.ceil(expect / page_size) + 1)


@settings(**{**SETTINGS, "max_examples": 50})
@given(
    frames=st.lists(
        st.tuples(
            st.integers(0, 500),   # left
            st.integers(0, 500),   # top
            st.integers(1, 600),   # width
            st.integers(1, 400),   # height
            st.integers(0, 65535), # delay_cs
        ),
        min_size=0,
        max_size=12,
    )
)
def test_gif_frame_walk_roundtrips_generator(frames):
    """For any frame spec, parse_gif_frames over make_animated_gif
    recovers exactly the generated geometry/delays, in order, with
    byte spans that re-slice to blocks starting at the image
    descriptor and ending at the sub-block terminator (pure Python —
    no Spark jobs)."""
    from openetl_spark.operators.multimodal import parse_gif_frames
    from tests.media_fixtures import make_animated_gif

    data = make_animated_gif(600, 400, frames)
    got = parse_gif_frames(data)
    assert [(f["left"], f["top"], f["width"], f["height"], f["delay_cs"]) for f in got] == frames
    assert [f["frame_idx"] for f in got] == list(range(len(frames)))
    for f in got:
        span = data[f["byte_offset"] : f["byte_offset"] + f["n_bytes"]]
        assert span[:1] == b"\x2c" and span[-1:] == b"\x00"
    # truncation never raises and never yields more frames
    for cut in (len(data) // 3, len(data) // 2, len(data) - 2):
        assert len(parse_gif_frames(data[:cut])) <= len(frames)


@settings(**{**SETTINGS, "max_examples": 60})
@given(
    mcs=st.sampled_from([2, 3, 4, 7, 8]),
    runs=st.lists(
        st.tuples(st.integers(0, 255), st.integers(1, 40)),
        min_size=1,
        max_size=120,
    ),
)
def test_gif_lzw_encoder_decoder_roundtrip(mcs, runs):
    """The real LZW compressor (fixtures) against the real decoder
    (multimodal): any index stream round-trips exactly — covering
    dictionary growth, code-width bumps (the decoder lags the encoder
    by one entry), KwKwK, and the 12-bit reset. Pure Python."""
    from openetl_spark.operators.multimodal import _gif_lzw_decode
    from tests.media_fixtures import _gif_lzw_encode

    alphabet = 1 << mcs
    idx = [v % alphabet for v, n in runs for _ in range(n)]
    enc = _gif_lzw_encode(mcs, idx)
    assert _gif_lzw_decode(mcs, enc, len(idx)) == idx


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    ),
    chunk=st.integers(min_value=1, max_value=10),
    stride=st.integers(min_value=1, max_value=10),
)
@settings(**SETTINGS)
def test_chunk_documents_matches_python_reference(spark, docs, chunk, stride):
    """chunk_documents vs a direct Python re-implementation over random
    token lists and chunk/stride geometry: same chunk ids, same texts,
    same lengths, full token coverage."""
    from openetl_spark.operators.text import chunk_documents

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(
            df, chunk_tokens=chunk, stride=stride
        ).collect()
    )
    expected = []
    for i, words in enumerate(docs):
        for s in range(0, len(words), stride):
            piece = words[s : s + chunk]
            expected.append((i, s // stride, " ".join(piece), len(piece)))
    assert got == sorted(expected)


# ------------------------------------------------------------------
# JPEG codec pair (r06-s2): encode -> decode round-trip across the
# parameter plane (dims not multiples of the MCU, all subsampling
# modes, quality range), plus the crash-guard contract on truncation.
# ------------------------------------------------------------------


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    quality=st.integers(min_value=60, max_value=98),
    sub=st.sampled_from(["444", "420", "422", "gray"]),
    progressive=st.sampled_from([False, True, "sa"]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_roundtrip_property(w, h, quality, sub, progressive, seed):
    import numpy as np

    from openetl_spark.operators.media_synth import encode_jpeg
    from openetl_spark.operators.multimodal import decode_jpeg_pixels

    rng = np.random.RandomState(seed)
    # SMOOTH content: random linear ramps per channel. JPEG's loss is
    # concentrated in high-frequency chroma (sharp saturated edges can
    # legitimately miss by >50/channel at q=60 — measured, not a bug),
    # so the property uses low-frequency content where quantization
    # error has a small fixed bound across the whole parameter plane.
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.zeros((h, w, 3))
    for c in range(3):
        ax, ay = rng.uniform(-1, 1, 2)
        off = rng.uniform(0, 255)
        # Bound the PER-PIXEL step, not the per-image span: 200/max(w,1)
        # made a 2-px-wide ramp step by up to 100/px — a sharp edge, not
        # smooth content — and 4:2:0 chroma averaging then legitimately
        # misses the bound (hypothesis found w=2,h=1,q=60,sub=420).
        g = off + ax * xx * (200.0 / max(w, 16)) + ay * yy * (200.0 / max(h, 16))
        img[..., c] = np.clip(g, 0, 255)
    img = img.astype(np.uint8)
    src = img[..., 0] if sub == "gray" else img
    data = encode_jpeg(src, quality=quality, subsampling=sub,
                       progressive=progressive)
    dec = decode_jpeg_pixels(data)
    assert dec is not None and dec[0] == w and dec[1] == h and dec[2] == 3
    px = np.frombuffer(bytes(dec[3]), dtype=np.uint8).reshape(h, w, 3).astype(int)
    ref = np.stack([src] * 3, axis=-1).astype(int) if sub == "gray" else img.astype(int)
    err = np.abs(px - ref)
    # low-frequency content: quantization error scales with the quant
    # tables, i.e. inversely with quality (chroma DC at q=60 alone can
    # shift extreme colors ~14/channel on tiny images)
    assert err.mean() <= 10 + (100 - quality) * 0.25, (err.mean(), quality, sub)
    # truncation never raises; for BASELINE, cuts inside
    # headers/entropy are None and dropping only the EOI still decodes
    # (progressive truncation semantics — completed scans render — are
    # pinned separately in test_operators)
    cut = len(data) * (seed % 97) // 97
    got = decode_jpeg_pixels(data[:cut])
    if progressive is False:
        assert (got is None) == (cut < len(data) - 2), (cut, len(data))
