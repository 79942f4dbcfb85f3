"""Differential tests for the JVM link-pipeline fast path
(udfs.with_found_links): wherever the guards accept, the result must be
byte-identical to the pandas UDF (whose own layered fast paths are in turn
differential-tested against the golden urllib/html.parser semantics in
test_functions_urls.py / test_functions_html.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_german_localpoliticans_spark.functions import udfs

# (page_url, html) pairs: the top rows exercise the accept grammar, the
# rest each target one decline guard (entity, case, span, anchor shape,
# href canonicality, NUL, malformed UTF-8, ...)
EDGE_ROWS = [
    (
        "https://a.de/p/",
        '<html><head><title>T</title><script>var x=1;</script></head>'
        '<body><p>w</p><a href="/seite/1">l</a><a href="https://b.de/x">m</a></body></html>',
    ),
    ("https://a.de/p/", '<a href="/x">1</a><a href="/x">2</a><a href="/a">3</a>'),
    ("https://a.de/p/", "plain text no links"),
    ("https://a.de/p/", '<a href="/x">t</a><style>.c{}</style>'),
    ("https://a.de/p/", '<a href="/a">1</a><a href="/b">2</a><a href="https://c.de/z">3</a>'),
    ("https://a.de/p/", '<a href="/a//b">mid-dblslash ok</a>'),
    ("https://a.de/p/", "trailing opener <a"),
    ("https://a.de/p/", "<ab>not an anchor</ab><a href=\"/x\">x</a>"),
    # decline guards
    ("https://a.de/p/", "<p>a &amp; b</p><a href=\"/x\">l</a>"),
    ("https://a.de/p/", "<A HREF=\"/x\">upper</A>"),
    ("https://a.de/p/", '<a href="../rel">r</a>'),
    ("https://a.de/p/", '<a href="//proto.de/x">r</a>'),
    ("https://a.de/p/", '<a href="/x#f">f</a>'),
    ("https://a.de/p/", '<a href="/x?q=1">q</a>'),
    ("https://a.de/p/", '<a class="c" href="/x">attr</a>'),
    ("https://a.de/p/", "<script>if(a</b){}</script><a href=\"/x\">s</a>"),
    ("https://a.de/p/", '<a href="/a/../b">dot</a>'),
    ("https://a.de/p/", None),
    ("https://a.de/p/", '<a href="HTTP://B.DE/x">up</a>'),
    ("https://a.de/p/", '<a\xa0href="/x">nbsp-opener</a><a href="/y">y</a>'),
    ("https://a.de", '<a href="/x">page url without path</a>'),
    ("https://a.de/p/", '<a href="http://b.de:80/x">port</a>'),
    ("https://a.de/p/", '<a href="https://b.de/ü">unicode path</a>'),
    ("https://a.de/p/", "<a href='/x'>single quotes</a>"),
    ("https://a.de/p/", '<a href="">empty</a>'),
    ("https://a.de/p/", '<a href=" /x">leading space</a>'),
    ("https://a.de/p/", 'über <a href="/x">unicode text ok</a>'),
    ("https://a.de/p/", '<a href="/x\x00y">nul in href</a>'),
    ("https://a.de/p/", '<a href="/a;">semicolon href declines</a>'),
    ("https://a.de/p/", '<a href="https://b.de/;">abs semicolon declines</a>'),
    ("https://a.de/p/", "<script>x<</script><a href=\"/x\">span ends with lt</a>"),
    ("https://a.de/p/", "<script>if (x<Y) {}</script><a href=\"/x\">upper in span</a>"),
    ("https://a.de/p/", "<style><a href=\"/hidden\"></style><a href=\"/x\">anchor in span</a>"),
    ("https://a.de/p/", "<script>no terminator <a href=\"/x\">y</a>"),
    ("https://a.de/p/", "<scriptx>t</scriptx><a href=\"/x\">prefix tag</a>"),
    ("https://a.de/p/", "<script><script></script><a href=\"/x\">nested open</a>"),
    ("https://a.de/p/", "<script>x</style>y</script><a href=\"/x\">cross close</a>"),
]


def _diff_frame(spark, rows):
    df = spark.createDataFrame(
        [(u, h.encode() if isinstance(h, str) else h) for u, h in rows],
        "url string, html binary",
    )
    return udfs.with_found_links(df, "url", "html", "jvm").withColumn(
        "py", udfs.found_links(F.col("url"), F.col("html"))
    )


def test_with_found_links_edges_match_pandas(spark):
    out = _diff_frame(spark, EDGE_ROWS)
    bad = out.where(~F.col("jvm").eqNullSafe(F.col("py"))).collect()
    assert bad == [], [(bytes(r.html or b""), r.jvm, r.py) for r in bad]


def test_with_found_links_malformed_utf8_declines_to_python(spark):
    df = spark.createDataFrame(
        [("https://a.de/p/", b'<a href="/x">\xff\xfe</a>')], "url string, html binary"
    )
    out = udfs.with_found_links(df, "url", "html", "jvm").withColumn(
        "py", udfs.found_links(F.col("url"), F.col("html"))
    )
    row = out.collect()[0]
    assert row.jvm == row.py == ["https://a.de/x"]


def test_with_found_links_corpus_differential(spark):
    """Every derived-corpus page (script spans, absolute hot links, slugged
    paths) must agree byte-for-byte with the pandas pipeline."""
    from crawler_german_localpoliticans_spark.sources.webcorpus import (
        corpus_from_documents,
    )

    pages, _, _ = corpus_from_documents(spark, "/root/testdata/sf0.001")
    out = udfs.with_found_links(pages, "url", "html", "jvm").withColumn(
        "py", udfs.found_links(F.col("url"), F.col("html"))
    )
    assert out.where(~F.col("jvm").eqNullSafe(F.col("py"))).count() == 0


def test_with_found_links_corpus_takes_jvm_branch(spark, monkeypatch):
    """Prove the guards ACCEPT every corpus page (the differential test
    would be vacuously green if everything declined to the fallback):
    sabotage the pandas UDF with a sentinel for any NON-null html — if any
    row reached the fallback with real bytes, the sentinel would surface."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from crawler_german_localpoliticans_spark.functions import udfs as udfs_mod
    from crawler_german_localpoliticans_spark.sources.webcorpus import (
        corpus_from_documents,
    )

    @pandas_udf(T.ArrayType(T.StringType()))
    def sentinel_links(page_urls, htmls):
        return pd.Series(
            [[] if h is None else ["__FELL_BACK__"] for h in htmls]
        )

    monkeypatch.setattr(udfs_mod, "found_links", sentinel_links)
    pages, _, _ = corpus_from_documents(spark, "/root/testdata/sf0.001")
    out = udfs_mod.with_found_links(pages, "url", "html", "fl")
    n = pages.count()
    assert n > 0
    assert out.where(F.array_contains("fl", "__FELL_BACK__")).count() == 0
    # and the JVM branch produced real links on every page
    assert out.where(F.size("fl") > 0).count() == n


def test_with_found_links_markup_soup_differential(spark):
    """Seeded random markup soup (fragment shuffle, one Spark job): the
    hybrid must agree with the pandas pipeline on every document, whichever
    branch each takes."""
    import random

    frags = [
        "<p>wort</p>", "<div>", "</div>", '<a href="/x">l</a>',
        '<a href="/seite/9-rathaus">r</a>', '<a href="https://b.de/y">m</a>',
        "<script>var x = 1;</script>", "<style>.c{}</style>",
        "<script>bad </ inside</script>", "&amp;", "<br>", "<B>U</B>",
        "text stück ", "<!-- c -->", '<a href="../up">u</a>',
        '<a href="//p.de/z">p</a>', '<a href="/a;">semi</a>',
        '<a href="">e</a>', "<a", " < b ", 'href="/nope"',
        '<a href="/x?q=1">q</a>', '<a href="/x#f">f</a>', "\xa0", "\t\n",
    ]
    rng = random.Random(42)
    docs = [
        "".join(rng.choice(frags) for _ in range(rng.randint(0, 8)))
        for _ in range(300)
    ]
    rows = [(f"https://host{i % 7}.beispiel.de/seite/{i}", d.encode()) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = udfs.with_found_links(df, "url", "html", "jvm").withColumn(
        "py", udfs.found_links(F.col("url"), F.col("html"))
    )
    bad = out.where(~F.col("jvm").eqNullSafe(F.col("py"))).collect()
    assert bad == [], [(bytes(r.html), r.jvm, r.py) for r in bad[:5]]


def test_with_found_links_plan_single_evaluation(spark):
    """The optimized plan must evaluate each heavy pass exactly once: one
    decode, one extract_all, and the python UDF must receive the null-html
    gate (no raw html column as a UDF argument)."""
    df = spark.createDataFrame(
        [("https://a.de/p/", b'<a href="/x">l</a>')], "url string, html binary"
    )
    out = udfs.with_found_links(df, "url", "html", "fl").select("url", "fl")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("decode(") == 1, plan
    assert plan.count("regexp_extract_all(") == 1, plan
    assert "found_links(url" in plan and "CASE WHEN NOT _fl_elig" in plan, plan
