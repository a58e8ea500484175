"""HTML -> training-text extraction (operators/extraction.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zacks_estimates_financial_statements_spark.operators import extraction


def test_strip_html_tags_kitchen_sink(spark):
    html = ('<html><head><script>var a = "<p>not text</p>";</script>'
            '<style>.x { color: red }</style></head><body>'
            '<!-- comment with <b>markup</b> -->'
            '<P CLASS="big">Hello &amp; welcome to &lt;Spark&gt;,'
            '&nbsp;&quot;world&quot; &#39;ok&#39;</p>\n'
            '<br/><div>  spaced   out  </div></body></html>')
    df = spark.createDataFrame([(1, html)], ["i", "h"])
    got = df.select(extraction.strip_html_tags(F.col("h")).alias("t")) \
        .first().t
    assert got == 'Hello & welcome to <Spark>, "world" \'ok\' spaced out'


def test_extract_main_text_drops_chrome_keeps_content(spark):
    art = ("This is the first substantial paragraph of the article body "
           "carrying the actual content a training corpus wants.")
    art2 = ("A second long paragraph continues the story with more than "
            "enough characters to clear the minimum block threshold.")
    html = (
        '<html><body>'
        '<nav><a href="/">Home</a> <a href="/a">About</a> '
        '<a href="/c">Contact</a> <a href="/d">More</a></nav>'
        '<header><h1>Site Title Banner That Is Quite Long Indeed '
        'Truly</h1></header>'
        f'<article><p>{art}</p><p>{art2}</p>'
        '<p>short</p>'   # under min_block_chars -> dropped
        '<li><a href="/x">A menu item that is basically one long link '
        'with trailing words</a> tail</li>'   # link-dense -> dropped
        '</article>'
        '<footer>(c) 2026 footer boilerplate навигация legal text here '
        'long enough to pass length</footer>'
        '<script>tracking();</script>'
        '</body></html>')
    df = spark.createDataFrame([(1, html), (2, "<html><body></body></html>"),
                                (3, None)],
                               "doc_id: long, h: string")
    out = {r.doc_id: r for r in
           extraction.extract_main_text(df, "doc_id", "h").collect()}
    assert out[1].extract_error is None
    blocks = out[1].main_text.split("\n")
    assert blocks == [art, art2]
    assert out[1].n_blocks == 2
    assert out[1].total_chars == len(out[1].main_text)
    # chrome text never leaks
    assert "footer" not in out[1].main_text
    assert "Home" not in out[1].main_text
    assert "menu item" not in out[1].main_text
    # empty and NULL documents succeed with zero blocks
    assert out[2].main_text == "" and out[2].n_blocks == 0
    assert out[3].main_text == "" and out[3].extract_error is None


# ------------------------------------------------------------- link extraction

def test_extract_links_quotes_positions_and_scheme_gate(spark):
    from zacks_estimates_financial_statements_spark.operators import extraction
    page = ('<a href="https://a.com/1">x</a>'
            '<a href="mailto:u@v.w">m</a>'
            "<A title='t' HREF='HTTP://b.org/2/'>y</A>"
            '<a href="/relative">r</a>'
            '<a href="javascript:void(0)">j</a>')
    df = spark.createDataFrame([(1, page), (2, "<p>no links</p>"),
                                (3, None)],
                               "doc_id bigint, page string")
    out = extraction.extract_links(df, "doc_id", "page")
    rows = sorted((r["doc_id"], r["link_pos"], r["url"],
                   r["canonical_url"]) for r in out.collect())
    # doc 1: dq matches are [https://a.com/1, mailto(drop), /relative?
    # no - /relative IS dq pos 3 but dropped by the scheme gate,
    # javascript dq pos 4 dropped]; sq match HTTP://b.org/2/ is pos 5
    assert rows == [
        (1, 1, "https://a.com/1", "https://a.com/1"),
        (1, 5, "HTTP://b.org/2/", "http://b.org/2"),
    ]


def test_extract_links_attribute_name_boundary(spark):
    """Attribute names merely ENDING in 'href' (data-href, xhref) must
    NOT emit links; a real href after such an attribute still must."""
    from zacks_estimates_financial_statements_spark.operators import extraction
    page = ('<a data-href="https://fake.com/1">f</a>'
            '<a xhref="https://fake.com/2">f</a>'
            '<a data-href="https://fake.com/3" href="https://real.com/a">'
            "r</a>"
            "<a class='m' href='https://real.com/b'>r</a>"
            '<a href="https://real.com/c">r</a>')
    df = spark.createDataFrame([(1, page)], "doc_id bigint, page string")
    out = extraction.extract_links(df, "doc_id", "page",
                                   canonicalize=False)
    assert sorted(r["url"] for r in out.collect()) == [
        "https://real.com/a", "https://real.com/b", "https://real.com/c"]


def test_extract_links_no_canonical_column_when_disabled(spark):
    from zacks_estimates_financial_statements_spark.operators import extraction
    df = spark.createDataFrame(
        [(1, '<a href="https://x.io/p?utm_source=t&b=1">z</a>')],
        "doc_id bigint, page string")
    out = extraction.extract_links(df, "doc_id", "page",
                                   canonicalize=False)
    assert out.columns == ["doc_id", "link_pos", "url"]
    assert out.collect()[0]["url"] == "https://x.io/p?utm_source=t&b=1"


# ------------------------------------------------------------ table extraction

def test_extract_tables_positions_nesting_and_text(spark):
    from zacks_estimates_financial_statements_spark.operators import extraction
    page = ("<table><thead><tr><th> A </th><th>B</th></tr></thead>"
            "<tbody><tr><td>1</td><td><b>2</b>x</td></tr></tbody></table>"
            "<p>between</p>"
            "<table><tr><td>only</td>"
            "<td><table><tr><td>nested</td></tr></table></td></tr></table>")
    df = spark.createDataFrame([(1, page), (2, "<p>no tables</p>"),
                                (3, None)],
                               "doc_id bigint, page string")
    got = sorted((r["doc_id"], r["table_idx"], r["row_idx"],
                  r["col_idx"], r["cell"])
                 for r in extraction.extract_tables(
                     df, "doc_id", "page").collect())
    assert got == [
        (1, 1, 1, 1, "A"), (1, 1, 1, 2, "B"),       # thead th, trimmed
        (1, 1, 2, 1, "1"), (1, 1, 2, 2, "2x"),      # nested-inline text
        (1, 2, 1, 1, "only"),
        (1, 2, 1, 2, "nested"),  # outer cell text includes the inner
        (1, 3, 1, 1, "nested"),  # the nested table is its own table 3
    ]
