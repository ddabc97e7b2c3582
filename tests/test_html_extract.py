"""HTML main-content extraction (operators/html_extract.py).

Covers: the wrap/extract roundtrip identity (the oracle lift behind
q39's html span), the DOM heuristics on template-free adversarial pages,
content-magic dispatch inside the fused pipeline UDF, raw-ingest of
.html files, and the end-to-end pipeline route (batch + engine seam).
"""

from __future__ import annotations

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pmocr_spark import codecs, pipeline, udfs
from pmocr_spark.operators import html_extract as hx

# payload domain = the pipeline's cleaned text: trimmed printable ASCII
_printable = st.text(alphabet=string.printable[:95], max_size=300).map(str.strip)


# ------------------------------------------------------------- roundtrip


@settings(max_examples=120, deadline=None)
@given(payload=_printable, template=st.integers(0, 2), doc_id=st.integers(0, 10**6))
def test_wrap_extract_roundtrip(payload, template, doc_id):
    """extract(wrap(x)) == x for any trimmed printable payload, all
    three boilerplate layouts — including empty payloads and payloads
    full of markup-looking text, quotes and entities."""
    page = hx.wrap_boilerplate(payload, doc_id=doc_id, template=template)
    assert hx.extract_main(page) == payload


def test_roundtrip_markup_and_entity_payloads():
    for p in (
        "5 < 6 > 3 & \"quoted\" 'single'",
        "<script>alert(1)</script>",
        "a  double  spaced;still&amp;here",
        "",
    ):
        for t in range(3):
            assert hx.extract_main(hx.wrap_boilerplate(p, 3, t)) == p


# ------------------------------------------------- heuristics, template-free


def test_density_beats_link_menus_without_hints():
    """No semantic tags, no class hints: prose must win on text/link
    density alone (the boilerpipe core signal)."""
    prose = (
        "The quick brown fox jumps over the lazy dog. It was the best of "
        "times, it was the worst of times. Genuine long-form prose with an "
        "inline <a href='/ref'>reference</a> a reader came for."
    )
    page = (
        "<html><body>"
        "<div><a href='/a'>Home</a> <a href='/b'>Shop</a> <a href='/c'>Contact</a></div>"
        f"<div><p>{prose}</p></div>"
        "<div><a href='/t'>Terms</a> <a href='/p'>Privacy</a></div>"
        "</body></html>"
    )
    out = hx.extract_main(page)
    assert out.startswith("The quick brown fox") and "reference" in out
    assert "Home" not in out and "Terms" not in out


def test_excluded_elements_never_leak():
    page = (
        "<html><head><title>T</title><style>p{x}</style></head><body>"
        "<script>var secret='SCRIPT';</script>"
        "<nav>NAVTEXT</nav><header>HEAD</header>"
        "<p>visible content here</p>"
        "<footer>FOOT</footer><aside>ASIDE</aside></body></html>"
    )
    out = hx.extract_main(page)
    assert out == "visible content here"
    for leak in ("SCRIPT", "NAVTEXT", "HEAD", "FOOT", "ASIDE", "T"):
        assert leak not in out


def test_negative_hints_demote_comments_and_sidebars():
    page = (
        "<html><body>"
        "<div class='sidebar'>A quite long advertising sidebar paragraph "
        "that would otherwise win on raw length alone against short posts.</div>"
        "<div><p>Short real article text.</p></div>"
        "</body></html>"
    )
    assert hx.extract_main(page) == "Short real article text."


def test_multi_paragraph_container_joined_in_order():
    page = (
        "<html><body><article>"
        "<p>First paragraph of the story.</p>"
        "<p>Second paragraph, still the story.</p>"
        "</article>"
        "<div class='comments'><div class='comment'>hot take <a href='#'>reply</a></div></div>"
        "</body></html>"
    )
    assert hx.extract_main(page) == (
        "First paragraph of the story.\nSecond paragraph, still the story."
    )


def test_empty_block_bonus_not_inflated_by_interrupts():
    """The empty-paragraph bonus is granted once per real block close;
    a textless <p> stuffed with nested excluded elements must not
    out-score genuine content elsewhere."""
    hollow = "<p>" + "<nav></nav>" * 20 + "</p>"
    page = (
        "<html><body>"
        f"<div class='wrap'>{hollow}</div>"
        "<div><p>short real text</p></div>"
        "</body></html>"
    )
    assert hx.extract_main(page) == "short real text"


def test_fragment_interrupts_award_no_per_fragment_bonus():
    """A paragraph fragmented by excluded elements accrues the close-time
    paragraph bonus ONCE — penalized boilerplate stuffed with short text
    fragments around excluded elements must not out-score genuine
    content through per-interrupt bonuses (40 fragments would otherwise
    collect 40 bonuses and win here)."""
    frag = "<div class='comments'><p>" + "x<nav></nav>" * 40 + "</p></div>"
    page = f"<html><body>{frag}<div><p>ok here</p></div></body></html>"
    assert hx.extract_main(page) == "ok here"


def test_anchor_depth_survives_excluded_nested_anchors():
    """An </a> inside an excluded region never had its open counted, so
    it must not close an OUTER anchor: text after the excluded region is
    still link text and the link-heavy block scores ~0."""
    page = (
        "<html><body>"
        "<div><a href='/s'>Shop<nav><a href='/m'>m</a></nav>"
        "BUY NOW CLICK HERE GREAT DEALS TODAY</a></div>"
        "<div><p>genuine prose.</p></div>"
        "</body></html>"
    )
    assert hx.extract_main(page) == "genuine prose."


def test_br_contributes_a_line_break():
    page = (
        "<html><body><p>first line<br>second line<br/>third line</p>"
        "<div class='menu'><a href='/'>Home</a></div></body></html>"
    )
    assert hx.extract_main(page) == "first line\nsecond line\nthird line"


def test_malformed_html_never_raises():
    for page in (
        "<html><body><p>unclosed everywhere<div><td>stray",
        "</p></div>only closes</body>",
        "<html><body><p>a<p>b<p>c",
        "plain text, no tags at all",
        "",
    ):
        hx.extract_main(page)  # must not raise


# ------------------------------------------------------ magic + UDF route


def test_sniff_is_content_based():
    assert hx.sniff_html(b"<!DOCTYPE html><html>...")
    assert hx.sniff_html(b"  \n\t<HTML><body>")
    assert not hx.sniff_html(codecs.encode_image("x", "tif", salt="s"))
    assert not hx.sniff_html(b"")
    assert not hx.sniff_html(None)


def test_sniff_skips_bom_prolog_and_comments():
    """Saved pages front-load BOMs, XML prologs (XHTML) and license/
    generator comments before the doctype; the magic probe must see
    through all of them — and still reject non-html with the same
    prefixes."""
    page = hx.wrap_boilerplate("x", 0).encode()
    assert hx.sniff_html(b"\xef\xbb\xbf" + page)
    assert hx.sniff_html(b"<?xml version='1.0' encoding='utf-8'?>\n<!DOCTYPE html><html/>")
    assert hx.sniff_html(b"<!-- saved from url=(0042)https://example.com -->\n<!DOCTYPE html>")
    assert hx.sniff_html(b"\xef\xbb\xbf<!--a-->\n<!--b--><HTML><body>")
    assert not hx.sniff_html(b'\xef\xbb\xbf{"json": true}')
    assert not hx.sniff_html(b"<?xml version='1.0'?><svg xmlns='http://www.w3.org/2000/svg'/>")
    assert not hx.sniff_html(b"<!-- comment --><rss version='2.0'>")


def test_fused_udf_routes_html_and_media_by_magic(spark):
    """One UDF, two routes: html blobs -> extractor, media blobs ->
    codec, bad utf-8 html -> error-as-data (no batch failure)."""
    rows = [
        ("h", hx.wrap_boilerplate("from html", 1).encode()),
        ("m", codecs.encode_image("from media", "png", salt="u")),
        ("bad", b"<!DOCTYPE html>" + bytes([0xFF, 0xFE, 0x9C])),
    ]
    df = spark.createDataFrame(rows, "ref string, content binary")
    out = {
        r["ref"]: (r["ocr"]["text"], r["ocr"]["error"])
        for r in df.withColumn("ocr", udfs.ocr_extract(F.col("content"))).collect()
    }
    assert out["h"] == ("from html", None)
    assert out["m"] == ("from media", None)
    assert out["bad"][0] is None and "UnicodeDecodeError" in out["bad"][1]


def test_engine_seam_only_sees_media_bytes(spark):
    """Under a custom engine the html route still works and the engine
    decode_fn is never handed html bytes."""

    def loud_engine(blob: bytes) -> str:
        assert not hx.sniff_html(blob), "engine must not receive html blobs"
        return "ENGINE:" + codecs.decode_blob(blob)

    udf = udfs.make_ocr_extract(decode_fn=loud_engine)
    rows = [
        ("h", hx.wrap_boilerplate("stripped", 2).encode()),
        ("m", codecs.encode_image("scanned", "tif", salt="e")),
    ]
    df = spark.createDataFrame(rows, "ref string, content binary")
    out = {
        r["ref"]: r["ocr"]["text"]
        for r in df.withColumn("ocr", udf(F.col("content"))).collect()
    }
    assert out == {"h": "stripped", "m": "ENGINE:scanned"}


# --------------------------------------------------------- pipeline route


def test_pipeline_html_kind_end_to_end(spark):
    """Interleaved doc with text + media + html spans through run_batch:
    allow-list admits html/htm (case-insensitive), reassembly interleaves
    all three routes by offset, status/counts clean."""
    payload = "main content of the page"
    docs = spark.createDataFrame(
        [
            (
                "d1",
                [
                    ("text", "plain text span", None, 0),
                    ("HTM", None, "h:1", 1),  # upper-case kind normalized
                    ("tif", None, "m:1", 2),
                ],
            )
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    blobs = spark.createDataFrame(
        [
            ("h:1", "htm", hx.wrap_boilerplate(payload, 5).encode()),
            ("m:1", "tif", codecs.encode_image("ocr text", "tif", salt="p")),
        ],
        "media_ref string, kind string, content binary",
    )
    row = pipeline.run_batch(spark, docs, blobs).collect()[0]
    assert row["status"] == "done"
    assert row["span_count"] == 3 and row["error_count"] == 0
    assert row["txt"] == f"plain text span\n{payload}\nocr text"
    kinds = [s["kind"] for s in row["spans"]]
    assert kinds == ["text", "text", "text"]  # all resolved to text spans


def test_raw_ingest_picks_up_html_files(spark, tmp_path):
    """S1 raw-directory ingest lists .html/.HTM alongside media files and
    the lifted docs flow through the html route."""
    from pmocr_spark.sources import binary

    (tmp_path / "page.html").write_bytes(hx.wrap_boilerplate("web page body", 9).encode())
    (tmp_path / "UPPER.HTM").write_bytes(hx.wrap_boilerplate("upper case too", 4).encode())
    (tmp_path / "scan.tif").write_bytes(codecs.encode_image("tif text", "tif", salt="r"))
    (tmp_path / "skip.docx").write_bytes(b"not ingested")

    blobs = binary.read_media_dir(spark, str(tmp_path))
    assert sorted(r["kind"] for r in blobs.select("kind").collect()) == [
        "htm",
        "html",
        "tif",
    ]
    docs = binary.lift_to_documents(blobs)
    out = pipeline.run_batch(spark, docs, blobs)
    texts = {r["doc_id"].rsplit("/", 1)[-1]: r["txt"] for r in out.collect()}
    assert texts["page.html"] == "web page body"
    assert texts["UPPER.HTM"] == "upper case too"
    assert texts["scan.tif"] == "tif text"


def test_reference_convert_mirrors_html_route():
    """The pure-python oracle (corpus.reference_convert) applies the same
    content-magic dispatch as the fused UDF."""
    import pyarrow as pa

    from pmocr_spark import corpus

    docs = pa.table(
        {
            "doc_id": ["d1"],
            "spans": [
                [
                    {"kind": "html", "text": None, "media_ref": "h:1", "offset": 0},
                    {"kind": "text", "text": "tail", "media_ref": None, "offset": 1},
                ]
            ],
        }
    )
    blobs = pa.table(
        {
            "media_ref": ["h:1"],
            "kind": ["html"],
            "content": [hx.wrap_boilerplate("oracle side", 2).encode()],
        }
    )
    ref = corpus.reference_convert(docs, blobs)
    assert ref["d1"]["status"] == "done"
    assert ref["d1"]["txt"] == "oracle side\ntail"


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))


# ------------------------------------------------- markdown conversion


def test_markdown_structural_elements():
    from pmocr_spark.operators.html_extract import to_markdown

    h = (
        "<html><body><h1>Title Here</h1><p>a <b>bold</b> and <i>it</i> "
        'and <code>c()</code> <a href="/x">link</a></p>'
        "<ul><li>one</li><li>two</li></ul>"
        "<ol><li>first</li><li>second</li></ol>"
        "<blockquote><p>wisdom</p></blockquote>"
        "<pre>raw  spaces\nkept</pre></body></html>"
    )
    assert to_markdown(h) == (
        "# Title Here\n\n"
        "a **bold** and *it* and `c()` [link](/x)\n\n"
        "- one\n- two\n\n"
        "1. first\n2. second\n\n"
        "> wisdom\n\n"
        "```\nraw  spaces\nkept\n```"
    )


def test_markdown_table_and_exclusions():
    from pmocr_spark.operators.html_extract import to_markdown

    h = (
        "<body><nav><a href='/'>Home</a></nav>"
        "<script>var x=1;</script>"
        "<table><tr><th>A</th><th>B</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table></body>"
    )
    assert to_markdown(h) == "| A | B |\n| --- | --- |\n| 1 | 2 |"


def test_markdown_nested_list_indents():
    from pmocr_spark.operators.html_extract import to_markdown

    h = "<ul><li>a<ul><li>a1</li><li>a2</li></ul></li><li>b</li></ul>"
    assert to_markdown(h) == "- a\n  - a1\n  - a2\n- b"


def test_markdown_whitespace_collapse_and_entities():
    from pmocr_spark.operators.html_extract import to_markdown

    assert to_markdown("<p>a\n   b &amp; c</p>") == "a b & c"


def test_markdown_malformed_never_raises():
    from pmocr_spark.operators.html_extract import to_markdown

    for h in ("<b>unclosed", "</p>stray", "<table><td>x", "", "<ul><li>",
              "<a href=>t</a>", "<h3>h"):
        to_markdown(h)  # must not raise


def test_markdown_heading_close_flushes():
    from pmocr_spark.operators.html_extract import to_markdown

    # unclosed heading at EOF still renders as a plain block (tolerant),
    # closed heading renders with the hash prefix
    assert to_markdown("<h2>two words</h2>") == "## two words"


def test_extract_tables_structured():
    from pmocr_spark.operators.html_extract import extract_tables

    h = (
        "<table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr>"
        "</table><p>x</p><table><tr><td>only</td></tr></table>"
    )
    assert extract_tables(h) == [[["h1", "h2"], ["a", "b"]], [["only"]]]


def test_extract_tables_cell_structure_flattens():
    from pmocr_spark.operators.html_extract import extract_tables

    h = "<table><tr><td><b>bold</b> text<br>next</td></tr></table>"
    assert extract_tables(h) == [[["bold text next"]]]
