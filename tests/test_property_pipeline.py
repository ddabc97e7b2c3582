"""Property-based engine-vs-oracle equality: for ARBITRARY small doc
tables (random kinds incl. disallowed and mixed-case, random text incl.
CRLF/whitespace runs, good/corrupt/missing blobs, shuffled offsets), the
Spark pipeline must match corpus.reference_convert exactly under
(kind, text, media_ref, order) + status/txt/csv — not just on the
fixture generator's distribution."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pmocr_spark import codecs, corpus, pipeline
from pmocr_spark.operators import html_extract

KINDS = ["text", "TEXT", "tif", "TIF", "png", "pdf", "exe", "ZIP", "jpeg", None,
         "html", "HTM"]

text_st = st.text(
    alphabet=st.characters(min_codepoint=9, max_codepoint=126),
    max_size=60,
)

# "htmlbytes": media-labelled span whose blob is actually an HTML page —
# the fused UDF dispatches by CONTENT MAGIC, so it must extract (and the
# oracle must agree) even when the kind label says tif/png/pdf
span_st = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(KINDS),
        "text": text_st,
        "blob": st.sampled_from(["good", "corrupt", "truncated", "missing", "htmlbytes"]),
    }
)

doc_st = st.lists(span_st, min_size=0, max_size=5)  # min 0: empty docs must checkpoint too
corpus_st = st.lists(doc_st, min_size=1, max_size=4)


def _build_tables(doc_specs):
    docs, blobs = [], []
    for d, spans in enumerate(doc_specs):
        doc_id = f"h-{d}"
        rows = []
        for s, spec in enumerate(spans):
            kind = spec["kind"]
            if kind is not None and kind.lower() == "text":
                rows.append({"kind": kind, "text": spec["text"], "media_ref": None, "offset": s})
                continue
            ref = f"b:{doc_id}:{s}"
            if spec["blob"] != "missing":
                # disallowed (incl. NULL) kinds still get SOME blob bytes
                # on disk (the engine must skip them before ever touching
                # the content)
                lk = (kind or "").lower()
                enc_kind = lk if lk in codecs.MEDIA_KINDS else "tif"
                if lk in html_extract.HTML_KINDS or spec["blob"] == "htmlbytes":
                    # html route: good page, ascii-truncated page (the
                    # lenient parser still extracts), or html-magic bytes
                    # that are not valid UTF-8 (error-as-data both sides)
                    enc_kind = lk if lk in html_extract.HTML_KINDS else enc_kind
                    content = html_extract.wrap_boilerplate(
                        spec["text"], doc_id=len(blobs)
                    ).encode("utf-8")
                    if spec["blob"] == "corrupt":
                        content = b"<!DOCTYPE html>" + bytes([0xFF, 0xFE, 0x9C])
                    elif spec["blob"] == "truncated":
                        content = content[: max(15, len(content) // 2)]
                elif spec["blob"] == "corrupt":
                    content = codecs.encode_corrupt(ref)
                elif spec["blob"] == "htmlbytes":
                    raise AssertionError("unreachable")
                elif enc_kind == "pdf":
                    content = codecs.encode_pdf([spec["text"]], salt=ref)
                    if spec["blob"] == "truncated":
                        content = content[:12]
                else:
                    content = codecs.encode_image(spec["text"], enc_kind, salt=ref)
                    if spec["blob"] == "truncated":
                        content = content[: max(6, len(content) // 2)]
                blobs.append({"media_ref": ref, "kind": enc_kind, "content": content})
            rows.append({"kind": kind, "text": None, "media_ref": ref, "offset": s})
        # storage order must not matter — reverse it
        docs.append({"doc_id": doc_id, "spans": list(reversed(rows))})
    docs_t = pa.Table.from_pylist(docs, schema=corpus.DOCUMENTS_SCHEMA)
    blobs_t = pa.Table.from_pylist(blobs, schema=corpus.BLOBS_SCHEMA)
    return docs_t, blobs_t


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(doc_specs=corpus_st)
def test_engine_matches_oracle_on_arbitrary_corpora(spark, tmp_path_factory, doc_specs):
    docs_t, blobs_t = _build_tables(doc_specs)
    d = tmp_path_factory.mktemp("hyp")
    pq.write_table(docs_t, f"{d}/documents.parquet")
    pq.write_table(blobs_t, f"{d}/media_blobs.parquet")
    docs = spark.read.parquet(f"{d}/documents.parquet")
    blobs = spark.read.parquet(f"{d}/media_blobs.parquet")
    got = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in pipeline.run_batch(spark, docs, blobs).collect()
    }
    exp = corpus.reference_convert(docs_t, blobs_t)
    assert set(got) == set(exp)
    for doc_id, e in exp.items():
        g = got[doc_id]
        g_spans = [(s["order"], s["kind"], s["text"], s["media_ref"]) for s in g["spans"]]
        assert g_spans == e["spans"], doc_id
        assert g["status"] == e["status"], doc_id
        assert g["txt"] == e["txt"], doc_id
        assert g["csv"] == e["csv"], doc_id
        assert (g["error"] or None) == (e["error"] or None), doc_id
