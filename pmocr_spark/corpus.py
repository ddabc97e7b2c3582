"""Deterministic synthetic corpus generator (fixture archetypes A1-A7).

Produces the graft input tables (FIXTURES.md §1):

  documents(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)
  media_blobs(media_ref: string, kind: string, content: binary)

mirroring the reference's test corpus (/root/reference/dev/tests/source/:
lorem tif, png, image-PDF, searchable-PDF — run_tests.sh:31-34), plus the
skew (A5) and poison-pill (A6) archetypes the BASELINE north rule demands
and a two-column page-layout archetype (A7: every 5th image blob renders
its text as side-by-side column blocks; the decode-side layout analysis
must restore reading order, north-star "page-layout segmentation").
All randomness is seeded; no wall clock anywhere (SURVEY.md §7.4.3).
Written as parquet via pyarrow so generation needs no Spark session.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import codecs
from .operators import html_extract

WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo "
    "consequat duis aute irure in reprehenderit voluptate velit esse cillum "
    "fugiat nulla pariatur excepteur sint occaecat cupidatat non proident"
).split()

SPAN_SCHEMA = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOCUMENTS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_SCHEMA))])
BLOBS_SCHEMA = pa.schema(
    [("media_ref", pa.string()), ("kind", pa.string()), ("content", pa.binary())]
)

# archetype cycle: A1 tif, A2 png, A3 image-pdf, A4 interleaved, A6 poison
# (A5 heavy docs injected every `heavy_every` docs)
_IMG_KINDS_CYCLE = ("tif", "tiff", "png", "jpg", "jpeg", "bmp", "pcx", "dcx")


def _lorem(rng: np.random.Generator, n_words: int, wide_spaces: bool) -> str:
    """Seeded lorem text; some runs of >=2 spaces to exercise the CSV hack."""
    words = [WORDS[i] for i in rng.integers(0, len(WORDS), size=n_words)]
    parts = []
    for i, w in enumerate(words):
        if i:
            if wide_spaces and rng.random() < 0.15:
                parts.append(" " * int(rng.integers(2, 5)))
            else:
                parts.append(" ")
        parts.append(w)
        if i and i % 8 == 0 and i < n_words - 1:
            parts.append("\n")
            parts.append("")  # next word starts the line
    text = "".join(parts).replace("\n ", "\n")
    # media glyph text must not have blank first/last lines (codec layout)
    return text.strip("\n")


def generate(
    n_docs: int = 200,
    seed: int = 42,
    heavy_every: int = 97,
    heavy_spans: int = 120,
    poison_every: int = 53,
) -> tuple[pa.Table, pa.Table]:
    """Build (documents, media_blobs) arrow tables, fully deterministic."""
    rng = np.random.default_rng(seed)
    docs = []
    blobs = []

    def add_blob(
        doc_id: str, idx: int, kind: str, text: str, corrupt: bool = False, columns: bool = False
    ) -> str:
        ref = f"blob:{doc_id}:{idx}"
        if corrupt:
            content = codecs.encode_corrupt(ref)
        elif kind == "pdf":
            # multi-page: split text into 1-3 pages
            lines = text.split("\n")
            n_pages = min(len(lines), int(rng.integers(1, 4)))
            chunks = ["\n".join(c) for c in np.array_split(np.array(lines, dtype=object), n_pages)]
            pages: list[str | list[str]] = list(chunks)
            if columns:
                # A7 for PDFs: the LAST page renders two-column when it
                # has >= 2 lines (mixed-layout document: single-column
                # front pages, two-column back page) — same logical text
                clines = chunks[-1].split("\n")
                if len(clines) >= 2:
                    mid = (len(clines) + 1) // 2
                    pages[-1] = ["\n".join(clines[:mid]), "\n".join(clines[mid:])]
            content = codecs.encode_pdf(pages, salt=ref)
        elif columns and "\n" in text:
            # A7 two-column layout: SAME logical text, rendered as two
            # side-by-side column blocks (top half left, bottom half
            # right) — the decode side's layout-analysis stage must
            # reassemble reading order, so decode_blob(blob) == text and
            # every downstream expectation is unchanged. Gated on doc/
            # span indices only: no rng draw, the corpus stream for all
            # other fixtures is byte-identical to pre-A7 builds.
            lines = text.split("\n")
            mid = (len(lines) + 1) // 2
            content = codecs.encode_image_columns(
                ["\n".join(lines[:mid]), "\n".join(lines[mid:])], kind, salt=ref
            )
        else:
            content = codecs.encode_image(text, kind, salt=ref)
        blobs.append({"media_ref": ref, "kind": kind, "content": content})
        return ref

    for d in range(n_docs):
        doc_id = f"doc-{d:07d}"
        spans = []
        is_heavy = heavy_every and d > 0 and d % heavy_every == 0  # A5
        is_poison = poison_every and d > 0 and d % poison_every == 0 and not is_heavy  # A6
        archetype = d % 4

        if is_heavy:
            n_spans = heavy_spans
        else:
            n_spans = int(rng.integers(1, 7))

        for s in range(n_spans):
            text = _lorem(rng, int(rng.integers(6, 30)), wide_spaces=True)
            if archetype == 3 and s % 2 == 0:
                # A4 interleaved: alternating text spans (searchable-PDF analog)
                spans.append({"kind": "text", "text": text, "media_ref": None, "offset": s})
            else:
                kind = (
                    "pdf"
                    if archetype == 2
                    else _IMG_KINDS_CYCLE[(d + s) % len(_IMG_KINDS_CYCLE)]
                )
                corrupt = is_poison and s == n_spans - 1
                # A7 stride: index arithmetic only — a rng draw here would
                # shift every downstream fixture
                ref = add_blob(
                    doc_id, s, kind, text, corrupt=corrupt, columns=(d + s) % 5 == 1
                )
                spans.append({"kind": kind, "text": None, "media_ref": ref, "offset": s})

        # shuffle span order in storage — output order must come from `offset`,
        # never from array/partition order (SURVEY.md §7.4.1)
        perm = rng.permutation(len(spans))
        docs.append({"doc_id": doc_id, "spans": [spans[i] for i in perm]})

    documents = pa.Table.from_pylist(docs, schema=DOCUMENTS_SCHEMA)
    media_blobs = pa.Table.from_pylist(blobs, schema=BLOBS_SCHEMA)
    return documents, media_blobs


def write(out_dir: str, n_docs: int = 200, seed: int = 42, **kw) -> None:
    import os

    os.makedirs(out_dir, exist_ok=True)
    documents, media_blobs = generate(n_docs=n_docs, seed=seed, **kw)
    _write_tables(out_dir, documents, media_blobs)


# Parquet row groups are Spark's split granularity: the pyarrow default
# (1M rows/group) would make a 1.2M-row blob table just 2 splits — the
# whole decode stage then runs on 2 cores no matter the cluster size.
# ~10k blob rows ≈ 17MB groups keep scan tasks core-sized.
_ROW_GROUP_ROWS = 10_000


def _write_tables(out_dir: str, documents: pa.Table, media_blobs: pa.Table) -> None:
    pq.write_table(documents, f"{out_dir}/documents.parquet", row_group_size=_ROW_GROUP_ROWS)
    pq.write_table(media_blobs, f"{out_dir}/media_blobs.parquet", row_group_size=_ROW_GROUP_ROWS)


def replicate(documents: pa.Table, media_blobs: pa.Table, times: int) -> tuple[pa.Table, pa.Table]:
    """Tile a base corpus `times`x with disjoint doc_ids/media_refs.

    Benchmark-scale corpora: generation cost is per-base-doc, while the
    engine still does full, real decode work per replica row (every blob
    row decodes independently on the executors — nothing caches across
    replicas). Ids get an `r{k}~` prefix so resume/lineage semantics see
    genuinely distinct documents.

    Implemented with pyarrow compute (no python row loop): blob content
    buffers are reused zero-copy across replicas; only the id columns
    are rewritten per replica.
    """
    import pyarrow.compute as pc

    def prefixed(col: pa.ChunkedArray | pa.Array, prefix: str) -> pa.Array:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return pc.binary_join_element_wise(
            pa.array([prefix] * len(arr), type=pa.string()), arr, "", null_handling="emit_null"
        )

    doc_parts, blob_parts = [], []
    spans_col = documents.column("spans").combine_chunks()
    struct_arr = spans_col.values  # StructArray of span structs
    kinds = struct_arr.field("kind")
    texts = struct_arr.field("text")
    refs = struct_arr.field("media_ref")
    offsets_col = struct_arr.field("offset")
    list_offsets = spans_col.offsets

    for k in range(times):
        p = f"r{k}~"
        new_doc_id = prefixed(documents.column("doc_id"), p)
        new_refs = prefixed(refs, p)
        new_struct = pa.StructArray.from_arrays(
            [kinds, texts, new_refs, offsets_col], fields=list(SPAN_SCHEMA)
        )
        new_spans = pa.ListArray.from_arrays(list_offsets, new_struct)
        doc_parts.append(
            pa.table({"doc_id": new_doc_id, "spans": new_spans}, schema=DOCUMENTS_SCHEMA)
        )
        blob_parts.append(
            pa.table(
                {
                    "media_ref": prefixed(media_blobs.column("media_ref"), p),
                    "kind": media_blobs.column("kind"),
                    "content": media_blobs.column("content"),
                },
                schema=BLOBS_SCHEMA,
            )
        )
    return pa.concat_tables(doc_parts), pa.concat_tables(blob_parts)


def write_replicated(
    out_dir: str, base_docs: int = 3000, times: int = 20, seed: int = 42, **kw
) -> int:
    """Write a replicated bench corpus; returns total doc count."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    documents, media_blobs = generate(n_docs=base_docs, seed=seed, **kw)
    documents, media_blobs = replicate(documents, media_blobs, times)
    _write_tables(out_dir, documents, media_blobs)
    return documents.num_rows


# ------------------------------------------------- reference converter

def reference_convert(documents: pa.Table, media_blobs: pa.Table) -> dict:
    """Single-threaded pure-python oracle (FIXTURES.md §2).

    Returns {doc_id: {"status": 'done'|'failed', "error": str|None,
                      "spans": [(order, kind, text, media_ref)],
                      "txt": str, "csv": str}}
    The Spark pipeline must match this exactly under
    (kind, text, media_ref, order) — the BASELINE equality invariant.
    """
    blob_by_ref = {
        r["media_ref"]: r["content"] for r in media_blobs.to_pylist()
    }
    allowed = (
        set(codecs.MEDIA_KINDS) | set(html_extract.HTML_KINDS)
        | set(codecs.AUDIO_KINDS) | set(codecs.VIDEO_KINDS) | {"text"}
    )
    out = {}
    for row in documents.to_pylist():
        doc_id = row["doc_id"]
        spans = sorted(row["spans"] or [], key=lambda s: s["offset"])
        result_spans = []
        error = None
        if not spans:
            # engine mirror: an empty doc flows as one 'skipped'
            # pseudo-span at offset 0 (explode_outer) so it checkpoints
            result_spans = [(0, "skipped", None, None)]
        for order, s in enumerate(spans):
            kind = (s["kind"] or "").lower()  # engine normalizes kind once
            if kind not in allowed:
                # F1 allow-list mirror: disallowed kinds are retained as
                # 'skipped' spans (no text, no error) — same as the engine
                result_spans.append((order, "skipped", None, s["media_ref"]))
            elif kind == "text":
                result_spans.append((order, "text", codecs.normalize_text(s["text"]), None))
            else:
                blob = blob_by_ref.get(s["media_ref"])
                try:
                    if blob is None:
                        raise codecs.CodecError("null media content (missing blob)")
                    # same content-magic dispatch as the fused UDF
                    # (udfs.make_ocr_extract): html blobs -> extractor
                    if html_extract.sniff_html(blob):
                        text = html_extract.extract_main_blob(blob)
                    else:
                        text = codecs.decode_blob(blob)
                except Exception as e:  # same exception surface as the UDF
                    # first-by-offset error convention (engine: F.get(..., 0))
                    if error is None:
                        error = f"{type(e).__name__}: {e}"
                    result_spans.append((order, "error", None, s["media_ref"]))
                    continue
                result_spans.append((order, "text", text, s["media_ref"]))
        all_skipped = bool(result_spans) and all(k == "skipped" for (_, k, _, _) in result_spans)
        status = "failed" if error else ("skipped" if all_skipped else "done")
        txt = "\n".join(t for (_, k, t, _) in result_spans if k == "text")
        out[doc_id] = {
            "status": status,
            "error": error,
            "spans": result_spans,
            "txt": txt,
            "csv": codecs.csv_hack(txt),
        }
    return out
