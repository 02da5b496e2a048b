"""Real-file folder ingestion (S1/S2) + per-file markdown sink (S5).

Covers: priority-ordered discovery (reference folder_processor.py:44-50),
pages-schema projection, end-to-end parity with extract_document over the
same bytes, resumable .md sink, empty-folder composition.
"""

from __future__ import annotations

import io
import os
import zipfile

import pyarrow as pa
import pytest

from full_text_extractor_v6_ray.config import DEFAULT_CONFIG
from full_text_extractor_v6_ray.extractor.document import extract_document
from full_text_extractor_v6_ray.sources.folder import (
    discover_files, file_priority, folder_pipeline, markdown_name,
    read_folder, write_markdown_tree,
)
from full_text_extractor_v6_ray.sources.pages_gen import PAGES_SCHEMA, _mk_pdf

HTML = (b"<!doctype html><html><body><h1>Folder Title</h1>"
        b"<p>A real paragraph of text content that should be extracted "
        b"whole and verbatim by the block scorer without being dropped "
        b"for being too short or too linky.</p></body></html>")


def _docx_bytes(text: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr(
            "word/document.xml",
            '<?xml version="1.0"?><w:document '
            'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
            f"<w:body><w:p><w:r><w:t>{text}</w:t></w:r></w:p></w:body></w:document>",
        )
    return buf.getvalue()


@pytest.fixture()
def corpus_dir(tmp_path):
    (tmp_path / "b_page.html").write_bytes(HTML)
    (tmp_path / "a_doc.pdf").write_bytes(_mk_pdf(["PDF paragraph one.", "PDF two."]))
    (tmp_path / "z_word.docx").write_bytes(_docx_bytes("Docx body text here."))
    (tmp_path / "notes.txt").write_bytes(b"plain text notes payload")
    (tmp_path / "skipme.bin").write_bytes(b"\x00\x01ignored")
    sub = tmp_path / "nested"
    sub.mkdir()
    (sub / "deep.html").write_bytes(HTML)
    return str(tmp_path)


def test_discovery_priority_and_filters(corpus_dir):
    files = discover_files(corpus_dir)
    names = [os.path.basename(p) for p in files]
    # docx(2) < pdf(3) < html(5) < txt(999); .bin and nested/ excluded
    assert names == ["z_word.docx", "a_doc.pdf", "b_page.html", "notes.txt"]
    assert "skipme.bin" not in names
    rec = [os.path.basename(p) for p in discover_files(corpus_dir, recursive=True)]
    assert "deep.html" in rec and len(rec) == 5
    assert file_priority("x/deck.PPTX") == 1
    assert discover_files(os.path.join(corpus_dir, "missing")) == []


def test_read_folder_schema_and_bytes(ray_session, corpus_dir):
    ds = read_folder(corpus_dir)
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert tbl.schema.equals(PAGES_SCHEMA)
    rows = {r["url"]: r for r in tbl.to_pylist()}
    assert len(rows) == 4
    url = "file://" + os.path.join(corpus_dir, "b_page.html")
    assert rows[url]["html"] == HTML
    assert rows[url]["warc_ts"] is not None


def test_folder_extract_matches_direct(ray_session, corpus_dir):
    out = folder_pipeline(corpus_dir, out_dir="")  # lazy dataset, no sink
    got = {os.path.basename(r["url"]): r
           for r in out.take_all()}
    assert got["b_page.html"]["method"] == "html"
    assert got["a_doc.pdf"]["method"].startswith("pdf")
    assert got["z_word.docx"]["method"] == "docx"
    # byte-identical to the single-process extractor over the same bytes
    direct = extract_document(HTML, "", DEFAULT_CONFIG)
    assert got["b_page.html"]["extracted_text"] == direct.extracted_text
    assert "Docx body text here." in got["z_word.docx"]["extracted_text"]


def test_markdown_sink_resumable(ray_session, corpus_dir):
    md = os.path.join(corpus_dir, "md_out")
    stats = folder_pipeline(corpus_dir, out_dir=md)
    assert stats == {"files_written": 4, "files_skipped": 0}
    names = sorted(os.listdir(md))
    assert names == ["a_doc.md", "b_page.md", "notes.md", "z_word.md"]
    body = open(os.path.join(md, "b_page.md"), encoding="utf-8").read()
    assert "Folder Title" in body
    # resume: nothing rewritten
    stats2 = folder_pipeline(corpus_dir, out_dir=md)
    assert stats2 == {"files_written": 0, "files_skipped": 4}
    # overwrite forces rewrite
    stats3 = folder_pipeline(corpus_dir, out_dir=md, overwrite=True)
    assert stats3["files_written"] == 4


def test_markdown_name_web_urls():
    assert markdown_name("file:///tmp/x/report.pdf") == "report.md"
    n = markdown_name("https://site01.example.org/path/page?id=2")
    assert n.endswith(".md") and "/" not in n and "?" not in n


def test_empty_folder_composes(ray_session, tmp_path):
    ds = read_folder(str(tmp_path))
    assert ds.count() == 0
    assert ds.schema().names == list(PAGES_SCHEMA.names)
