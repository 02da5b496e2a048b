import pyarrow as pa

from full_text_extractor_v6_ray.functions.file_utils import (
    safe_filename,
    url_to_artifact_name,
)
from full_text_extractor_v6_ray.stages.metadata import (
    DataIslandBatch,
    PageMetadataBatch,
)


def _pages(htmls):
    return pa.table({
        "url": pa.array([f"u{i}" for i in range(len(htmls))], pa.string()),
        "html": pa.array([h.encode() for h in htmls], pa.binary()),
    })


def test_safe_filename():
    assert safe_filename("a/b:c*d") == "a_b_c_d"
    assert safe_filename("normal-name.txt") == "normal-name.txt"
    assert safe_filename("") == "unnamed"
    assert safe_filename("///") == "unnamed"
    assert len(safe_filename("x" * 400)) == 255


def test_url_to_artifact_name():
    assert url_to_artifact_name("https://h.com/a/b") == "h.com_a_b"


def test_page_metadata_completeness():
    out = PageMetadataBatch()(_pages([
        "<html lang='en'><head><title>T</title>"
        "<meta name='description' content='d'></head><h1>H</h1></html>",
        "<html><body><p>bare</p></body></html>",
    ]))
    assert out["completeness"].to_pylist() == [1.0, 0.0]
    assert out["lang_attr"].to_pylist() == ["en", ""]


def test_data_islands_parse_and_skip_invalid():
    out = DataIslandBatch()(_pages([
        '<script type="application/json">{"a": 1, "b": [1,2]}</script>'
        '<script type="application/ld+json">[1,2,3]</script>'
        '<script type="application/json">{invalid</script>',
        "<p>none</p>",
    ]))
    assert out["url"].to_pylist() == ["u0", "u0"]
    assert out["kind"].to_pylist() == ["object", "array"]
    assert out["top_keys"].to_pylist()[0] == "a,b"
    assert out["n_items"].to_pylist() == [2, 3]


def test_generated_pages_carry_islands():
    import pyarrow.parquet as pq

    from full_text_extractor_v6_ray.sources.pages_gen import (
        pages_table_from_documents,
    )

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").slice(0, 20)
    pages = pages_table_from_documents(docs)
    out = DataIslandBatch()(pages)
    # every html page has exactly one parseable island with doc_id/lang/n_words
    assert out.num_rows >= 18
    assert set(out["top_keys"].to_pylist()) == {"doc_id,lang,n_words"}
