"""iter_training_batches: the loader contract over packed_chunk_text.

Pins (1) global order + round-trip — concatenating the streamed
windows reproduces the corpus token stream exactly; (2) resume — a
loader restarted at window k sees byte-identical remaining batches."""

import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"
CTX = 64


def _chunks(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.packing import (
        packed_chunk_text,
    )

    docs = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"),
        columns=["doc_id", "text"])
    return packed_chunk_text(docs, ctx=CTX)


def test_stream_round_trips_the_corpus(ray_session):
    from full_text_extractor_v6_ray.stages.packing import (
        iter_training_batches,
    )

    got_ids, got_texts = [], []
    for b in iter_training_batches(_chunks(ray_session), batch_size=7):
        got_ids.extend(b.column("chunk_id").to_pylist())
        got_texts.extend(b.column("text").to_pylist())
    assert got_ids == sorted(got_ids)  # global chunk order

    tok = re.compile(r"\S+")
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id")
    stream = [t for txt in docs["text"] for t in tok.findall(txt or "")]
    streamed = [t for w in got_texts for t in tok.findall(w)]
    assert streamed == stream
    # every window but the last is exactly CTX tokens
    lens = [len(tok.findall(w)) for w in got_texts]
    assert all(n == CTX for n in lens[:-1]) and 0 < lens[-1] <= CTX


def test_resume_is_byte_identical(ray_session):
    from full_text_extractor_v6_ray.stages.packing import (
        iter_training_batches,
    )

    full = pa.concat_tables(
        list(iter_training_batches(_chunks(ray_session), batch_size=5)))
    k = int(full.column("chunk_id").to_pylist()[len(full) // 2])
    resumed = pa.concat_tables(list(iter_training_batches(
        _chunks(ray_session), batch_size=5, start_chunk=k)))
    tail = full.filter(
        pa.compute.greater_equal(full.column("chunk_id"), k))
    assert resumed.column("chunk_id").to_pylist() == \
        tail.column("chunk_id").to_pylist()
    assert resumed.column("text").to_pylist() == \
        tail.column("text").to_pylist()
