"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a ``media_type``
string and a metadata struct; decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages with SMALL batch
sizes (binary rows are wide — SURVEY.md §4.2).

The decode itself is STUBBED (no PIL/ffmpeg in this environment, marked
explicitly): if PIL is importable it is used for real image decode;
otherwise payloads in the deterministic FAKEIMG container format (header
``FAKEIMG1`` + u16 width + u16 height + u8 channels + raw bytes) are
"decoded" by parsing that header — so the Ray-side plumbing (schema, actor
signature, batch sizing, output layout) is real and tested end-to-end,
and swapping in a real codec is a one-function change.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

try:  # pragma: no cover - not installed here
    from PIL import Image  # type: ignore
    _HAVE_PIL = True
except Exception:  # pragma: no cover
    Image = None
    _HAVE_PIL = False

FAKEIMG_MAGIC = b"FAKEIMG1"


def make_fake_image(width: int, height: int, channels: int = 3,
                    seed: int = 0) -> bytes:
    """Deterministic synthetic image payload in the FAKEIMG container."""
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    body = rng.randint(0, 256, size=width * height * channels,
                       dtype=np.int64).astype(np.uint8).tobytes()
    return FAKEIMG_MAGIC + struct.pack("<HHB", width, height, channels) + body


def _decode_fake(payload: bytes):
    if not payload.startswith(FAKEIMG_MAGIC):
        raise ValueError("not a FAKEIMG payload")
    w, h, c = struct.unpack_from("<HHB", payload, len(FAKEIMG_MAGIC))
    body = np.frombuffer(payload, dtype=np.uint8,
                         offset=len(FAKEIMG_MAGIC) + 5)
    expected = w * h * c
    if len(body) < expected:
        raise ValueError("truncated FAKEIMG body")
    return body[:expected].reshape(h, w, c)


MEDIA_META_TYPE = pa.struct([
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("channels", pa.int32()),
    ("mean_intensity", pa.float64()),
    ("payload_sha1", pa.string()),
])


class DecodeImageBatch:
    """Actor-pool stage: (id, media, media_type) -> + decoded metadata.

    Real decode path requires PIL (NOT INSTALLED HERE — stubbed): without
    it, only FAKEIMG payloads decode; anything else lands on the error
    column (degradation principle, same as the extractor).
    """

    def __init__(self):
        self.have_pil = _HAVE_PIL

    def _decode(self, payload: bytes) -> np.ndarray:
        if payload.startswith(FAKEIMG_MAGIC):
            return _decode_fake(payload)
        if self.have_pil:  # pragma: no cover
            import io
            return np.asarray(Image.open(io.BytesIO(payload)))
        raise NotImplementedError(
            "real image decode requires PIL (not available in this "
            "environment); only FAKEIMG payloads are supported")

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas, errors = [], []
        for payload in batch.column("media").to_pylist():
            try:
                arr = self._decode(payload or b"")
                metas.append({
                    "width": int(arr.shape[1]),
                    "height": int(arr.shape[0]),
                    "channels": int(arr.shape[2]) if arr.ndim == 3 else 1,
                    "mean_intensity": round(float(arr.mean()), 6),
                    "payload_sha1": hashlib.sha1(payload).hexdigest(),
                })
                errors.append("")
            except Exception as exc:
                metas.append({"width": 0, "height": 0, "channels": 0,
                              "mean_intensity": 0.0, "payload_sha1": ""})
                errors.append(f"decode_error:{type(exc).__name__}")
        batch = batch.append_column("media_meta",
                                    pa.array(metas, MEDIA_META_TYPE))
        batch = batch.append_column("decode_error",
                                    pa.array(errors, pa.string()))
        return batch


class ResizeImageBatch:
    """Nearest-neighbor resize of decodable payloads -> new FAKEIMG bytes.

    (Real resample needs PIL — stubbed the same way as decode.)
    """

    def __init__(self, target_w: int = 64, target_h: int = 64):
        self.tw, self.th = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch.column("media").to_pylist():
            try:
                arr = _decode_fake(payload or b"")
                ys = (np.arange(self.th) * arr.shape[0] // self.th)
                xs = (np.arange(self.tw) * arr.shape[1] // self.tw)
                resized = arr[ys][:, xs]
                out.append(FAKEIMG_MAGIC
                           + struct.pack("<HHB", self.tw, self.th,
                                         resized.shape[2])
                           + resized.tobytes())
            except Exception:
                out.append(None)
        return batch.set_column(batch.column_names.index("media"),
                                "media", pa.array(out, pa.binary()))


def media_dataset_from_documents(sf_dir: str, seed: int = 42):
    """Synthesize a media table from documents (deterministic, per-row):
    one FAKEIMG per doc whose dims derive from doc_id."""
    import os
    import ray.data

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def gen(batch: pa.Table) -> pa.Table:
        ids, media, mtype = [], [], []
        for d in batch.column("doc_id").to_pylist():
            w = 16 + (d % 48)
            h = 16 + ((d * 7) % 48)
            ids.append(d)
            media.append(make_fake_image(w, h, 3, seed * 1_000_003 + d))
            mtype.append("image/fake")
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "media": pa.array(media, pa.binary()),
                         "media_type": pa.array(mtype, pa.string())})

    # small batches: wide binary rows (SURVEY.md §4.2 memory-aware rule)
    return docs.map_batches(gen, batch_format="pyarrow", batch_size=64)
