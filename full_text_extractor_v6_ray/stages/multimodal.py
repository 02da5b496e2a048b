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


class ImageFeatureBatch:
    """Feature-extract stage: decoded image -> fixed-width feature vector
    (per-channel means + 8-bin intensity histogram + aspect ratio).

    The vector layout is the real contract (downstream ANN/dedup over a
    ``list<float>`` column); the pixel source is the FAKEIMG stub (or PIL
    when present) exactly like DecodeImageBatch.
    """

    N_BINS = 8

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, errors = [], []
        for payload in batch.column("media").to_pylist():
            try:
                arr = _decode_fake(payload or b"")
                chan_means = arr.reshape(-1, arr.shape[2]).mean(axis=0)
                hist, _ = np.histogram(arr, bins=self.N_BINS,
                                       range=(0, 256))
                hist = hist / max(1, arr.size)
                aspect = arr.shape[1] / max(1, arr.shape[0])
                vec = np.concatenate([chan_means / 255.0, hist, [aspect]])
                feats.append([round(float(v), 6) for v in vec])
                errors.append("")
            except Exception as exc:
                feats.append(None)
                errors.append(f"feature_error:{type(exc).__name__}")
        batch = batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float64())))
        return batch.append_column("feature_error",
                                   pa.array(errors, pa.string()))


# ---------------------------------------------------------------------------
# video: frame-sample; audio: feature-extract — same stub discipline
# (FAKEVID/FAKEAUD containers; a real ffmpeg/soundfile swap is one
# function, the Ray plumbing is real)
# ---------------------------------------------------------------------------

FAKEVID_MAGIC = b"FAKEVID1"
FAKEAUD_MAGIC = b"FAKEAUD1"


def make_fake_video(n_frames: int, width: int, height: int,
                    seed: int = 0) -> bytes:
    """FAKEVID container: magic + u16 n_frames, then length-prefixed
    FAKEIMG frames."""
    parts = [FAKEVID_MAGIC, struct.pack("<H", n_frames)]
    for f in range(n_frames):
        frame = make_fake_image(width, height, 3, seed * 131 + f)
        parts.append(struct.pack("<I", len(frame)))
        parts.append(frame)
    return b"".join(parts)


def _iter_fake_frames(payload: bytes):
    if not payload.startswith(FAKEVID_MAGIC):
        raise ValueError("not a FAKEVID payload")
    (n,) = struct.unpack_from("<H", payload, len(FAKEVID_MAGIC))
    off = len(FAKEVID_MAGIC) + 2
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", payload, off)
        off += 4
        yield payload[off:off + ln]
        off += ln


def make_fake_audio(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    """FAKEAUD container: magic + u32 rate + u32 n, then int16 PCM."""
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    pcm = (rng.standard_normal(n_samples) * 8000).astype(np.int16)
    return (FAKEAUD_MAGIC + struct.pack("<II", sample_rate, n_samples)
            + pcm.tobytes())


class FrameSampleBatch:
    """Frame-sample stage: one video row -> one row PER SAMPLED frame
    (every ``stride``-th), each frame a decodable FAKEIMG payload —
    the row-explosion shape a real video pipeline needs (small batches:
    wide binary rows)."""

    def __init__(self, stride: int = 2):
        self.stride = max(1, stride)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, media, mtype = [], [], [], []
        for vid, payload in zip(batch.column("id").to_pylist(),
                                batch.column("media").to_pylist()):
            try:
                for i, frame in enumerate(_iter_fake_frames(payload or b"")):
                    if i % self.stride:
                        continue
                    ids.append(vid)
                    fidx.append(i)
                    media.append(frame)
                    mtype.append("image/fake")
            except Exception:
                continue  # undecodable video: contributes no frames
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "frame_idx": pa.array(fidx, pa.int32()),
                         "media": pa.array(media, pa.binary()),
                         "media_type": pa.array(mtype, pa.string())})


class AudioFeatureBatch:
    """Audio feature-extract: duration, RMS, zero-crossing rate — numpy
    vectorized per row over the PCM body."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, rmss, zcrs, errors = [], [], [], []
        for payload in batch.column("media").to_pylist():
            try:
                p = payload or b""
                if not p.startswith(FAKEAUD_MAGIC):
                    raise ValueError("not a FAKEAUD payload")
                rate, n = struct.unpack_from("<II", p, len(FAKEAUD_MAGIC))
                pcm = np.frombuffer(p, dtype=np.int16,
                                    offset=len(FAKEAUD_MAGIC) + 8,
                                    count=n).astype(np.float64)
                durs.append(round(n / max(1, rate), 6))
                rmss.append(round(float(np.sqrt(np.mean(pcm ** 2))), 6))
                zcrs.append(round(float(np.mean(np.signbit(pcm[1:])
                                                != np.signbit(pcm[:-1]))), 6))
                errors.append("")
            except Exception as exc:
                durs.append(0.0)
                rmss.append(0.0)
                zcrs.append(0.0)
                errors.append(f"audio_error:{type(exc).__name__}")
        batch = batch.append_column("duration_s", pa.array(durs, pa.float64()))
        batch = batch.append_column("rms", pa.array(rmss, pa.float64()))
        batch = batch.append_column("zcr", pa.array(zcrs, pa.float64()))
        return batch.append_column("audio_error",
                                   pa.array(errors, pa.string()))


def video_dataset_from_documents(sf_dir: str, seed: int = 42):
    """Deterministic FAKEVID per 10th document (videos are rarer/wider)."""
    import os
    import ray.data

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def gen(batch: pa.Table) -> pa.Table:
        ids, media, mtype = [], [], []
        for d in batch.column("doc_id").to_pylist():
            if d % 10:
                continue
            ids.append(d)
            media.append(make_fake_video(4 + d % 5, 16 + d % 16,
                                         16 + (d * 3) % 16,
                                         seed * 1_000_003 + d))
            mtype.append("video/fake")
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "media": pa.array(media, pa.binary()),
                         "media_type": pa.array(mtype, pa.string())})

    return docs.map_batches(gen, batch_format="pyarrow", batch_size=32)


def audio_dataset_from_documents(sf_dir: str, seed: int = 42):
    """Deterministic FAKEAUD per 5th document."""
    import os
    import ray.data

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def gen(batch: pa.Table) -> pa.Table:
        ids, media, mtype = [], [], []
        for d in batch.column("doc_id").to_pylist():
            if d % 5:
                continue
            ids.append(d)
            media.append(make_fake_audio(8000, 4000 + (d % 7) * 1000,
                                         seed * 1_000_003 + d))
            mtype.append("audio/fake")
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "media": pa.array(media, pa.binary()),
                         "media_type": pa.array(mtype, pa.string())})

    return docs.map_batches(gen, batch_format="pyarrow", batch_size=64)


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
