"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB treats media as ``binary`` columns with
typed metadata structs, processed by Arrow-batched UDFs.  The Spark-side
plumbing here is real and tested — schemas, mapInPandas batch shape,
partition sizing, deterministic fake features — while the codecs are an
environment seam (this container has no image/audio libraries): each
operator picks its decoder DRIVER-side via :func:`_pick_decoder` —
an explicit ``decode=`` callable wins, then the deterministic fake
(``fake_decode=True``, a hash-derived byte grid), then whatever real
library is importable at runtime (PIL / soundfile / PyAV via the
``_resolve_*_codec`` probes).  The chosen callable is captured into the
mapInPandas closure, so executors never re-resolve and the operators go
live the moment the environment gains the libs — no code change.

Operators:
* :func:`with_media_meta`       — sniff container type + size from magic
                                  bytes (pure binary inspection, no codec)
* :func:`image_features`        — decode -> resize -> feature vector
                                  (mapInPandas; stubbed decode)
* :func:`audio_frame_sample`    — decode -> fixed-rate frame sampling
                                  (stubbed decode)
* :func:`video_frame_sample`    — demux -> every-Nth-frame sampling ->
                                  per-frame image features (stubbed demux)

Scale notes: media rows are huge — callers should repartition by
``spark.sql.files.maxPartitionBytes``-sized inputs and keep
``arrow.maxRecordsPerBatch`` low for these stages; features are tiny and
re-shufflable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),  # refined below via the WAVE marker
    (b"ID3", "audio/mp3"),
    (b"\x00\x00\x00", "video/mp4"),  # ftyp at offset 4
]


def sniff_media_type(data: bytes) -> str:
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "video/mp4"
    for magic, mtype in _MAGIC:
        if data.startswith(magic):
            return mtype
    return "application/octet-stream"


META_SCHEMA = "media_type string, n_bytes long, content_sha1 string"


def with_media_meta(df: DataFrame, col: str = "media") -> DataFrame:
    """Attach (media_type, n_bytes, content_sha1) from the raw bytes."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    ) + ", " + META_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = [bytes(b) if b is not None else b"" for b in pdf[col]]
            yield pdf.assign(
                media_type=[sniff_media_type(b) for b in raw],
                n_bytes=[len(b) for b in raw],
                content_sha1=[hashlib.sha1(b).hexdigest() for b in raw],
            )

    return df.mapInPandas(run, schema=schema)


def _fake_image_decode(data: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: an 8x8x3 uint8 grid derived from
    the content hash — byte-identical per input, so tests and oracles are
    stable without any imaging library."""
    h = hashlib.sha256(data).digest()
    grid = np.frombuffer((h * 6)[: 8 * 8 * 3], dtype=np.uint8)
    return grid.reshape(8, 8, 3).copy()


def _fake_audio_decode(data: bytes) -> np.ndarray:
    """Deterministic stand-in: 256 float32 mono samples from the hash."""
    h = hashlib.sha256(data).digest()
    raw = np.frombuffer((h * 8)[:256], dtype=np.uint8)
    return (raw.astype(np.float32) - 127.5) / 127.5


def _resolve_image_codec():
    """bytes -> HxWx3 uint8 RGB decoder backed by Pillow, or None when the
    library is not importable (the extras seam: fake_decode=False goes
    live the moment the environment has PIL)."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None

    def decode(data: bytes) -> np.ndarray:
        with Image.open(io.BytesIO(data)) as img:
            return np.asarray(img.convert("RGB"), dtype=np.uint8)

    return decode


def _resolve_audio_codec():
    """bytes -> float32 mono waveform via soundfile, or None."""
    try:
        import io

        import soundfile
    except ImportError:
        return None

    def decode(data: bytes) -> np.ndarray:
        wave, _sr = soundfile.read(io.BytesIO(data), dtype="float32")
        return wave.mean(axis=1) if wave.ndim > 1 else wave

    return decode


def _resolve_video_codec():
    """bytes -> list of HxWx3 uint8 RGB frames via PyAV, or None."""
    try:
        import io

        import av
    except ImportError:
        return None

    def decode(data: bytes) -> list[np.ndarray]:
        frames = []
        with av.open(io.BytesIO(data)) as container:
            for frame in container.decode(video=0):
                frames.append(frame.to_ndarray(format="rgb24"))
        return frames

    return decode


def _pick_decoder(decode, fake_decode: bool, fake_fn, resolver, what: str):
    """Driver-side codec selection (captured into the mapInPandas closure;
    executors never re-resolve): explicit ``decode=`` wins, then the
    deterministic fake, then whatever real library is importable."""
    if decode is not None:
        return decode
    if fake_decode:
        return fake_fn
    dec = resolver()
    if dec is None:
        raise NotImplementedError(
            f"{what} codecs unavailable in this environment; pass decode= "
            f"or fake_decode=True for the deterministic stand-in"
        )
    return dec


IMAGE_FEAT_SCHEMA = "key string, feat array<float>, height int, width int"


def image_features(df: DataFrame, *, key: str = "url", col: str = "media",
                   fake_decode: bool = True, decode=None) -> DataFrame:
    """decode -> 4x4 mean-pool 'resize' -> 48-dim feature vector.

    The pooling/feature math is real numpy (what a CLIP-preprocessing stage
    does structurally); the codec comes from ``decode=`` / Pillow / the
    deterministic fake (see :func:`_pick_decoder`).
    """
    dec = _pick_decoder(decode, fake_decode, _fake_image_decode,
                        _resolve_image_codec, "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, feats, hs, ws = [], [], [], []
            for k, b in zip(pdf[key], pdf[col]):
                img = dec(bytes(b))
                h, w, _ = img.shape
                # crop to multiples of 4 so the pooling reshape holds for
                # arbitrary decoded sizes (real codecs rarely emit 4k x 4k)
                ch, cw = max(h - h % 4, 4), max(w - w % 4, 4)
                img4 = img[:ch, :cw]
                if img4.shape[0] < 4 or img4.shape[1] < 4:  # tiny image: pad
                    img4 = np.pad(img4, ((0, 4 - img4.shape[0]),
                                         (0, 4 - img4.shape[1]), (0, 0)),
                                  mode="edge")
                    ch, cw = 4, 4
                # mean-pool to 4x4x3 ("resize"), flatten, scale to [0,1]
                pooled = img4.reshape(4, ch // 4, 4, cw // 4, 3).mean(axis=(1, 3))
                feats.append((pooled.reshape(-1) / 255.0).astype(np.float32).tolist())
                keys.append(k)
                hs.append(h)
                ws.append(w)
            if not keys:  # empty batch: Arrow needs explicit dtypes
                yield pd.DataFrame(
                    {"key": pd.Series(dtype="object"),
                     "feat": pd.Series(dtype="object"),
                     "height": pd.Series(dtype="int32"),
                     "width": pd.Series(dtype="int32")}
                )
            else:
                yield pd.DataFrame(
                    {"key": keys, "feat": feats, "height": hs, "width": ws}
                )

    return df.mapInPandas(run, schema=IMAGE_FEAT_SCHEMA)


AUDIO_FRAME_SCHEMA = "key string, frame_idx int, frame array<float>"


def audio_frame_sample(df: DataFrame, *, key: str = "url", col: str = "media",
                       frame_len: int = 64, hop: int = 64,
                       fake_decode: bool = True, decode=None) -> DataFrame:
    """decode -> fixed-rate frame sampling (one output row per frame)."""
    dec = _pick_decoder(decode, fake_decode, _fake_audio_decode,
                        _resolve_audio_codec, "audio")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"key": [], "frame_idx": [], "frame": []}
            for k, b in zip(pdf[key], pdf[col]):
                wave = dec(bytes(b))
                n = (len(wave) - frame_len) // hop + 1
                for i in range(max(n, 0)):
                    out["key"].append(k)
                    out["frame_idx"].append(i)
                    out["frame"].append(
                        wave[i * hop: i * hop + frame_len].tolist()
                    )
            if not out["key"]:
                # an all-empty batch needs explicit dtypes — Arrow can't
                # infer list<float> from an empty object column
                yield pd.DataFrame(
                    {"key": pd.Series(dtype="object"),
                     "frame_idx": pd.Series(dtype="int32"),
                     "frame": pd.Series(dtype="object")}
                )
            else:
                yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=AUDIO_FRAME_SCHEMA)


def _fake_video_decode(data: bytes) -> list[np.ndarray]:
    """Deterministic stand-in demuxer: a 12-frame sequence of 8x8x3 grids
    chained from the content hash."""
    frames = []
    h = hashlib.sha256(data).digest()
    for _ in range(12):
        grid = np.frombuffer((h * 6)[: 8 * 8 * 3], dtype=np.uint8)
        frames.append(grid.reshape(8, 8, 3).copy())
        h = hashlib.sha256(h).digest()
    return frames


VIDEO_FRAME_SCHEMA = (
    "key string, frame_idx int, n_frames int, feat array<float>"
)


def video_frame_sample(df: DataFrame, *, key: str = "url", col: str = "media",
                       every_n: int = 4, fake_decode: bool = True,
                       decode=None) -> DataFrame:
    """demux -> keep every Nth frame -> 4x4 mean-pool feature per frame.

    One output row per sampled frame (the shape a video-captioning /
    frame-dedup pipeline consumes); frame features reuse the image pooling
    math, so the demuxer (``decode=`` / PyAV / fake) is the only seam.
    """
    dec = _pick_decoder(decode, fake_decode, _fake_video_decode,
                        _resolve_video_codec, "video")

    def pool(img: np.ndarray) -> list[float]:
        h, w, _ = img.shape
        ch, cw = max(h - h % 4, 4), max(w - w % 4, 4)
        img4 = img[:ch, :cw]
        if img4.shape[0] < 4 or img4.shape[1] < 4:
            img4 = np.pad(img4, ((0, 4 - img4.shape[0]),
                                 (0, 4 - img4.shape[1]), (0, 0)),
                          mode="edge")
            ch, cw = 4, 4
        pooled = img4.reshape(4, ch // 4, 4, cw // 4, 3).mean(axis=(1, 3))
        return (pooled.reshape(-1) / 255.0).astype(np.float32).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"key": [], "frame_idx": [], "n_frames": [], "feat": []}
            for k, b in zip(pdf[key], pdf[col]):
                frames = dec(bytes(b))
                for i in range(0, len(frames), every_n):
                    out["key"].append(k)
                    out["frame_idx"].append(i)
                    out["n_frames"].append(len(frames))
                    out["feat"].append(pool(frames[i]))
            if not out["key"]:
                yield pd.DataFrame(
                    {"key": pd.Series(dtype="object"),
                     "frame_idx": pd.Series(dtype="int32"),
                     "n_frames": pd.Series(dtype="int32"),
                     "feat": pd.Series(dtype="object")}
                )
            else:
                yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)
