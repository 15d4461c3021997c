"""Multimodal columns: opaque binary payloads + typed metadata.

The reference downloads media to disk with content-hash filenames
(reference: src/media_downloader.py:125-211) and extracts image dimensions
via PIL (reference: src/media_downloader.py:195-200).  Here media live in
tables: a ``binary`` payload column plus typed metadata, processed by
actor-pool ``map_batches`` stages.

The codec seam AUTO-DETECTS the best available codec: with PIL
importable, ``fake=False`` runs full PIL decode/resize; without it, the
vendored pure-stdlib PNG codec (``png_mini`` — zlib + numpy, always
available) handles PNG payloads, so the REAL ``_decode_real`` /
``_resize_real`` kernels run in every environment (no perpetually
skipped test).  Non-PNG payloads without PIL raise
``NotImplementedError`` per payload with an actionable message.
``fake=True`` — the default, which oracle runs keep — substitutes a
deterministic fake decoder (hash-derived dimensions / samples).
Everything around the seam — schemas, actor signature, batch sizing,
output layout — is identical on all paths.  Audio/video codecs
(ffmpeg-class) have no in-container candidate, so those stay fake-only.

Batch-size guidance: payloads are large; size ``batch_size`` so
``batch_size × max_payload × concurrency`` fits the worker heap (e.g. 64
rows for ~1 MB images at 8 actors ≈ 512 MB peak).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

try:  # real decoder path — not available in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("media_type", pa.string()),   # images | videos | audio | documents | other
        ("payload", pa.binary()),
        ("content_type", pa.string()),
    ]
)

IMAGE_FEATURES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("content_hash", pa.string()),
        ("nbytes", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("feat", pa.list_(pa.float32())),  # decoded-feature vector
    ]
)


def synthesize_payload(media_ref: str, min_bytes: int = 64, max_bytes: int = 4096) -> bytes:
    """Deterministic fake bytes for a media_ref (no network in sandbox):
    blake2b-keyed stream, size seeded by the ref hash."""
    h = hashlib.blake2b(media_ref.encode("utf-8"), digest_size=8).digest()
    size = min_bytes + int.from_bytes(h[:4], "big") % (max_bytes - min_bytes)
    out = bytearray()
    counter = 0
    while len(out) < size:
        out += hashlib.blake2b(
            h + counter.to_bytes(4, "big"), digest_size=32
        ).digest()
        counter += 1
    return bytes(out[:size])


class MediaMaterializer:
    """Actor-pool stage: media-ref rows → MEDIA_SCHEMA rows with payloads.

    Stands in for the reference's download loop
    (src/media_downloader.py:125-179) — per-actor "session" init happens
    once here; per-batch work is payload synthesis + typing."""

    def __init__(
        self,
        min_bytes: int = 64,
        max_bytes: int = 4096,
        max_file_size: int | None = None,
    ):
        self.min_bytes = min_bytes
        self.max_bytes = max_bytes
        # M18 guard (reference src/media_downloader.py:156-159,174-179 +
        # config.yaml:53 max_file_size): oversized media are skipped, the
        # row dropped — like the reference's pre/mid-download rejection
        self.max_file_size = max_file_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..htmlparse import get_extension, get_media_type

        refs = batch.column("media_ref").to_pylist()
        payloads = [synthesize_payload(r, self.min_bytes, self.max_bytes) for r in refs]
        if self.max_file_size is not None:
            keep = [len(p) <= self.max_file_size for p in payloads]
            if not all(keep):
                batch = batch.filter(pa.array(keep))
                refs = [r for r, k in zip(refs, keep) if k]
                payloads = [p for p, k in zip(payloads, keep) if k]
        mtypes = [get_media_type(get_extension(r)) for r in refs]
        ctypes = [
            {"images": "image/jpeg", "videos": "video/mp4", "audio": "audio/mpeg",
             "documents": "application/pdf"}.get(m, "application/octet-stream")
            for m in mtypes
        ]
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(refs, pa.string()),
                pa.array(mtypes, pa.string()),
                pa.array(payloads, pa.binary()),
                pa.array(ctypes, pa.string()),
            ],
            schema=MEDIA_SCHEMA,
        )


AUDIO_FEATURES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("content_hash", pa.string()),
        ("nbytes", pa.int64()),
        ("duration_ms", pa.int64()),
        ("sample_rate", pa.int32()),
        ("feat", pa.list_(pa.float32())),
    ]
)

VIDEO_FRAMES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("frame_idx", pa.int32()),
        ("ts_ms", pa.int64()),
        ("frame", pa.binary()),      # encoded frame payload
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


class AudioDecoder:
    """Actor-pool stage: MEDIA_SCHEMA → AUDIO_FEATURES_SCHEMA.

    Same contract as ImageDecoder: the codec is a deterministic fake in
    this container (duration/sample-rate/features derived from the payload
    hash — a real decoder would be librosa/ffmpeg in ``_decode_real``);
    the Ray plumbing (batch sizing, actor signature, schema) is real."""

    def __init__(self, fake: bool = True, feat_dim: int = 8):
        self.fake = fake
        self.feat_dim = feat_dim
        if not fake:
            raise NotImplementedError(
                "real audio decode needs an audio codec library, which is "
                "not in this container; construct AudioDecoder(fake=True)"
            )

    def _decode_fake(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        h = hashlib.blake2b(payload, digest_size=16).digest()
        duration_ms = 500 + int.from_bytes(h[0:3], "big") % 600_000
        sample_rate = (8000, 16000, 22050, 44100)[h[3] % 4]
        feat = (
            np.frombuffer(
                hashlib.blake2b(payload, digest_size=4 * self.feat_dim).digest(),
                dtype=np.uint32,
            ).astype(np.float32)
            / np.float32(2**32)
        )
        return duration_ms, sample_rate, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        durs, rates, feats, hashes, sizes = [], [], [], [], []
        for p in payloads:
            d, r, f = self._decode_fake(p)
            durs.append(d)
            rates.append(r)
            feats.append(f.tolist())
            hashes.append(hashlib.md5(p).hexdigest()[:10])
            sizes.append(len(p))
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("media_ref"),
                pa.array(hashes, pa.string()),
                pa.array(sizes, pa.int64()),
                pa.array(durs, pa.int64()),
                pa.array(rates, pa.int32()),
                pa.array(feats, pa.list_(pa.float32())),
            ],
            schema=AUDIO_FEATURES_SCHEMA,
        )


class VideoFrameSampler:
    """Actor-pool stage: MEDIA_SCHEMA → one row per sampled frame
    (``flat_map``-shaped batch expansion: k evenly-spaced frames per
    video).  Frame payloads are deterministic fakes (a real sampler would
    shell to ffmpeg in ``_sample_real``); batch_size guidance is stricter
    here — output is ``k×`` the input rows with binary payloads."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        if not fake:
            raise NotImplementedError(
                "real frame sampling needs ffmpeg, which is not in this "
                "container; construct VideoFrameSampler(fake=True)"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, refs, fidx, tss, frames, ws, hs = [], [], [], [], [], [], []
        for doc_id, ref, payload in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("media_ref").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            h = hashlib.blake2b(payload, digest_size=16).digest()
            duration_ms = 1000 + int.from_bytes(h[0:3], "big") % 120_000
            w = 160 + h[4] % 8 * 80
            ht = 120 + h[5] % 8 * 60
            for i in range(self.n_frames):
                ts = duration_ms * i // self.n_frames
                ids.append(doc_id)
                refs.append(ref)
                fidx.append(i)
                tss.append(ts)
                frames.append(
                    hashlib.blake2b(
                        h + i.to_bytes(4, "big"), digest_size=32
                    ).digest()
                )
                ws.append(w)
                hs.append(ht)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.string()),
                pa.array(refs, pa.string()),
                pa.array(fidx, pa.int32()),
                pa.array(tss, pa.int64()),
                pa.array(frames, pa.binary()),
                pa.array(ws, pa.int32()),
                pa.array(hs, pa.int32()),
            ],
            schema=VIDEO_FRAMES_SCHEMA,
        )


class ImageDecoder:
    """Actor-pool stage: MEDIA_SCHEMA → IMAGE_FEATURES_SCHEMA.

    With a real codec present (PIL), ``_decode_real`` would open the
    payload; in this container it raises unless ``fake=True``, which uses
    a deterministic stand-in (dimensions + feature vector derived from the
    payload hash).  The Ray-side plumbing is identical either way.
    """

    def __init__(self, fake: bool = True, feat_dim: int = 8):
        self.fake = fake
        self.feat_dim = feat_dim

    def _decode_real(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        """Real decode — PIL when importable, else the vendored
        pure-stdlib PNG codec (PNG payloads only; both grayscale with
        the same ITU-R 601-2 luma, so features match on shared pixels):
        dimensions from the codec, features = per-band luminance means
        over ``feat_dim`` vertical strips, in [0, 1] like the fake path."""
        if _HAVE_PIL:
            import io

            from PIL import Image

            with Image.open(io.BytesIO(payload)) as img:
                w, h = img.size
                gray = (
                    np.asarray(img.convert("L"), dtype=np.float32)
                    / np.float32(255.0)
                )
        else:
            from .png_mini import decode_png, luminance

            arr = decode_png(payload)  # NotImplementedError for non-PNG
            h, w = arr.shape[:2]
            gray = luminance(arr[..., :3] if arr.ndim == 3 else arr).astype(
                np.float32
            ) / np.float32(255.0)
        bands = np.array_split(gray, self.feat_dim, axis=1)
        feat = np.array(
            [float(b.mean()) if b.size else 0.0 for b in bands], np.float32
        )
        return w, h, feat

    def _decode_fake(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        h = hashlib.blake2b(payload, digest_size=16).digest()
        w = 16 + h[0] * 8
        ht = 16 + h[1] * 8
        feat = (
            np.frombuffer(
                hashlib.blake2b(payload, digest_size=4 * self.feat_dim).digest(),
                dtype=np.uint32,
            ).astype(np.float32)
            / np.float32(2**32)
        )
        return w, ht, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._decode_fake if self.fake else self._decode_real
        payloads = batch.column("payload").to_pylist()
        ws, hs, feats, hashes, sizes = [], [], [], [], []
        for p in payloads:
            w, h, f = decode(p)
            ws.append(w)
            hs.append(h)
            feats.append(f.tolist())
            hashes.append(hashlib.md5(p).hexdigest()[:10])
            sizes.append(len(p))
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("media_ref"),
                pa.array(hashes, pa.string()),
                pa.array(sizes, pa.int64()),
                pa.array(ws, pa.int32()),
                pa.array(hs, pa.int32()),
                pa.array(feats, pa.list_(pa.float32())),
            ],
            schema=IMAGE_FEATURES_SCHEMA,
        )


RESIZED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("content_hash", pa.string()),
        ("width", pa.int32()),       # source dims
        ("height", pa.int32()),
        ("out_width", pa.int32()),   # aspect-preserving fit
        ("out_height", pa.int32()),
        ("resized", pa.binary()),    # resized payload (fake codec)
    ]
)


class ImageResizer:
    """Actor-pool resize stage — the third leg of the multimodal set
    (decode / feature-extract / RESIZE / frame-sample).

    The GEOMETRY is real and vectorized: aspect-preserving fit of
    (width, height) into a (target_w, target_h) box — uniform scale
    ``min(tw/w, th/h)`` (upscaling allowed unless ``no_upscale``),
    floor-rounded, clamped to ≥ 1 px.  The pixel resampling sits behind
    the same fake-codec seam as ``ImageDecoder`` (PIL absent in this
    container): the fake path emits a deterministic payload whose length
    is proportional to the output pixel count, keyed by the source
    content hash, so downstream stages see realistic size distributions.
    Swap ``_resize_real`` for a PIL kernel and nothing else changes.
    """

    def __init__(
        self,
        target_w: int = 224,
        target_h: int = 224,
        no_upscale: bool = False,
        fake: bool = True,
    ):
        self.target_w, self.target_h = int(target_w), int(target_h)
        self.no_upscale = no_upscale
        self.fake = fake

    def fit_dims(self, w: np.ndarray, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized aspect-preserving fit; returns (out_w, out_h) int32."""
        w = np.maximum(w.astype(np.float64), 1.0)
        h = np.maximum(h.astype(np.float64), 1.0)
        scale = np.minimum(self.target_w / w, self.target_h / h)
        if self.no_upscale:
            scale = np.minimum(scale, 1.0)
        ow = np.maximum(np.floor(w * scale), 1.0).astype(np.int32)
        oh = np.maximum(np.floor(h * scale), 1.0).astype(np.int32)
        return ow, oh

    def _resize_real(self, payload: bytes, ow: int, oh: int) -> bytes:
        """Real resample to the precomputed fit box, re-encoded as PNG
        bytes — PIL bilinear when importable, else the vendored PNG
        codec + nearest-neighbor gather (PNG payloads only)."""
        if _HAVE_PIL:
            import io

            from PIL import Image

            with Image.open(io.BytesIO(payload)) as img:
                out = img.convert("RGB").resize(
                    (int(ow), int(oh)), Image.BILINEAR
                )
            buf = io.BytesIO()
            out.save(buf, format="PNG")
            return buf.getvalue()
        from .png_mini import decode_png, encode_png, resize_nearest

        arr = decode_png(payload)  # NotImplementedError for non-PNG
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)  # convert("RGB") parity
        return encode_png(resize_nearest(arr[..., :3], int(ow), int(oh)))

    def _resize_fake(self, content_hash: str, ow: int, oh: int) -> bytes:
        n = max(16, (int(ow) * int(oh)) // 64)
        seed = f"{content_hash}:{int(ow)}x{int(oh)}".encode()
        block = hashlib.blake2b(seed, digest_size=32).digest()
        return (block * (n // 32 + 1))[:n]

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy(zero_copy_only=False)
        h = batch.column("height").to_numpy(zero_copy_only=False)
        ow, oh = self.fit_dims(w, h)
        if self.fake:
            hashes = batch.column("content_hash").to_pylist()
            payloads = [
                self._resize_fake(ch, a, b) for ch, a, b in zip(hashes, ow, oh)
            ]
        else:
            # real path consumes the materialized payload column
            if "payload" not in batch.column_names:
                raise ValueError(
                    "ImageResizer(fake=False) needs a 'payload' binary column "
                    "(chain it after MediaMaterializer, not after the decoder "
                    "projection)"
                )
            payloads = [
                self._resize_real(p, a, b)
                for p, a, b in zip(batch.column("payload").to_pylist(), ow, oh)
            ]
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("media_ref"),
                batch.column("content_hash"),
                batch.column("width"),
                batch.column("height"),
                pa.array(ow, pa.int32()),
                pa.array(oh, pa.int32()),
                pa.array(payloads, pa.binary()),
            ],
            schema=RESIZED_SCHEMA,
        )
