"""Host-side image input pipeline: threaded decode → prefetched uint8 batches.

The reference has no image-loading pipeline at all: each estimator decodes
its own inputs inline, one image at a time, on the calling thread (reference
image_entropy.py:39-49, cross_modal.py:55-60, noise.py:47-63).  At corpus
scale the host decode path — not the TPU forward — is the end-to-end
bottleneck (docs/perf/signals_*.json: MAE device throughput is ~80× the
naive single-thread host decode rate), so this framework makes ingestion a
first-class pipeline stage:

* :func:`decode_image_uint8` — one decode.  JPEG sources use PIL *draft
  mode* (the libjpeg decoder downscales in DCT space, so a 4×-oversized
  JPEG decodes close to an order of magnitude faster), then a bilinear
  resize to the target square.  Output stays **uint8**: 4× less host RAM
  and host→device transfer than f32; normalization to [0,1] runs on device
  inside the jitted forward (see ``normalize_images`` below).
* :func:`decode_batch` — ordered parallel decode.  JPEG-suffixed path
  sources go through the native GIL-free JPEG pool (``native/
  dewi_jpeg.cpp``: libjpeg + ``std::thread``, real core scaling;
  1.26–1.49× PIL even single-threaded — docs/perf/ingest_native.json)
  with per-slot PIL fallback; other sources use a PIL thread pool.
* :func:`iter_padded_batches` — a bounded-queue prefetcher: worker threads
  decode batches N+1…N+depth while the caller's device step runs on batch
  N, overlapping host IO with TPU compute.
* :class:`ImageCache` — decode once at a base size, serve any smaller size
  to downstream stages.  MAE / CLIP / blur / NSFW / pHash each want a
  different resolution; without the cache every signal stage re-decodes the
  whole corpus (the reference's behavior, 3-4 decode passes per image).
"""

from __future__ import annotations

import logging
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence, Tuple, Union

import numpy as np

logger = logging.getLogger(__name__)

try:  # Optional dependency: only path/PIL inputs need it.
    from PIL import Image

    _HAS_PIL = True
except Exception:  # pragma: no cover
    Image = None  # type: ignore
    _HAS_PIL = False

ImageLike = Union["Image.Image", np.ndarray, str]

#: Formats whose decoder supports DCT-space draft (downscale-while-decode).
_DRAFT_FORMATS = {"JPEG", "MPO"}


def _resize_pil(img: "Image.Image", size: int) -> np.ndarray:
    if img.mode != "RGB":
        img = img.convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


def resize_uint8(arr: np.ndarray, size: int) -> np.ndarray:
    """Resize an ``[H, W, 3]`` uint8 array to ``[size, size, 3]`` uint8.

    Uses PIL's SIMD resize when available (~50 µs at 224→64); falls back to
    nearest-neighbor index sampling (pure numpy) without PIL.
    """
    if arr.shape[:2] == (size, size):
        return arr
    if _HAS_PIL:
        return _resize_pil(Image.fromarray(arr, mode="RGB"), size)
    h, w = arr.shape[:2]
    yi = np.clip(((np.arange(size) + 0.5) * h / size).astype(np.int64), 0, h - 1)
    xi = np.clip(((np.arange(size) + 0.5) * w / size).astype(np.int64), 0, w - 1)
    return arr[yi][:, xi]


def resize_f32(arr: np.ndarray, size: int) -> np.ndarray:
    """Bilinear-resize an ``[H, W, C]`` float array to ``[size, size, C]``
    **in float** — synthetic float-valued images (e.g. [0,1] test inputs)
    must not lose precision to a uint8 round-trip on the way to the models.
    """
    arr = np.asarray(arr, dtype=np.float32)
    h, w = arr.shape[:2]
    if (h, w) == (size, size):
        return arr
    y = (np.arange(size, dtype=np.float64) + 0.5) * h / size - 0.5
    x = (np.arange(size, dtype=np.float64) + 0.5) * w / size - 0.5
    y0 = np.clip(np.floor(y).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(x).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(y - y0, 0.0, 1.0).astype(np.float32)[:, None, None]
    wx = np.clip(x - x0, 0.0, 1.0).astype(np.float32)[None, :, None]
    top = arr[y0][:, x0] * (1 - wx) + arr[y0][:, x1] * wx
    bot = arr[y1][:, x0] * (1 - wx) + arr[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)


def _array_to_uint8(arr: np.ndarray, size: int) -> np.ndarray:
    """Normalize an in-memory array (f32 [0,1], f32 [0,255], or uint8; HxW or
    HxWx3) into ``[size, size, 3]`` uint8."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.dtype != np.uint8:
        a = arr.astype(np.float32)
        if a.size and float(a.max()) <= 1.5:  # [0,1] floats
            a = a * 255.0
        arr = np.clip(np.round(a), 0, 255).astype(np.uint8)
    return resize_uint8(arr, size)


def decode_image_uint8(src: ImageLike, size: int) -> np.ndarray:
    """Decode/resize any supported input to ``[size, size, 3]`` uint8.

    Path inputs require PIL; JPEG paths decode in draft mode (DCT-space
    downscale) when the stored resolution is ≥2× the target.  Array inputs
    accept uint8 or float ([0,1] or [0,255]) and grayscale.
    """
    if isinstance(src, str):
        if not _HAS_PIL:
            raise ImportError("PIL required to load images from paths")
        with Image.open(src) as img:
            if img.format in _DRAFT_FORMATS:
                # Ask libjpeg for the smallest DCT scale still >= target.
                img.draft("RGB", (size, size))
            img.load()
            return _resize_pil(img, size)
    if _HAS_PIL and Image is not None and isinstance(src, Image.Image):
        return _resize_pil(src, size)
    return _array_to_uint8(src, size)


def effective_threads(threads: int, sources: Sequence[ImageLike]) -> int:
    """Clamp the decode pool to what can actually help.

    Measured on a 1-core host: 335 imgs/s serial vs 237 at 2 threads — PIL
    holds the GIL for much of its decode path, so extra threads are pure
    contention without extra cores.  Array sources (pre-decoded corpora,
    packed mmap rows) only need a ~50 µs resize; pool dispatch costs more
    than the work.
    """
    ncpu = os.cpu_count() or 1
    if ncpu <= 1:
        return 1
    if sources and all(isinstance(s, np.ndarray) for s in sources):
        return 1
    return max(1, min(int(threads), ncpu))


def decode_batch(
    sources: Sequence[ImageLike],
    size: int,
    threads: int = 4,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Ordered parallel decode of ``sources`` into ``[N, size, size, 3]`` uint8.

    Path sources route through the native GIL-free JPEG pool first
    (``native/dewi_jpeg.cpp``: libjpeg draft-scale decode + bilinear resize
    on ``std::thread`` workers — thread scaling is real there, unlike the
    PIL path whose Python glue serializes on the GIL).  Slots the native
    pool can't decode (non-JPEG formats, CMYK, truncated files) and
    non-path sources fall back to the PIL/array path below.
    """
    n = len(sources)
    if out is None:
        out = np.empty((n, size, size, 3), np.uint8)
    # Native threads have no GIL, but the same core-count clamp applies.
    native_threads = max(1, min(int(threads), os.cpu_count() or 1))
    threads = effective_threads(threads, sources)

    todo = list(range(n))
    # Extension gate: only JPEG-suffixed paths enter the native pool —
    # probing a PNG there reads the whole file before the header check
    # fails, doubling IO on non-JPEG corpora.  Odd-suffixed JPEGs just
    # take the (correct, slower) PIL route.
    jpg_idx = [
        i for i in todo
        if isinstance(sources[i], str)
        and sources[i].lower().endswith((".jpg", ".jpeg", ".mpo"))
    ]
    if jpg_idx:
        from ..native import decode_jpeg_batch

        whole = len(jpg_idx) == n and out.flags["C_CONTIGUOUS"]
        res = decode_jpeg_batch(
            [sources[i] for i in jpg_idx], size, threads=native_threads,
            out=out if whole else None,
        )
        if res is not None:
            dec, ok = res
            done = set()
            for j, i in enumerate(jpg_idx):
                if ok[j]:
                    if not whole:
                        out[i] = dec[j]
                    done.add(i)
            todo = [i for i in todo if i not in done]

    def work(i: int) -> None:
        out[i] = decode_image_uint8(sources[i], size)

    if len(todo) <= 1 or threads <= 1:
        for i in todo:
            work(i)
        return out
    with ThreadPoolExecutor(max_workers=min(threads, len(todo))) as pool:
        list(pool.map(work, todo))
    return out


def iter_padded_batches(
    sources: Sequence[ImageLike],
    size: int,
    batch_size: int,
    threads: int = 4,
    depth: int = 2,
) -> Iterator[Tuple[np.ndarray, int]]:
    """Yield ``(batch [batch_size, size, size, 3] uint8, pad)`` in order.

    The last batch is zero-padded to the static ``batch_size`` (``pad`` rows
    are padding) so every device dispatch reuses one compiled shape.  Up to
    ``depth`` batches are decoded ahead by a background thread pool so host
    decode overlaps the caller's device compute; decode errors surface on
    the consuming thread at the failing batch.
    """
    n = len(sources)
    if n == 0:
        return
    # NB: even with a 1-thread decode pool the producer thread stays —
    # host decode overlaps *device* compute (the GIL releases while the
    # consumer blocks on the TPU), which is the prefetcher's entire point.
    threads = effective_threads(threads, sources)
    starts = list(range(0, n, batch_size))
    if len(starts) == 1:
        for s in starts:
            chunk = sources[s : s + batch_size]
            batch = np.zeros((batch_size, size, size, 3), np.uint8)
            decode_batch(chunk, size, threads=threads, out=batch[: len(chunk)])
            yield batch, batch_size - len(chunk)
        return

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()

    def produce() -> None:
        try:
            n_src = len(sources)
            for s in starts:
                if stop.is_set():
                    return
                batch = np.zeros((batch_size, size, size, 3), np.uint8)
                # Arithmetic, not sources[s:s+batch_size]: slicing a lazy
                # view (PackedImages._ResizedRows) RESIZES the whole batch
                # just to count it, doubling the host resize cost.  Per-item
                # indexing keeps lazy views lazy; decode_batch then routes
                # path sources through the native JPEG pool.
                m = min(batch_size, n_src - s)
                chunk = [sources[s + i] for i in range(m)]
                decode_batch(chunk, size, threads=threads, out=batch[:m])
                q.put((batch, batch_size - m))
            q.put(None)
        except BaseException as e:  # surfaced on the consumer thread
            q.put(e)

    producer = threading.Thread(target=produce, daemon=True)
    producer.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # Drain so the producer's blocked put() releases, then shut down.
        while producer.is_alive():
            try:
                q.get_nowait()
            except queue.Empty:
                pass
            producer.join(timeout=0.05)


class ImageCache:
    """Decode a document set once; serve every stage's resolution from RAM.

    ``base`` holds ``[N, base_size, base_size, 3]`` uint8 (the largest size
    any stage needs); :meth:`at` derives smaller sizes on demand and caches
    them.  :meth:`fits` pre-checks the RAM budget so corpus-scale callers can
    fall back to per-stage streaming decode instead.
    """

    def __init__(
        self,
        sources: Sequence[ImageLike],
        base_size: int,
        threads: int = 4,
    ) -> None:
        self.base_size = int(base_size)
        self.threads = int(threads)
        self.base = decode_batch(sources, self.base_size, threads=self.threads)
        self._derived: dict = {}

    @staticmethod
    def fits(n_images: int, base_size: int, budget_mb: int) -> bool:
        return n_images * base_size * base_size * 3 <= budget_mb * 2**20

    def at(self, size: int) -> np.ndarray:
        """``[N, size, size, 3]`` uint8 view of the corpus at ``size``."""
        size = int(size)
        if size == self.base_size:
            return self.base
        if size > self.base_size:
            raise ValueError(
                f"ImageCache holds {self.base_size}px; cannot serve {size}px"
            )
        if size not in self._derived:
            n = len(self.base)
            out = np.empty((n, size, size, 3), np.uint8)

            def work(i: int) -> None:
                out[i] = resize_uint8(self.base[i], size)

            if self.threads > 1 and n > 1:
                with ThreadPoolExecutor(max_workers=self.threads) as pool:
                    list(pool.map(work, range(n)))
            else:
                for i in range(n):
                    work(i)
            self._derived[size] = out
        return self._derived[size]

    def __len__(self) -> int:
        return len(self.base)



def iter_corpus_batches(
    images: Sequence[ImageLike],
    size: int,
    batch_size: int,
    threads: int = 4,
    depth: int = 2,
) -> Iterator[Tuple[np.ndarray, int]]:
    """``(batch [bs, size, size, 3], pad)`` stream for an image corpus.

    A pre-decoded ``[N, size, size, 3]`` ndarray is sliced directly (no
    decode); anything else routes through :func:`iter_padded_batches`
    (threaded decode + prefetch).  Float arrays in uint8 range (max > 1.5)
    are scaled to [0, 1] per chunk — the same convention as
    ``to_image_array`` — so results do not depend on whether the caller
    passes one 4D array or a list of 3D arrays.
    """
    from .device_images import DeviceImages

    if isinstance(images, DeviceImages):
        # Device-resident corpus: per-batch device slices (and on-device
        # resize when the stage resolution differs) — zero host decode and
        # zero re-upload; the pad rides on device too.
        import jax.numpy as jnp

        n = len(images)
        for s in range(0, n, batch_size):
            hi = min(s + batch_size, n)
            chunk = images.rows_at(s, hi, size)
            pad = batch_size - (hi - s)
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            yield chunk, pad
        return
    if (
        isinstance(images, np.ndarray)
        and images.ndim == 4
        and images.shape[1:3] == (size, size)
    ):
        scale = (
            images.dtype != np.uint8
            and images.size
            and float(images.max()) > 1.5
        )
        for s in range(0, len(images), batch_size):
            chunk = images[s : s + batch_size]
            if scale:
                chunk = chunk.astype(np.float32) / 255.0
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            yield chunk, pad
        return
    yield from iter_padded_batches(images, size, batch_size,
                                   threads=threads, depth=depth)


__all__ = [
    "ImageCache",
    "ImageLike",
    "decode_batch",
    "decode_image_uint8",
    "iter_corpus_batches",
    "iter_padded_batches",
    "resize_f32",
    "resize_uint8",
]
