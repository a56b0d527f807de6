"""Image entropy via ViT-MAE masked-reconstruction error.

API parity with the reference estimator (reference image_entropy.py:19-74):
``score(image) -> float`` (MSE, non-negative) with a model-free pixel
``var/mean^2`` proxy fallback (image_entropy.py:51-54).  TPU-first additions:
``batch_compute`` scores whole padded ``[B, H, W, 3]`` batches in one jitted
forward (the reference has no image batch path at all — SURVEY.md §2.4
item 3), and masking uses static visible/masked counts so one trace serves
every batch.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mae import pixel_entropy_proxy, pixel_patch_proxy
from ..models.registry import init_mae, mae_config, maybe_load
from ..ops.robust import masked_mean_and_quantiles

logger = logging.getLogger(__name__)

try:  # Optional dependency, used only to decode/resize PIL inputs.
    from PIL import Image

    _HAS_PIL = True
except Exception:  # pragma: no cover
    Image = None  # type: ignore
    _HAS_PIL = False

ImageLike = Union["Image.Image", np.ndarray, str]


def to_image_array(image: ImageLike, size: int) -> np.ndarray:
    """Decode/resize any supported input to ``[size, size, 3]`` f32 in [0,1]."""
    if isinstance(image, str):
        if not _HAS_PIL:
            raise ImportError("PIL required to load images from paths")
        image = Image.open(image)
    if _HAS_PIL and Image is not None and isinstance(image, Image.Image):
        arr = np.asarray(
            image.convert("RGB").resize((size, size)), dtype=np.float32
        ) / 255.0
        return arr
    arr = np.asarray(image, dtype=np.float32)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.max() > 1.5:  # uint8-range input
        arr = arr / 255.0
    if arr.shape[:2] != (size, size):
        arr = np.asarray(
            jax.image.resize(jnp.asarray(arr), (size, size, 3), method="bilinear")
        )
    return arr.astype(np.float32)


class ImageEntropyEstimator:
    """MAE reconstruction-loss estimator with batched jitted inference.

    Accepts the union of the reference ctor (image_entropy.py:26-33) and the
    pipeline's kwargs (pipelines.py:56-61) — SURVEY.md §2.4 item 1.  Pass
    ``model_name="pixel"`` to force the variance-proxy fallback.
    """

    def __init__(
        self,
        model_name: str = "small",
        device: Optional[str] = None,
        mask_ratio: float = 0.75,
        patch_size: Optional[int] = None,
        image_size: Optional[int] = None,
        batch_size: int = 64,
        checkpoint: Optional[str] = None,
        seed: int = 0,
        **_: object,
    ):
        del device
        self.batch_size = int(batch_size)
        self.mask_ratio = float(mask_ratio)
        if model_name in ("pixel", "none", "proxy"):
            self.model = None
            self.params = None
            self.cfg = None
            self.image_size = int(image_size or 224)
            return
        from ..models.import_hf import sidecar_config

        side = sidecar_config(checkpoint)
        if side is not None:
            import dataclasses

            from ..models.mae import MAEConfig

            # Sidecar defines the architecture; mask_ratio stays tunable.
            self.cfg = dataclasses.replace(
                MAEConfig(**side["config"]), mask_ratio=self.mask_ratio
            )
        else:
            over = {"mask_ratio": self.mask_ratio}
            if patch_size:
                over["patch_size"] = int(patch_size)
            if image_size:
                over["image_size"] = int(image_size)
            self.cfg = mae_config(model_name, **over)
        self.image_size = self.cfg.image_size
        self.model, params = init_mae(self.cfg, seed=seed)
        self.params = maybe_load(params, checkpoint)
        self._apply = jax.jit(self.model.apply)

        @jax.jit
        def _stats(params, images, rng):
            per_patch, mask = self.model.apply(
                params, images, rng, method=self.model.patch_losses
            )
            mean, qs = masked_mean_and_quantiles(
                per_patch, mask, jnp.asarray([0.9], jnp.float32)
            )
            return mean, qs[:, 0]

        self._stats = _stats

        # Superbatch: S batches per dispatch (see text_entropy — host
        # launches per corpus drop by S).
        @jax.jit
        def _stats_super(params, images4, rngs):
            return jax.lax.map(
                lambda xr: _stats(params, xr[0], xr[1]), (images4, rngs)
            )

        self._stats_super = _stats_super
        self.superbatch = 8

    # -- public API ---------------------------------------------------------

    def score(self, image: ImageLike, seed: int = 0) -> float:
        """Single-image reconstruction MSE (parity: image_entropy.py:51-74).

        The random patch mask is seeded (deterministic), unlike the
        reference's unseeded ``torch.randperm`` — reproducibility is part of
        this framework's contract.
        """
        return self.batch_compute([image], seed=seed)[0]

    def batch_compute(
        self, images: Sequence[ImageLike], seed: int = 0,
        batch_size: Optional[int] = None,
    ) -> List[float]:
        if not len(images):
            return []
        bs = int(batch_size or self.batch_size)
        arrays = np.stack(
            [to_image_array(im, self.image_size) for im in images]
        )
        if self.model is None:
            return [float(v) for v in np.asarray(pixel_entropy_proxy(arrays))]
        out: List[float] = []
        for start in range(0, len(arrays), bs):
            chunk = arrays[start : start + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)]
                )
            losses = self._apply(
                self.params, jnp.asarray(chunk),
                jax.random.fold_in(jax.random.PRNGKey(seed), start),
            )
            out.extend(float(v) for v in np.asarray(losses)[: bs - pad])
        return out

    def batch_compute_stats(
        self, images: Sequence[ImageLike], seed: int = 0,
        batch_size: Optional[int] = None,
    ) -> tuple:
        """Per-image ``(mean, q90)`` of patch reconstruction error.

        The pipeline's ``hi_mean``/``hi_q90`` source — the reference promised
        image quantiles (pipelines.py:121-128) its scalar estimator could
        never provide (SURVEY.md §2.4 item 3).
        """
        if not len(images):
            return np.zeros(0, np.float32), np.zeros(0, np.float32)
        bs = int(batch_size or self.batch_size)
        arrays = np.stack(
            [to_image_array(im, self.image_size) for im in images]
        )
        if self.model is None:
            per_patch = np.asarray(pixel_patch_proxy(jnp.asarray(arrays)))
            return (
                per_patch.mean(axis=1).astype(np.float32),
                np.quantile(per_patch, 0.9, axis=1).astype(np.float32),
            )
        means: List[float] = []
        q90s: List[float] = []

        def padded(start):
            chunk = arrays[start : start + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)]
                )
            return chunk, pad

        starts = list(range(0, len(arrays), bs))
        S = max(1, int(self.superbatch))
        pos = 0
        base_key = jax.random.PRNGKey(seed)
        while len(starts) - pos >= S:
            group = starts[pos : pos + S]
            stacks = [padded(s) for s in group]
            images4 = np.stack([c for c, _ in stacks])
            rngs = jnp.stack([jax.random.fold_in(base_key, s) for s in group])
            m3, q3 = self._stats_super(self.params, jnp.asarray(images4), rngs)
            m3 = np.asarray(m3)
            q3 = np.asarray(q3)
            for i, (_, pad) in enumerate(stacks):
                means.extend(m3[i][: bs - pad].tolist())
                q90s.extend(q3[i][: bs - pad].tolist())
            pos += S
        for start in starts[pos:]:
            chunk, pad = padded(start)
            m, q = self._stats(
                self.params, jnp.asarray(chunk),
                jax.random.fold_in(base_key, start),
            )
            means.extend(np.asarray(m)[: bs - pad].tolist())
            q90s.extend(np.asarray(q)[: bs - pad].tolist())
        return np.asarray(means, np.float32), np.asarray(q90s, np.float32)

    def __call__(self, image: ImageLike, **kwargs) -> float:
        return self.score(image, **kwargs)


__all__ = ["ImageEntropyEstimator", "to_image_array", "ImageLike"]
