"""Cross-modal dependency (text↔image mutual-information proxy) via CLIP.

API parity with the reference estimator (reference cross_modal.py:15-157):
``CrossModalResult`` fields, ``compute_similarity`` / ``batch_compute`` /
``__call__``, batch path computing the full similarity matrix and taking its
diagonal (cross_modal.py:132-139).

TPU-first: both towers are jitted Flax models; a batch is two tower forwards
plus one MXU matmul — no per-pair Python loop.  The text tower doubles as
the query encoder for search (fixes SURVEY.md §2.4 item 6).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registry import clip_config, init_clip, maybe_load
from .image_entropy import ImageLike, to_image_array
from .tokenizer import get_tokenizer


@dataclass
class CrossModalResult:
    """Parity: reference cross_modal.py:9-13."""

    info_nce_score: float
    text_to_image_sim: float
    image_to_text_sim: float


class CrossModalDependency:
    """CLIP text↔image cosine similarity as an InfoNCE MI lower-bound proxy."""

    def __init__(
        self,
        model_name: str = "small",
        device: Optional[str] = None,
        batch_size: int = 128,
        tokenizer: str = "byte",
        checkpoint: Optional[str] = None,
        seed: int = 0,
    ):
        del device
        self.batch_size = int(batch_size)
        self.tokenizer = get_tokenizer(tokenizer)
        self.cfg = clip_config(model_name, vocab_size=self.tokenizer.vocab_size)
        self.model, params = init_clip(self.cfg, seed=seed)
        self.params = maybe_load(params, checkpoint)

        @jax.jit
        def _encode_text(params, ids, mask):
            return self.model.apply(
                params, ids, mask, method=self.model.encode_text
            )

        @jax.jit
        def _encode_image(params, images):
            return self.model.apply(
                params, images, method=self.model.encode_image
            )

        self._encode_text = _encode_text
        self._encode_image = _encode_image

    # -- encoders (shared with search + redundancy) ---------------------------

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        """L2-normalized text embeddings ``[N, d_embed]``."""
        out = []
        for start in range(0, len(texts), self.batch_size):
            chunk = list(texts[start : start + self.batch_size])
            ids, mask = self.tokenizer.encode_batch(
                chunk, self.cfg.text_len, pad_to=self.cfg.text_len
            )
            out.append(np.asarray(
                self._encode_text(self.params, jnp.asarray(ids), jnp.asarray(mask))
            ))
        return np.concatenate(out) if out else np.zeros((0, self.cfg.d_embed))

    def encode_images(self, images: Sequence[ImageLike]) -> np.ndarray:
        """L2-normalized image embeddings ``[N, d_embed]``."""
        out = []
        for start in range(0, len(images), self.batch_size):
            chunk = np.stack([
                to_image_array(im, self.cfg.image_size)
                for im in images[start : start + self.batch_size]
            ])
            out.append(np.asarray(
                self._encode_image(self.params, jnp.asarray(chunk))
            ))
        return np.concatenate(out) if out else np.zeros((0, self.cfg.d_embed))

    # -- public API -----------------------------------------------------------

    def compute_similarity(self, text: str, image: ImageLike) -> CrossModalResult:
        """Single text-image pair (parity: cross_modal.py:34-86)."""
        return self.batch_compute([text], [image])[0]

    def batch_compute(
        self,
        texts: Sequence[str],
        images: Sequence[ImageLike],
        batch_size: Optional[int] = None,
    ) -> List[CrossModalResult]:
        """Diagonal of the text×image cosine matrix per batch
        (parity: cross_modal.py:87-149)."""
        if len(texts) != len(images):
            raise ValueError("Number of texts and images must match")
        if not len(texts):
            return []
        if batch_size is not None:
            self.batch_size = int(batch_size)
        t = self.encode_texts(texts)
        v = self.encode_images(images)
        # Embeddings are already normalized; dot product is cosine.
        sims = np.sum(t * v, axis=1)
        return [
            CrossModalResult(
                info_nce_score=float(s),
                text_to_image_sim=float(s),
                image_to_text_sim=float(s),
            )
            for s in sims
        ]

    def similarity_matrix(
        self, texts: Sequence[str], images: Sequence[ImageLike]
    ) -> np.ndarray:
        """Full ``[N, M]`` text×image cosine matrix (one MXU matmul)."""
        t = self.encode_texts(texts)
        v = self.encode_images(images)
        return t @ v.T

    def __call__(self, text: str, image: ImageLike) -> CrossModalResult:
        return self.compute_similarity(text, image)


__all__ = ["CrossModalDependency", "CrossModalResult"]
