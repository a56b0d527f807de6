"""Noise / quality estimation with graceful optional dependencies.

API parity with the reference estimator (reference noise.py:39-97):
``detect_nsfw`` / ``check_text_quality`` / ``check_language`` / ``ocr_text``
with identical heuristics and neutral fallbacks (0.0 / 0.5 / "").  This
module additionally defines the coherent combined ``score``/``batch_compute``
contract the reference pipeline calls but never implemented
(pipelines.py:156 — SURVEY.md §2.4 item 5), plus the blur detector its
config promises (``blur_threshold``, reference config.py:36).

Everything here is host-side by design — string heuristics and optional
classifiers are not TPU work (SURVEY.md §2.2: tesseract stays a host-side
CPU step); only the blur Laplacian is vectorized with numpy.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def _try_langdetect():
    try:  # optional dependency (parity: reference noise.py:21-27)
        from langdetect import detect

        return detect
    except Exception:
        return None


def _try_tesseract():
    try:  # optional dependency (parity: reference noise.py:30-36)
        import pytesseract

        return pytesseract
    except Exception:
        return None


class NoiseEstimator:
    """Text-quality + image-noise heuristics with neutral fallbacks.

    Accepts the union of the reference ctor (noise.py:40) and the kwargs its
    pipeline passes (pipelines.py:77-81).  ``nsfw_fn`` is an injectable
    classifier callable (image -> risk in [0,1]); absent, NSFW risk is 0.0 —
    the same graceful-absence contract as the reference's hub pipeline
    (noise.py:47-50).
    """

    def __init__(
        self,
        expected_language: str = "en",
        device: Optional[str] = None,
        enable_nsfw: bool = True,
        blur_threshold: float = 0.25,
        ocr_min_coverage: float = 0.6,
        nsfw_filter: str = "lite",
        nsfw_fn=None,
        **_: object,
    ):
        del device
        self.expected_language = expected_language
        self.blur_threshold = float(blur_threshold)
        self.ocr_min_coverage = float(ocr_min_coverage)
        self.nsfw_filter = nsfw_filter
        self.nsfw_fn = nsfw_fn if (enable_nsfw and nsfw_filter != "none") else None
        self.ocr = _try_tesseract()
        self._lang_detect = _try_langdetect()

    # -- parity methods (reference noise.py:47-97) ----------------------------

    def detect_nsfw(self, image) -> float:
        if self.nsfw_fn is None:
            return 0.0
        try:
            return float(np.clip(self.nsfw_fn(image), 0.0, 1.0))
        except Exception as e:  # noqa: BLE001
            logger.debug("NSFW detection failed: %s", e)
            return 0.0

    def check_text_quality(self, text: str) -> float:
        """Alnum/symbol-ratio heuristic (parity: reference noise.py:65-78)."""
        if not text:
            return 0.0
        total = max(len(text), 1)
        alnum = sum(c.isalnum() for c in text)
        symbol = sum((not c.isalnum()) and c not in " \n\t\r" for c in text)
        score = 1.0
        if alnum / total < 0.3:
            score -= 0.4
        if symbol / total > 0.5:
            score -= 0.2
        return float(np.clip(score, 0.0, 1.0))

    def check_language(self, text: str) -> float:
        """1.0 match / 0.0 mismatch / 0.5 unknown (parity: noise.py:80-89)."""
        if not text or len(text.strip()) < 2:
            return 0.5
        if self._lang_detect is None:
            return 0.5
        try:
            return 1.0 if self._lang_detect(text) == self.expected_language else 0.0
        except Exception:
            return 0.5

    def ocr_text(self, image) -> str:
        """OCR extraction, "" when tesseract absent (parity: noise.py:91-97)."""
        if self.ocr is None:
            return ""
        try:
            return self.ocr.image_to_string(image) or ""
        except Exception:
            return ""

    # -- blur (promised by reference config.py:36, never implemented) ---------

    def blur_score(self, image) -> float:
        """Laplacian-variance sharpness in [0, ~): below ``blur_threshold``
        means blurry.  Scale-invariant via luma normalization to [0, 1]."""
        from .image_entropy import to_image_array

        arr = to_image_array(image, 224)
        luma = 0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
        lap = (
            -4.0 * luma[1:-1, 1:-1]
            + luma[:-2, 1:-1]
            + luma[2:, 1:-1]
            + luma[1:-1, :-2]
            + luma[1:-1, 2:]
        )
        return float(lap.var() * 1e3)  # rescaled so ~0.25 separates blurry

    # -- coherent combined contract -------------------------------------------

    def score(self, text: Optional[str] = None, image=None) -> float:
        """Combined noise in [0, 1]; higher = noisier.

        Deterministic blend of the available components:
        text: ``1 - (0.7*quality + 0.3*language)``;
        image: ``max(nsfw_risk, blurry_indicator)``;
        result = mean over present modalities.
        """
        parts: List[float] = []
        if text is not None:
            q = self.check_text_quality(text)
            lang = self.check_language(text)
            parts.append(1.0 - (0.7 * q + 0.3 * lang))
        if image is not None:
            nsfw = self.detect_nsfw(image)
            blurry = 1.0 if self.blur_score(image) < self.blur_threshold else 0.0
            parts.append(max(nsfw, 0.5 * blurry))
        if not parts:
            return 0.0
        return float(np.clip(np.mean(parts), 0.0, 1.0))

    def batch_compute(
        self,
        texts: Optional[Sequence[Optional[str]]] = None,
        images: Optional[Sequence] = None,
    ) -> List[float]:
        n = len(texts) if texts is not None else len(images)  # type: ignore[arg-type]
        texts = texts if texts is not None else [None] * n
        images = images if images is not None else [None] * n
        return [self.score(t, im) for t, im in zip(texts, images)]


__all__ = ["NoiseEstimator"]
