#!/usr/bin/env python
"""Signal-extraction throughput benchmark (text LM + image MAE).

Complements ``profile_index.py`` (which measures the index) by measuring the
other half of the ``dewi process`` pipeline — the signal backbones — against
the north-star budget (BASELINE.md: 1M docs with full signals in <5 min on a
v5e-16, i.e. <80 min single-chip).

Usage:
  python scripts/profile_signals.py --n-docs 8192 --model small
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WORDS = (
    "alpha beta gamma delta entropy index corpus signal token image model "
    "robust search weight noise data surprise useful document query"
).split()


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-docs", type=int, default=8192)
    ap.add_argument("--n-images", type=int, default=256)
    ap.add_argument("--model", default="small", help="backbone preset")
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--output", default="signals_metrics.json")
    args = ap.parse_args()

    import jax

    from dewi_tpu.signals import ImageEntropyEstimator, TextEntropyEstimator

    rng = np.random.default_rng(0)
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(20, 60)))
        for _ in range(args.n_docs)
    ]
    print(f"Device: {jax.devices()[0]}")

    est = TextEntropyEstimator(model_name=args.model,
                               batch_size=args.batch_size, max_length=512)
    est.batch_compute_stats(texts)  # warm: compiles every bucket shape
    t0 = time.perf_counter()
    est.batch_compute_stats(texts)
    text_s = time.perf_counter() - t0
    text_dps = args.n_docs / text_s
    print(f"text entropy ({args.model}): {text_dps:,.0f} docs/s "
          f"-> 1M docs: {1e6 / text_dps:,.0f}s single chip")

    imgs = rng.random(
        (args.n_images, args.image_size, args.image_size, 3)
    ).astype(np.float32)
    ie = ImageEntropyEstimator(model_name=args.model, batch_size=64,
                               image_size=args.image_size)
    ie.batch_compute_stats(imgs[:128])
    t0 = time.perf_counter()
    ie.batch_compute_stats(imgs)
    img_s = time.perf_counter() - t0
    img_dps = args.n_images / img_s
    print(f"image entropy ({args.model}): {img_dps:,.0f} imgs/s "
          f"-> 1M: {1e6 / img_dps:,.0f}s single chip")

    metrics = {
        "model": args.model,
        "text_docs_per_sec": round(text_dps, 1),
        "text_1M_docs_seconds_single_chip": round(1e6 / text_dps, 1),
        "image_docs_per_sec": round(img_dps, 1),
        "device": str(jax.devices()[0]),
    }
    Path(args.output).write_text(json.dumps(metrics, indent=2))
    print(json.dumps(metrics, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
