from typing import Any, List
"""DEWI-TPU: an entropy-weighted index for text+image corpora, TPU-native.

A from-scratch JAX/XLA/Pallas rebuild of the DEWI system
(lexsightllc/DEWI-Design-for-an-Entropy-Weighted-Index-for-Text-Image-Corpora):
every document is scored by "useful surprise" — text LM surprisal, image
reconstruction entropy, cross-modal dependency, redundancy and noise folded
through robust statistics into a DEWI score in [0, 1] — and search results
are re-ranked by ``(1-eta)*sim + eta*dewi + entropy_pref*mean_entropy``.

Public root exports match the reference package root (reference
__init__.py:5-15) plus the ``Signals`` record its README promises.  Exports
resolve lazily (PEP 562), mirroring the reference's lazy-loading discipline
(reference README.md:16, cli.py:21-39): importing ``dewi_tpu`` does not pull
in JAX until a symbol is actually used.
"""

__version__ = "0.1.0"

_EXPORTS = {
    "DewiScorer": ("dewi_tpu.scorer", "DewiScorer"),
    "RobustStats": ("dewi_tpu.scorer", "RobustStats"),
    "local_weights_from_surprisal": (
        "dewi_tpu.scorer", "local_weights_from_surprisal"
    ),
    "Weights": ("dewi_tpu.types", "Weights"),
    "Payload": ("dewi_tpu.types", "Payload"),
    "Signals": ("dewi_tpu.types", "Signals"),
    "DewiIndex": ("dewi_tpu.index", "DewiIndex"),
    "ExactIndex": ("dewi_tpu.index", "ExactIndex"),
    "IVFIndex": ("dewi_tpu.index", "IVFIndex"),
    "QuantizedIndex": ("dewi_tpu.index", "QuantizedIndex"),
    "IndexBackend": ("dewi_tpu.index", "IndexBackend"),
    "DewiConfig": ("dewi_tpu.config", "DewiConfig"),
    "get_default_config": ("dewi_tpu.config", "get_default_config"),
    "DewiPipeline": ("dewi_tpu.pipelines", "DewiPipeline"),
    "Corpus": ("dewi_tpu.corpus", "Corpus"),
    "Document": ("dewi_tpu.pipelines", "Document"),
    "create_document": ("dewi_tpu.pipelines", "create_document"),
    "MicroBatcher": ("dewi_tpu.serve", "MicroBatcher"),
    "SearchServer": ("dewi_tpu.serve", "SearchServer"),
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name: str) -> Any:
    try:
        module_name, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        ) from None
    import importlib

    value = getattr(importlib.import_module(module_name), attr)
    globals()[name] = value  # cache for subsequent lookups
    return value


def __dir__() -> List[str]:
    return __all__
