"""DEWI-TPU: an entropy-weighted index for text+image corpora, TPU-native.

A from-scratch JAX/XLA/Pallas rebuild of the DEWI system
(lexsightllc/DEWI-Design-for-an-Entropy-Weighted-Index-for-Text-Image-Corpora):
every document is scored by "useful surprise" — text LM surprisal, image
reconstruction entropy, cross-modal dependency, redundancy and noise folded
through robust statistics into a DEWI score in [0, 1] — and search results
are re-ranked by ``(1-eta)*sim + eta*dewi + entropy_pref*mean_entropy``.

Public root exports match the reference package root (reference
__init__.py:5-15) plus the ``Signals`` record its README promises.
"""

from .config import DewiConfig, get_default_config
from .index import DewiIndex, ExactIndex, IVFIndex, IndexBackend
from .pipelines import DewiPipeline, Document, create_document
from .scorer import DewiScorer, RobustStats, local_weights_from_surprisal
from .types import Payload, Signals, Weights

__version__ = "0.1.0"

__all__ = [
    "DewiScorer",
    "RobustStats",
    "Weights",
    "Payload",
    "Signals",
    "DewiIndex",
    "ExactIndex",
    "IVFIndex",
    "IndexBackend",
    "DewiConfig",
    "get_default_config",
    "DewiPipeline",
    "Document",
    "create_document",
    "local_weights_from_surprisal",
    "__version__",
]
