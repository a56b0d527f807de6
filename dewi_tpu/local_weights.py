"""Local (per-token / per-patch) weighting utilities.

Parity with reference local_weights.py:5-26, computed as a single jitted
XLA kernel (median/MAD/clip/softplus fused) instead of numpy host math.
"""

from .scorer import local_weights_from_surprisal

__all__ = ["local_weights_from_surprisal"]
