"""Shared transformer building blocks (Flax) for the DEWI signal backbones.

The reference consumes GPT-2 / ViT-MAE / CLIP through torch+transformers
(reference text_entropy.py:30-38, image_entropy.py:39-41, cross_modal.py:30).
Here the backbones are first-class Flax modules compiled by XLA for the MXU:
pre-LN blocks, fused-friendly shapes (model dims padded to lane multiples in
the presets), bfloat16 compute with float32 parameters, and static sequence
lengths (estimators bucket/pad batches so jit traces stay cached).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 258
    d_model: int = 256
    n_heads: int = 4
    n_layers: int = 4
    d_ff: int = 1024
    max_len: int = 512
    dropout: float = 0.0  # inference-only framework: kept for completeness
    causal: bool = True
    dtype: str = "bfloat16"  # compute dtype; params stay float32
    # Numerics knobs for weight-import parity with external checkpoints
    # (GPT-2: ln_eps=1e-5; CLIP: quick_gelu + 1e-5; ViT: gelu_exact + 1e-12).
    # Defaults reproduce this framework's native behavior exactly.
    ln_eps: float = 1e-6
    activation: str = "gelu"  # "gelu" (tanh approx) | "gelu_exact" | "quick_gelu"

    @property
    def compute_dtype(self) -> Any:
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def activation_fn(name: str) -> Any:
    if name == "gelu":
        return nn.gelu  # tanh approximation (GPT-2's gelu_new)
    if name == "gelu_exact":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    raise ValueError(f"Unknown activation {name!r}")


class MLP(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.cfg.compute_dtype
        x = nn.Dense(self.cfg.d_ff, dtype=dt, name="fc_in")(x)
        x = activation_fn(self.cfg.activation)(x)
        return nn.Dense(self.cfg.d_model, dtype=dt, name="fc_out")(x)


class Block(nn.Module):
    """Pre-LN transformer block: x + attn(ln(x)); x + mlp(ln(x))."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 attn_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg
        dt = cfg.compute_dtype
        h = nn.LayerNorm(dtype=jnp.float32, epsilon=cfg.ln_eps,
                         name="ln_attn")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=cfg.n_heads,
            dtype=dt,
            qkv_features=cfg.d_model,
            out_features=cfg.d_model,
            name="attn",
        )(h, h, mask=attn_mask)
        x = x + h
        h = nn.LayerNorm(dtype=jnp.float32, epsilon=cfg.ln_eps,
                         name="ln_mlp")(x)
        return x + MLP(cfg, name="mlp")(h)


def make_attention_mask(
    pad_mask: jnp.ndarray, causal: bool
) -> jnp.ndarray:
    """Build a [B, 1, T, T] boolean attention mask from a [B, T] pad mask."""
    att = pad_mask[:, None, None, :] * jnp.ones_like(pad_mask)[:, None, :, None]
    if causal:
        t = pad_mask.shape[-1]
        tri = jnp.tril(jnp.ones((t, t), dtype=bool))
        att = att * tri[None, None, :, :]
    return att.astype(bool)


class Encoder(nn.Module):
    """A stack of blocks over already-embedded inputs."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg
        attn_mask = None
        if pad_mask is not None or cfg.causal:
            if pad_mask is None:
                pad_mask = jnp.ones(x.shape[:2], dtype=bool)
            attn_mask = make_attention_mask(pad_mask.astype(bool), cfg.causal)
        for i in range(cfg.n_layers):
            x = Block(cfg, name=f"block_{i}")(x, attn_mask)
        return nn.LayerNorm(dtype=jnp.float32, epsilon=cfg.ln_eps,
                            name="ln_final")(x)


__all__ = [
    "TransformerConfig",
    "Encoder",
    "Block",
    "MLP",
    "make_attention_mask",
    "activation_fn",
]
