"""CLIP-style dual encoder: text tower + image tower + projection heads.

TPU-native replacement for the reference's ``openai/clip-vit-base-patch32``
usage (reference cross_modal.py:29-79, redundancy.py:24-39).  Text and image
embeddings come out L2-normalized so cross-modal similarity, redundancy
matrices, and the query-text encoder in search (SURVEY.md §2.4 item 6) are
plain MXU matmuls on the caller side.
"""

from __future__ import annotations

from typing import Any

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from .transformer import Encoder, TransformerConfig


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    vocab_size: int = 258
    text_len: int = 77          # CLIP's max text length (reference cross_modal.py:55)
    d_text: int = 256
    text_heads: int = 4
    text_layers: int = 4
    image_size: int = 224
    patch_size: int = 32
    d_image: int = 256
    image_heads: int = 4
    image_layers: int = 4
    d_embed: int = 256
    dtype: str = "bfloat16"
    # Import-parity knobs (dewi_tpu.models.import_hf): OpenAI CLIP uses
    # quick_gelu, ln_eps=1e-5, a pre-encoder LayerNorm on the vision tower,
    # and explicit FF widths.  Defaults preserve native behavior (0 = 4*d).
    ln_eps: float = 1e-6
    activation: str = "gelu"
    image_pre_ln: bool = False
    text_ff: int = 0
    image_ff: int = 0

    def text_cfg(self) -> TransformerConfig:
        return TransformerConfig(
            vocab_size=self.vocab_size,
            d_model=self.d_text,
            n_heads=self.text_heads,
            n_layers=self.text_layers,
            d_ff=self.text_ff or 4 * self.d_text,
            max_len=self.text_len,
            causal=True,  # CLIP text towers are causal
            dtype=self.dtype,
            ln_eps=self.ln_eps,
            activation=self.activation,
        )

    def image_cfg(self) -> TransformerConfig:
        p = (self.image_size // self.patch_size) ** 2
        return TransformerConfig(
            vocab_size=1,
            d_model=self.d_image,
            n_heads=self.image_heads,
            n_layers=self.image_layers,
            d_ff=self.image_ff or 4 * self.d_image,
            max_len=p + 1,
            causal=False,
            dtype=self.dtype,
            ln_eps=self.ln_eps,
            activation=self.activation,
        )


def _normalize(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class CLIPTextTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, ids: jnp.ndarray, pad_mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        tc = cfg.text_cfg()
        dt = tc.compute_dtype
        tok = nn.Embed(cfg.vocab_size, cfg.d_text, dtype=dt, name="wte")
        pos = nn.Embed(cfg.text_len, cfg.d_text, dtype=dt, name="wpe")
        x = tok(ids) + pos(jnp.arange(ids.shape[1]))[None, :, :]
        x = Encoder(tc, name="encoder")(x, pad_mask)
        # Pool at the last valid token (CLIP's EOT pooling).
        last = jnp.maximum(pad_mask.sum(axis=1).astype(jnp.int32) - 1, 0)
        pooled = jnp.take_along_axis(x, last[:, None, None], axis=1).squeeze(1)
        out = nn.Dense(cfg.d_embed, use_bias=False, dtype=jnp.float32,
                       name="text_proj")(pooled)
        return _normalize(out)


class CLIPImageTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        from .mae import patchify

        cfg = self.cfg
        ic = cfg.image_cfg()
        dt = ic.compute_dtype
        patches = patchify(images.astype(jnp.float32), cfg.patch_size)
        x = nn.Dense(cfg.d_image, dtype=dt, name="patch_embed")(patches)
        cls = self.param(
            "cls", nn.initializers.normal(0.02), (1, 1, cfg.d_image), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (x.shape[0], 1, cfg.d_image)), x],
            axis=1,
        )
        pos = self.param(
            "pos", nn.initializers.normal(0.02), (x.shape[1], cfg.d_image),
            jnp.float32,
        )
        x = x + pos[None, :, :].astype(x.dtype)
        if cfg.image_pre_ln:
            # HF CLIP vision towers LayerNorm embeddings before the encoder.
            x = nn.LayerNorm(dtype=jnp.float32, epsilon=cfg.ln_eps,
                             name="pre_ln")(x)
        x = Encoder(ic, name="encoder")(x)
        out = nn.Dense(cfg.d_embed, use_bias=False, dtype=jnp.float32,
                       name="image_proj")(x[:, 0, :])
        return _normalize(out)


class CLIPDualEncoder(nn.Module):
    """Both towers under one param tree; ``method=`` selects a tower."""

    cfg: CLIPConfig

    def setup(self) -> None:
        self.text_tower = CLIPTextTower(self.cfg)
        self.image_tower = CLIPImageTower(self.cfg)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(jnp.log(1 / 0.07)), ()
        )

    def encode_text(self, ids: jnp.ndarray,
                    pad_mask: jnp.ndarray) -> jnp.ndarray:
        return self.text_tower(ids, pad_mask)

    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.image_tower(images)

    def __call__(self, ids: jnp.ndarray, pad_mask: jnp.ndarray,
                 images: jnp.ndarray) -> Any:
        t = self.encode_text(ids, pad_mask)
        v = self.encode_image(images)
        return t, v, self.logit_scale


__all__ = ["CLIPConfig", "CLIPDualEncoder", "CLIPTextTower", "CLIPImageTower"]
