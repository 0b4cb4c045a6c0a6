"""CLIP text encoder (SD text tower) in JAX.

The reference encodes prompts through transformers' CLIPTextModel inside
``_encode_prompt`` (diffusert/lcm/lcm_controlnet.py:115-198) and feeds the
last hidden state to the UNet as cross-attention context.  Implemented
configurable for:

* SD1.5: OpenAI CLIP ViT-L/14 text tower (768 wide, 12 layers, quick_gelu)
* SD2.x: OpenCLIP ViT-H text tower (1024 wide, 23-of-24 layers, gelu,
  ``penultimate`` hidden state)
* SDXL: both towers (the second with a projection head + pooled output)

Causal mask, learned positional embeddings, final LN; pooled output taken
at the EOT token (argmax of token ids) for SDXL micro-conditioning.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from videosd_tpu.models.layers import (
    Params,
    attention,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)

__all__ = ["CLIPTextConfig", "clip_text_init", "clip_text_apply", "CLIP_PRESETS"]


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"  # quick_gelu (CLIP) | gelu (OpenCLIP)
    # Which hidden state to return: -1 = final (post all layers); -2 =
    # penultimate (SD2.x convention).  Final LN is applied regardless.
    output_hidden_state: int = -1
    projection_dim: int | None = None  # text_projection for SDXL tower 2


CLIP_PRESETS = {
    "sd15": CLIPTextConfig(),
    "sd21": CLIPTextConfig(
        hidden_size=1024,
        num_layers=23,
        num_heads=16,
        intermediate_size=4096,
        hidden_act="gelu",
    ),
    "sdxl-1": CLIPTextConfig(output_hidden_state=-2),
    "sdxl-2": CLIPTextConfig(
        hidden_size=1280,
        num_layers=32,
        num_heads=20,
        intermediate_size=5120,
        hidden_act="gelu",
        output_hidden_state=-2,
        projection_dim=1280,
    ),
    "tiny": CLIPTextConfig(
        vocab_size=1000,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        intermediate_size=64,
    ),
}


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    # transformers' "gelu" is the exact erf form (NewGELU would be
    # "gelu_new"); in bf16 the tanh form is sub-ULP-identical and faster
    # (see layers.geglu)
    return lambda x: jax.nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


def _layer_init(key, cfg: CLIPTextConfig) -> Params:
    ks = jax.random.split(key, 6)
    d = cfg.hidden_size
    return {
        "layer_norm1": layer_norm_init(d),
        "self_attn": {
            "q_proj": linear_init(ks[0], d, d),
            "k_proj": linear_init(ks[1], d, d),
            "v_proj": linear_init(ks[2], d, d),
            "out_proj": linear_init(ks[3], d, d),
        },
        "layer_norm2": layer_norm_init(d),
        "mlp": {
            "fc1": linear_init(ks[4], d, cfg.intermediate_size),
            "fc2": linear_init(ks[5], cfg.intermediate_size, d),
        },
    }


def clip_text_init(key, cfg: CLIPTextConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, cfg.num_layers + 4)
    d = cfg.hidden_size
    p: Params = {
        "token_embedding": jax.random.normal(ks[0], (cfg.vocab_size, d)) * 0.02,
        "position_embedding": jax.random.normal(
            ks[1], (cfg.max_position_embeddings, d)
        )
        * 0.01,
        "layers": [_layer_init(ks[2 + i], cfg) for i in range(cfg.num_layers)],
        "final_layer_norm": layer_norm_init(d),
    }
    if cfg.projection_dim is not None:
        p["text_projection"] = linear_init(ks[-1], d, cfg.projection_dim, bias=False)
    if dtype != jnp.float32:
        p = jax.tree.map(lambda a: a.astype(dtype), p)
    return p


def clip_text_apply(params: Params, cfg: CLIPTextConfig, input_ids):
    """input_ids: [B, 77] int32 -> (last_hidden_state [B,77,D], pooled [B,D|P]).

    ``last_hidden_state`` is the UNet context (lcm_controlnet.py:171 takes
    ``text_encoder(...)[0]``); ``pooled`` is the EOT-token embedding (passed
    through text_projection when configured) for SDXL's added conditioning.
    """
    # mode="clip": an out-of-vocab id must never produce NaN (jnp.take's
    # default "fill" mode would) — clamp like torch's Embedding would error
    x = jnp.take(params["token_embedding"], input_ids, axis=0, mode="clip")
    seq = input_ids.shape[1]
    x = x + params["position_embedding"][:seq][None]

    causal = jnp.triu(jnp.full((seq, seq), -jnp.inf, jnp.float32), k=1)[None, None]

    act = _act(cfg.hidden_act)
    hidden_states = [x]
    for layer in params["layers"]:
        h = layer_norm(layer["layer_norm1"], x)
        sa = layer["self_attn"]
        q = linear(sa["q_proj"], h)
        k = linear(sa["k_proj"], h)
        v = linear(sa["v_proj"], h)
        h = attention(q, k, v, num_heads=cfg.num_heads, mask=causal)
        x = x + linear(sa["out_proj"], h)
        h = layer_norm(layer["layer_norm2"], x)
        h = linear(layer["mlp"]["fc1"], h)
        h = act(h.astype(jnp.float32)).astype(h.dtype)
        x = x + linear(layer["mlp"]["fc2"], h)
        hidden_states.append(x)

    final = layer_norm(params["final_layer_norm"], x)

    # context output: final (post-LN) state, or a raw intermediate state for
    # the "penultimate" convention (SDXL takes hidden_states[-2] WITHOUT the
    # final LN; the pooled output still comes from the full tower).
    if cfg.output_hidden_state == -1:
        context = final
    else:
        context = hidden_states[cfg.output_hidden_state]

    # pooled = final hidden state at the EOT token (argmax of ids in CLIP)
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = jnp.take_along_axis(final, eot[:, None, None], axis=1)[:, 0]
    if "text_projection" in params:
        pooled = linear(params["text_projection"], pooled)
    return context, pooled
