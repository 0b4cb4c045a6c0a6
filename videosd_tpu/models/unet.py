"""Conditional diffusion UNet (SD1.5 / SD2.1 / SDXL families) in NHWC JAX.

A ground-up functional implementation of the UNet2DConditionModel
architecture the reference drives through diffusers
(reference call site: diffusert/lcm/lcm_controlnet.py:568-577 — inputs are
latents, timestep, ``timestep_cond`` (LCM guidance embedding),
``encoder_hidden_states`` (CLIP), and ControlNet additive residuals).

Param-tree names mirror diffusers module paths (down_blocks.0.resnets.1...)
so torch checkpoints convert by rename+transpose (videosd_tpu/io/weights.py).

TPU-first: NHWC activations, HWIO kernels, bf16 matmul/conv with fp32
accumulate, fp32 norms/softmax, attention dispatched to a Pallas flash
kernel for the long self-attention sequences (videosd_tpu/ops/pallas).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from videosd_tpu.models.layers import (
    Params,
    attention,
    conv2d,
    conv2d_init,
    geglu,
    geglu_init,
    group_norm,
    group_norm_init,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    linear_w8a8,
    silu,
    timestep_embedding,
    upsample_nearest2d,
)

__all__ = [
    "UNetConfig",
    "unet_init",
    "unet_apply",
    "UNET_PRESETS",
    "BankReader",
    "precat_attention_weights",
]


class BankReader:
    """Sequential reader over a flat attention bank.

    The WRITE pass appends one entry per self-attention call site in
    traversal order (``bank_out``); the READ pass must consume them in the
    same order regardless of which block it is in — this thin cursor keeps
    that pairing explicit (the functional analog of the reference's
    per-module ``self.bank`` attributes, lcm_reference_pipeline.py:551-560).

    ``fidelity`` (style_fidelity, [B,1,1] or scalar) blends the banked and
    plain self-attention OUTPUTS at each read site: 0 reduces exactly to
    the no-reference program, 1 is fully-banked attention (the reference's
    intent at lcm_reference_pipeline.py:545 for the no-CFG LCM regime).
    Scaling the banked *tokens* instead would leave zero-tokens occupying
    softmax mass at fidelity 0 (logit 0 != -inf) — not a no-op.
    """

    def __init__(self, entries, fidelity=1.0):
        self.entries = list(entries)
        self.fidelity = fidelity
        self._i = 0

    def next(self):
        e = self.entries[self._i]
        self._i += 1
        return e


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    # True for blocks with cross-attention transformers, outermost first.
    attn_down: tuple = (True, True, True, False)
    layers_per_block: int = 2
    transformer_depth: tuple = (1, 1, 1, 1)
    # SD1.5 stores "attention_head_dim=8" meaning 8 HEADS; SD2.x/SDXL store
    # the per-head dim.  `head_dim_is_num_heads` selects the interpretation.
    attention_head_dim: int = 8
    head_dim_is_num_heads: bool = True
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    time_cond_proj_dim: int | None = None  # LCM guidance embedding (w) input
    use_linear_projection: bool = False
    # SDXL micro-conditioning ("text_time"): pooled text emb + 6 time_ids.
    addition_embed_type: str | None = None
    addition_time_embed_dim: int | None = None
    projection_class_embeddings_input_dim: int | None = None
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def num_heads(self, channels: int) -> int:
        if self.head_dim_is_num_heads:
            return self.attention_head_dim
        return max(1, channels // self.attention_head_dim)

    @property
    def attn_up(self) -> tuple:
        return tuple(reversed(self.attn_down))


UNET_PRESETS: dict[str, UNetConfig] = {
    # SimianLuo/LCM_Dreamshaper_v7 & SD1.5-family ControlNet hosts
    # (loaded by reference at diffusert/videopipeline.py:57-65)
    "sd15": UNetConfig(time_cond_proj_dim=256),
    "sd15-base": UNetConfig(),
    # SD2.1 / SD-Turbo (stabilityai/sd-turbo): 1024-dim OpenCLIP context
    "sd21": UNetConfig(
        cross_attention_dim=1024,
        attention_head_dim=64,
        head_dim_is_num_heads=False,
        use_linear_projection=True,
    ),
    # SDXL-base topology (SDXL-Lightning): 3 stages, deep transformers
    "sdxl": UNetConfig(
        block_out_channels=(320, 640, 1280),
        attn_down=(False, True, True),
        transformer_depth=(0, 2, 10),
        cross_attention_dim=2048,
        attention_head_dim=64,
        head_dim_is_num_heads=False,
        use_linear_projection=True,
        addition_embed_type="text_time",
        addition_time_embed_dim=256,
        projection_class_embeddings_input_dim=2816,
    ),
    # tiny SDXL-topology config (text_time micro-conditioning) for tests
    "tiny-xl": UNetConfig(
        block_out_channels=(32, 64),
        attn_down=(False, True),
        layers_per_block=1,
        transformer_depth=(0, 2),
        attention_head_dim=16,
        head_dim_is_num_heads=False,
        cross_attention_dim=64,
        norm_num_groups=8,
        use_linear_projection=True,
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=32 + 6 * 8,
    ),
    # tiny config for unit tests / CPU-mesh dryruns
    "tiny": UNetConfig(
        block_out_channels=(32, 64),
        attn_down=(True, False),
        layers_per_block=1,
        transformer_depth=(1, 1),
        attention_head_dim=4,
        head_dim_is_num_heads=True,
        cross_attention_dim=32,
        norm_num_groups=8,
        time_cond_proj_dim=32,
    ),
}


# ------------------------------------------------------------------ resnet


def resnet_init(key, cfg: UNetConfig, in_ch: int, out_ch: int) -> Params:
    ks = jax.random.split(key, 4)
    p = {
        "norm1": group_norm_init(in_ch),
        "conv1": conv2d_init(ks[0], in_ch, out_ch),
        "time_emb_proj": linear_init(ks[1], cfg.time_embed_dim, out_ch),
        "norm2": group_norm_init(out_ch),
        "conv2": conv2d_init(ks[2], out_ch, out_ch),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = conv2d_init(ks[3], in_ch, out_ch, kernel=1)
    return p


def resnet_apply(p: Params, cfg: UNetConfig, x, temb):
    g = cfg.norm_num_groups
    h = silu(group_norm(p["norm1"], x, groups=g))
    h = conv2d(p["conv1"], h)
    t = linear(p["time_emb_proj"], silu(temb))
    h = h + t[:, None, None, :].astype(h.dtype)
    h = silu(group_norm(p["norm2"], h, groups=g))
    h = conv2d(p["conv2"], h)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


# ------------------------------------------------------------------ attention


def cross_attn_init(key, query_dim: int, context_dim: int, inner_dim: int) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "to_q": linear_init(ks[0], query_dim, inner_dim, bias=False),
        "to_k": linear_init(ks[1], context_dim, inner_dim, bias=False),
        "to_v": linear_init(ks[2], context_dim, inner_dim, bias=False),
        "to_out": linear_init(ks[3], inner_dim, query_dim),
    }


def cross_attn_apply(p: Params, x, context, *, num_heads: int, impl: str = "auto"):
    if context is x:
        # self-attention: fuse Q/K/V into ONE GEMM so the MXU sees one
        # [S,C]x[C,3C] matmul instead of three skinny ones.  A
        # pre-concatenated "wqkv" param (precat_attention_weights) skips
        # the per-call in-graph weight concat/slice copies.  Quantized
        # projections (ops/quant.py) fuse the same way: int8 kernels and
        # per-channel scales concatenate along the output axis, so one
        # w8a8 GEMM still serves all three.
        if "w8" in p["to_q"]:
            wqkv = {
                "w8": jnp.concatenate(
                    [p["to_q"]["w8"], p["to_k"]["w8"], p["to_v"]["w8"]], axis=1
                ),
                "sw": jnp.concatenate(
                    [p["to_q"]["sw"], p["to_k"]["sw"], p["to_v"]["sw"]]
                ),
            }
            qkv = linear_w8a8(wqkv, x)
        else:
            wqkv = p.get("wqkv")
            if wqkv is None:
                wqkv = jnp.concatenate(
                    [p["to_q"]["kernel"], p["to_k"]["kernel"], p["to_v"]["kernel"]],
                    axis=1,
                )
            qkv = jnp.dot(
                x, wqkv.astype(x.dtype), preferred_element_type=jnp.float32
            ).astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = linear(p["to_q"], x)
        if "w8" in p["to_k"]:
            # banked self-attention READ pass over [h ; self_kv] context
            wkv = {
                "w8": jnp.concatenate([p["to_k"]["w8"], p["to_v"]["w8"]], axis=1),
                "sw": jnp.concatenate([p["to_k"]["sw"], p["to_v"]["sw"]]),
            }
            kv = linear_w8a8(wkv, context)
        else:
            wkv = p.get("wkv")
            if wkv is None:
                wkv = jnp.concatenate(
                    [p["to_k"]["kernel"], p["to_v"]["kernel"]], axis=1
                )
            kv = jnp.dot(
                context, wkv.astype(context.dtype), preferred_element_type=jnp.float32
            ).astype(context.dtype)
        k, v = jnp.split(kv, 2, axis=-1)
    out = attention(q, k, v, num_heads=num_heads, impl=impl)
    return linear(p["to_out"], out)


def precat_attention_weights(params: Params) -> Params:
    """Add pre-concatenated "wqkv"/"wkv" kernels beside every attn1/attn2
    param dict (returns a new tree sharing all original leaves).

    NOT applied by default: the fused variant measured NEUTRAL on the
    flagship (PERF.md round-2 closed investigations — XLA already hoists
    the in-graph concats), the derived entries fully duplicate the
    projections they fuse (HBM cost), and differentiating through a
    fused tree trains only wqkv while plan export writes the stale
    originals.  Kept as an opt-in transform for setups where the
    in-graph concat does show up (originals are retained, so export and
    torch parity stay untouched).
    """

    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()}
            for name in ("attn1", "attn2"):
                a = out.get(name)
                if (
                    isinstance(a, dict)
                    and "to_q" in a
                    and "wqkv" not in a
                    and "kernel" in a["to_q"]  # skip w8a8-quantized attention
                ):
                    a = dict(a)
                    if name == "attn1":
                        a["wqkv"] = jnp.concatenate(
                            [
                                a["to_q"]["kernel"],
                                a["to_k"]["kernel"],
                                a["to_v"]["kernel"],
                            ],
                            axis=1,
                        )
                    else:
                        a["wkv"] = jnp.concatenate(
                            [a["to_k"]["kernel"], a["to_v"]["kernel"]], axis=1
                        )
                    out[name] = a
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def transformer_block_init(key, cfg: UNetConfig, dim: int) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "norm1": layer_norm_init(dim),
        "attn1": cross_attn_init(ks[0], dim, dim, dim),
        "norm2": layer_norm_init(dim),
        "attn2": cross_attn_init(ks[1], dim, cfg.cross_attention_dim, dim),
        "norm3": layer_norm_init(dim),
        "ff": geglu_init(ks[2], dim, dim * 4),
    }


def transformer_block_apply(
    p: Params, cfg: UNetConfig, x, context, *, num_heads: int, self_kv=None,
    self_kv_weight=1.0,
):
    """One BasicTransformerBlock: self-attn -> cross-attn -> GEGLU FF.

    ``self_kv``: optional extra key/value sequence concatenated to the
    self-attention context — the functional form of the reference-attention
    mode's banked hidden states (lcm_reference_pipeline.py:498-585).
    ``self_kv_weight`` (style_fidelity, [B,1,1] or scalar): output blend
    between the banked and plain self-attention branches.  0 reduces
    EXACTLY to the no-reference block (the banked branch's contribution is
    multiplied out), 1 is fully-banked attention — the reference's intent
    ("0 = ignore reference") in the no-CFG LCM regime
    (lcm_reference_pipeline.py:545).
    """
    with jax.named_scope("self_attn"):
        h = layer_norm(p["norm1"], x)
        if self_kv is None:
            attn = cross_attn_apply(p["attn1"], h, h, num_heads=num_heads)
        else:
            banked = cross_attn_apply(
                p["attn1"], h, jnp.concatenate([h, self_kv], axis=1),
                num_heads=num_heads,
            )
            plain = cross_attn_apply(p["attn1"], h, h, num_heads=num_heads)
            sf = jnp.asarray(self_kv_weight, jnp.float32)
            attn = (
                sf * banked.astype(jnp.float32)
                + (1.0 - sf) * plain.astype(jnp.float32)
            ).astype(x.dtype)
        x = x + attn
    with jax.named_scope("cross_attn"):
        h = layer_norm(p["norm2"], x)
        x = x + cross_attn_apply(p["attn2"], h, context, num_heads=num_heads)
    with jax.named_scope("ff"):
        h = layer_norm(p["norm3"], x)
        x = x + geglu(p["ff"], h)
    return x


def transformer2d_init(key, cfg: UNetConfig, channels: int, depth: int) -> Params:
    ks = jax.random.split(key, depth + 2)
    if cfg.use_linear_projection:
        proj_in = linear_init(ks[0], channels, channels)
        proj_out = linear_init(ks[1], channels, channels)
    else:
        proj_in = conv2d_init(ks[0], channels, channels, kernel=1)
        proj_out = conv2d_init(ks[1], channels, channels, kernel=1)
    return {
        "norm": group_norm_init(channels),
        "proj_in": proj_in,
        "transformer_blocks": [
            transformer_block_init(ks[2 + i], cfg, channels) for i in range(depth)
        ],
        "proj_out": proj_out,
    }


def _proj_as_linear(p: Params) -> Params:
    """View a 1x1-conv param dict ([1,1,C,C] kernel) as a linear param dict
    ([C,C] kernel); linear params pass through unchanged."""
    k = p["kernel"]
    if k.ndim == 4:
        out = {"kernel": k.reshape(k.shape[2], k.shape[3])}
        if "bias" in p:
            out["bias"] = p["bias"]
        return out
    return p


def transformer2d_apply(
    p: Params, cfg: UNetConfig, x, context, *, bank=None, bank_out=None
):
    """Spatial transformer: [B,H,W,C] <-> [B,HW,C] token round trip.

    ``bank``: list (per inner block) of banked self-attn K/V tokens to read
    (reference-attention READ pass); ``bank_out``: list to append this call's
    pre-attention hidden states to (WRITE pass).
    """
    b, hh, ww, c = x.shape
    heads = cfg.num_heads(c)
    residual = x
    h = group_norm(p["norm"], x, groups=cfg.norm_num_groups, eps=1e-6)
    # 1x1-conv projections (SD1.5 checkpoints) are applied as linears on
    # the token view — mathematically identical, and it keeps the whole
    # transformer on one dot-friendly layout: the conv form made XLA
    # insert 5 MB fp32 layout copies ({3,2,1,0}->{3,0,2,1} T(1,128))
    # between every dot output and the conv projection (profiled at
    # ~11 ms/frame of convert_reduce fusions on the flagship).
    h = h.reshape(b, hh * ww, c)
    h = linear(_proj_as_linear(p["proj_in"]), h)
    for blk in p["transformer_blocks"]:
        if bank_out is not None:
            bank_out.append(layer_norm(blk["norm1"], h))
        self_kv = bank.next() if bank is not None else None
        h = transformer_block_apply(
            blk, cfg, h, context, num_heads=heads, self_kv=self_kv,
            self_kv_weight=bank.fidelity if bank is not None else 1.0,
        )
    h = linear(_proj_as_linear(p["proj_out"]), h)
    h = h.reshape(b, hh, ww, c)
    return h + residual


# ------------------------------------------------------------------ down/mid/up


def down_block_init(
    key, cfg: UNetConfig, idx: int, in_ch: int, out_ch: int, *, final: bool
) -> Params:
    n = cfg.layers_per_block
    ks = jax.random.split(key, 2 * n + 1)
    p: Params = {"resnets": [], "attentions": []}
    for i in range(n):
        ci = in_ch if i == 0 else out_ch
        p["resnets"].append(resnet_init(ks[2 * i], cfg, ci, out_ch))
        if cfg.attn_down[idx]:
            p["attentions"].append(
                transformer2d_init(ks[2 * i + 1], cfg, out_ch, cfg.transformer_depth[idx])
            )
    if not final:
        p["downsamplers"] = [{"conv": conv2d_init(ks[-1], out_ch, out_ch)}]
    return p


def down_block_apply(
    p: Params,
    cfg: UNetConfig,
    idx: int,
    x,
    temb,
    context,
    *,
    bank=None,
    bank_out=None,
    adain=None,
):
    res_samples = []
    for i, rn in enumerate(p["resnets"]):
        with jax.named_scope(f"res{i}"):
            x = resnet_apply(rn, cfg, x, temb)
        # .get: converted checkpoints omit the key for attention-less blocks
        if p.get("attentions"):
            with jax.named_scope(f"tf{i}"):
                x = transformer2d_apply(
                    p["attentions"][i], cfg, x, context, bank=bank, bank_out=bank_out
                )
        if adain is not None:
            x = adain(x)
        res_samples.append(x)
    if "downsamplers" in p:
        x = conv2d(p["downsamplers"][0]["conv"], x, stride=2, padding=[(1, 1), (1, 1)])
        res_samples.append(x)
    return x, res_samples


def mid_block_init(key, cfg: UNetConfig) -> Params:
    ch = cfg.block_out_channels[-1]
    ks = jax.random.split(key, 3)
    depth = cfg.transformer_depth[-1] if cfg.transformer_depth[-1] > 0 else 1
    return {
        "resnets": [resnet_init(ks[0], cfg, ch, ch), resnet_init(ks[1], cfg, ch, ch)],
        "attentions": [transformer2d_init(ks[2], cfg, ch, depth)],
    }


def mid_block_apply(
    p: Params, cfg: UNetConfig, x, temb, context, *, bank=None, bank_out=None, adain=None
):
    x = resnet_apply(p["resnets"][0], cfg, x, temb)
    x = transformer2d_apply(p["attentions"][0], cfg, x, context, bank=bank, bank_out=bank_out)
    x = resnet_apply(p["resnets"][1], cfg, x, temb)
    if adain is not None:
        x = adain(x)
    return x


def up_block_init(
    key, cfg: UNetConfig, idx: int, in_ch: int, prev_out: int, out_ch: int, *, final: bool
) -> Params:
    """idx indexes up blocks outermost-last (diffusers up_blocks order).

    Resnet i input = cat(current, skip): current is prev_out for i=0 else
    out_ch; skip channel walks back down the encoder's outputs.
    """
    n = cfg.layers_per_block + 1
    ks = jax.random.split(key, 2 * n + 1)
    p: Params = {"resnets": [], "attentions": []}
    for i in range(n):
        res_skip = in_ch if i == n - 1 else out_ch
        res_in = prev_out if i == 0 else out_ch
        p["resnets"].append(resnet_init(ks[2 * i], cfg, res_in + res_skip, out_ch))
        if cfg.attn_up[idx]:
            depth = tuple(reversed(cfg.transformer_depth))[idx]
            p["attentions"].append(transformer2d_init(ks[2 * i + 1], cfg, out_ch, depth))
    if not final:
        p["upsamplers"] = [{"conv": conv2d_init(ks[-1], out_ch, out_ch)}]
    return p


def up_block_apply(
    p: Params,
    cfg: UNetConfig,
    idx: int,
    x,
    res_samples,
    temb,
    context,
    *,
    bank=None,
    bank_out=None,
    adain=None,
):
    for i, rn in enumerate(p["resnets"]):
        res = res_samples.pop()
        x = jnp.concatenate([x, res], axis=-1)
        with jax.named_scope(f"res{i}"):
            x = resnet_apply(rn, cfg, x, temb)
        if p.get("attentions"):
            with jax.named_scope(f"tf{i}"):
                x = transformer2d_apply(
                    p["attentions"][i], cfg, x, context, bank=bank, bank_out=bank_out
                )
        if adain is not None:
            x = adain(x)
    if "upsamplers" in p:
        # NOTE: a phase-decomposed fused upsample+conv (layers.upsample_conv2d,
        # 2.25x fewer MACs) measured NEUTRAL here — XLA already consumes the
        # nearest-2x broadcast inside its halo-tiled conv (PERF.md)
        x = upsample_nearest2d(x)
        x = conv2d(p["upsamplers"][0]["conv"], x)
    return x


# ------------------------------------------------------------------ unet


def unet_init(key, cfg: UNetConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 16)
    ch0 = cfg.block_out_channels[0]
    ted = cfg.time_embed_dim
    p: Params = {
        "conv_in": conv2d_init(ks[0], cfg.in_channels, ch0),
        "time_embedding": {
            "linear_1": linear_init(ks[1], ch0, ted),
            "linear_2": linear_init(ks[2], ted, ted),
        },
    }
    if cfg.time_cond_proj_dim is not None:
        p["time_embedding"]["cond_proj"] = linear_init(
            ks[3], cfg.time_cond_proj_dim, ch0, bias=False
        )
    if cfg.addition_embed_type == "text_time":
        p["add_embedding"] = {
            "linear_1": linear_init(
                ks[4], cfg.projection_class_embeddings_input_dim, ted
            ),
            "linear_2": linear_init(ks[5], ted, ted),
        }

    n_blocks = len(cfg.block_out_channels)
    down_keys = jax.random.split(ks[6], n_blocks)
    p["down_blocks"] = []
    ch = ch0
    for i, out_ch in enumerate(cfg.block_out_channels):
        p["down_blocks"].append(
            down_block_init(down_keys[i], cfg, i, ch, out_ch, final=(i == n_blocks - 1))
        )
        ch = out_ch

    p["mid_block"] = mid_block_init(ks[7], cfg)

    up_keys = jax.random.split(ks[8], n_blocks)
    p["up_blocks"] = []
    rev = list(reversed(cfg.block_out_channels))
    prev_out = rev[0]
    for i, out_ch in enumerate(rev):
        in_ch = rev[min(i + 1, n_blocks - 1)]
        p["up_blocks"].append(
            up_block_init(
                up_keys[i], cfg, i, in_ch, prev_out, out_ch, final=(i == n_blocks - 1)
            )
        )
        prev_out = out_ch

    p["conv_norm_out"] = group_norm_init(ch0)
    p["conv_out"] = conv2d_init(ks[9], ch0, cfg.out_channels)
    if dtype != jnp.float32:
        p = jax.tree.map(lambda a: a.astype(dtype), p)
    return p


def compute_time_embedding(p: Params, cfg: UNetConfig, timesteps, timestep_cond=None):
    """Sinusoidal t-embedding -> MLP; LCM guidance cond added pre-MLP."""
    temb = timestep_embedding(
        timesteps,
        cfg.block_out_channels[0],
        flip_sin_to_cos=cfg.flip_sin_to_cos,
        downscale_freq_shift=cfg.freq_shift,
    )
    te = p["time_embedding"]
    dtype = te["linear_1"]["kernel"].dtype
    temb = temb.astype(dtype)
    if timestep_cond is not None and "cond_proj" in te:
        temb = temb + linear(te["cond_proj"], timestep_cond.astype(dtype))
    temb = linear(te["linear_2"], silu(linear(te["linear_1"], temb)))
    return temb


def compute_add_embedding(p: Params, cfg: UNetConfig, text_embeds, time_ids):
    """SDXL "text_time" micro-conditioning embedding.

    text_embeds: [B, pooled_dim]; time_ids: [B, 6].
    """
    b = time_ids.shape[0]
    t_emb = timestep_embedding(
        time_ids.reshape(-1),
        cfg.addition_time_embed_dim,
        flip_sin_to_cos=cfg.flip_sin_to_cos,
        downscale_freq_shift=cfg.freq_shift,
    ).reshape(b, -1)
    ae = p["add_embedding"]
    dtype = ae["linear_1"]["kernel"].dtype
    x = jnp.concatenate([text_embeds.astype(jnp.float32), t_emb], axis=-1).astype(dtype)
    return linear(ae["linear_2"], silu(linear(ae["linear_1"], x)))


def unet_apply(
    params: Params,
    cfg: UNetConfig,
    sample,
    timesteps,
    encoder_hidden_states,
    *,
    timestep_cond=None,
    added_cond_kwargs=None,
    down_block_additional_residuals=None,
    mid_block_additional_residual=None,
    bank=None,
    bank_out=None,
    adain=None,
    deep_feature=None,
    return_deep_feature: bool = False,
):
    """UNet forward.

    sample: [B,H,W,C] latents (NHWC).  timesteps: [B] int32.
    encoder_hidden_states: [B,S,D] text context.
    down/mid additional residuals: ControlNet outputs, added to the skip
    stack exactly where diffusers adds them (lcm_controlnet.py:568-577).
    bank/bank_out: reference-attention read/write state (see
    videosd_tpu/pipelines/reference_attn.py).

    deep_feature / return_deep_feature: DeepCache-style split (Ma et al.,
    arXiv:2312.00858 — a public technique; absent from the reference).
    ``return_deep_feature=True`` additionally returns the feature entering
    the LAST (outermost) up block.  Passing that feature back as
    ``deep_feature`` on a later call runs ONLY the shallow path —
    conv_in -> down_blocks[0] (its resnets/attentions; the downsampler
    feeds deeper blocks and is skipped) -> cached feature -> up_blocks[-1]
    -> conv_out — reusing the cached deep trunk.  With the SAME inputs the
    shallow pass reproduces the full pass bit-exactly (pinned by test);
    across denoise steps it is the DeepCache approximation.  Only the
    first ``layers_per_block + 1`` ControlNet residuals are consumed on
    the shallow path (the rest conditioned the cached trunk).
    """
    temb = compute_time_embedding(params, cfg, timesteps, timestep_cond)
    if cfg.addition_embed_type == "text_time":
        aek = added_cond_kwargs or {}
        temb = temb + compute_add_embedding(
            params, cfg, aek["text_embeds"], aek["time_ids"]
        )

    context = encoder_hidden_states.astype(sample.dtype)
    x = conv2d(params["conv_in"], sample)

    if deep_feature is not None:
        # shallow-only pass over the cached deep trunk
        if bank is not None or bank_out is not None or adain is not None:
            raise ValueError("deep_feature is incompatible with bank/adain modes")
        if mid_block_additional_residual is not None:
            # the mid block is part of the cached trunk — a fresh mid
            # residual has nowhere to apply; silently dropping it would be
            # wrong conditioning, so refuse (mirrors the bank/adain guard)
            raise ValueError(
                "deep_feature is incompatible with mid_block_additional_residual"
            )
        if return_deep_feature:
            raise ValueError(
                "return_deep_feature requires a full pass (deep_feature=None)"
            )
        if len(params["down_blocks"]) < 2:
            raise ValueError("deep_feature split needs >= 2 resolution blocks")
        blk0 = params["down_blocks"][0]
        down_res = [x]
        for i, rn in enumerate(blk0["resnets"]):
            with jax.named_scope(f"down0/res{i}"):
                x = resnet_apply(rn, cfg, x, temb)
            if blk0.get("attentions"):
                with jax.named_scope(f"down0/tf{i}"):
                    x = transformer2d_apply(blk0["attentions"][i], cfg, x, context)
            down_res.append(x)
        if down_block_additional_residuals is not None:
            down_res = [
                r + a.astype(r.dtype)
                for r, a in zip(down_res, down_block_additional_residuals)
            ]
        with jax.named_scope(f"up{len(params['up_blocks']) - 1}"):
            x = up_block_apply(
                params["up_blocks"][-1],
                cfg,
                len(params["up_blocks"]) - 1,
                deep_feature,
                down_res,
                temb,
                context,
            )
        x = silu(group_norm(params["conv_norm_out"], x, groups=cfg.norm_num_groups))
        x = conv2d(params["conv_out"], x)
        return x

    down_res: list = [x]
    for i, blk in enumerate(params["down_blocks"]):
        with jax.named_scope(f"down{i}"):
            x, res = down_block_apply(
                blk, cfg, i, x, temb, context, bank=bank, bank_out=bank_out, adain=adain
            )
        down_res.extend(res)

    with jax.named_scope("mid"):
        x = mid_block_apply(
            params["mid_block"], cfg, x, temb, context, bank=bank, bank_out=bank_out, adain=adain
        )

    if down_block_additional_residuals is not None:
        down_res = [
            r + a.astype(r.dtype)
            for r, a in zip(down_res, down_block_additional_residuals)
        ]
    if mid_block_additional_residual is not None:
        x = x + mid_block_additional_residual.astype(x.dtype)

    deep = None
    for i, blk in enumerate(params["up_blocks"]):
        if i == len(params["up_blocks"]) - 1:
            deep = x
        n = cfg.layers_per_block + 1
        res_samples = down_res[-n:]
        down_res = down_res[:-n]
        with jax.named_scope(f"up{i}"):
            x = up_block_apply(
                blk, cfg, i, x, res_samples, temb, context, bank=bank, bank_out=bank_out, adain=adain
            )

    x = silu(group_norm(params["conv_norm_out"], x, groups=cfg.norm_num_groups))
    x = conv2d(params["conv_out"], x)
    if return_deep_feature:
        return x, deep
    return x
