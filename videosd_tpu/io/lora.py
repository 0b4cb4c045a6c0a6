"""LoRA adapter loading + load-time fusion (LCM-LoRA et al.).

BASELINE config 1 names "SD-1.5 + LCM-LoRA" (the LCM-LoRA paper is in
PAPERS.md): the low-rank adapter that turns any base SD checkpoint into a
few-step LCM sampler.  The reference sidesteps adapters by shipping the
fully-merged ``SimianLuo/LCM_Dreamshaper_v7`` checkpoint
(diffusert/videopipeline.py:57-65); this module makes the adapter route
first-class: read a LoRA ``.safetensors`` file in any of the three wire
formats seen in the wild and FUSE it into the JAX param tree at load time:

    W  <-  W + scale * (alpha / r) * up @ down

Supported key formats (auto-detected per tensor):

* **diffusers/PEFT** (what ``diffusers>=0.24`` saves; used by
  ``latent-consistency/lcm-lora-sdv1-5``):
  ``unet.<module>.lora_A.weight`` / ``.lora_B.weight`` and
  ``text_encoder.<module>.lora_A.weight``.
* **legacy diffusers** (pre-PEFT, incl. the attn-processor spelling):
  ``unet.<module>.lora.down.weight`` / ``.lora.up.weight`` and
  ``...processor.to_q_lora.down.weight``.
* **kohya / A1111**: ``lora_unet_<module_with_underscores>.lora_down.weight``
  / ``.lora_up.weight`` / ``.alpha`` (underscore-joined module paths are
  resolved against the conversion plan's module names, so names that
  themselves contain underscores — ``transformer_blocks``, ``to_out_0`` —
  disambiguate exactly).

Fusing at load (vs. keeping runtime adapter matmuls) is the TPU-right
call for serving: zero per-step cost, no pytree-structure change (jitted
programs are keyed on tree structure and stay valid), and a live scale
change is one checkpoint hot-swap away (``Engine.swap_params`` re-applies
the configured adapters to any incoming base checkpoint).  Quantization
(ops/quant.py) composes by ordering: LoRA fuses first, int8 second.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Iterable

import jax.numpy as jnp
import numpy as np

from videosd_tpu.io.safetensors import read_safetensors
from videosd_tpu.io.weights import Plan, _to_jax

__all__ = [
    "LoRAEntry",
    "read_lora",
    "fuse_lora",
    "fuse_bundle_loras",
    "normalize_lora_setting",
]

log = logging.getLogger("videosd_tpu.lora")


@dataclasses.dataclass
class LoRAEntry:
    """One adapted module: ``delta_W = (alpha/r) * up @ down`` (torch layout)."""

    down: np.ndarray | None = None  # [r, I] or [r, I, kh, kw]
    up: np.ndarray | None = None  # [O, r] or [O, r, 1, 1]
    alpha: float | None = None  # None -> alpha == r (factor 1)

    @property
    def rank(self) -> int:
        return int(self.down.shape[0])

    def scaling(self) -> float:
        return 1.0 if self.alpha is None else float(self.alpha) / self.rank

    def delta(self) -> np.ndarray:
        """Dense torch-layout delta: [O, I] (linear) or [O, I, kh, kw] (conv)."""
        up = np.asarray(self.up, np.float32)
        down = np.asarray(self.down, np.float32)
        if down.ndim == 2:
            return up @ down
        # conv LoRA: down holds the spatial taps [r, I, kh, kw]; up is a
        # 1x1 "pointwise" [O, r, 1, 1]
        return np.einsum("or,rikl->oikl", up[:, :, 0, 0], down)


# ------------------------------------------------------------------ parsing

# tower prefixes, dotted (diffusers/PEFT/legacy) and kohya forms
_DOTTED_PREFIXES = {
    "unet.": "unet",
    "text_encoder.": "text_encoder",
    "text_encoder_2.": "text_encoder_2",
}
_KOHYA_PREFIXES = {
    "lora_unet_": "unet",
    "lora_te_": "text_encoder",
    "lora_te1_": "text_encoder",
    "lora_te2_": "text_encoder_2",
}


def _classify(key: str):
    """Split a tensor key -> (tower, module, part) or None if not LoRA.

    ``part`` is "down" | "up" | "alpha".  ``module`` keeps the source
    spelling (dotted or underscore-joined); matching against the plan
    happens in :func:`fuse_lora`.
    """
    for pfx, tower in _KOHYA_PREFIXES.items():
        if key.startswith(pfx):
            rest = key[len(pfx):]
            for suffix, part in (
                (".lora_down.weight", "down"),
                (".lora_up.weight", "up"),
                (".alpha", "alpha"),
            ):
                if rest.endswith(suffix):
                    return tower, rest[: -len(suffix)], part
            return None
    for pfx, tower in _DOTTED_PREFIXES.items():
        if key.startswith(pfx):
            rest = key[len(pfx):]
            for suffix, part in (
                # PEFT (diffusers >= 0.24); also seen without ".weight"
                (".lora_A.weight", "down"),
                (".lora_B.weight", "up"),
                (".lora_A", "down"),
                (".lora_B", "up"),
                # legacy diffusers
                (".lora.down.weight", "down"),
                (".lora.up.weight", "up"),
                (".alpha", "alpha"),
            ):
                if rest.endswith(suffix):
                    return tower, rest[: -len(suffix)], part
            # legacy attn-processor spelling (no ".lora." infix):
            #   <block>.processor.to_q_lora.down.weight -> <block>.to_q
            for suffix, part in ((".down.weight", "down"), (".up.weight", "up")):
                if rest.endswith(suffix):
                    module = rest[: -len(suffix)]
                    if module.endswith("_lora") and ".processor." in module:
                        head, tail = module.rsplit(".processor.", 1)
                        module = f"{head}.{tail[: -len('_lora')]}"
                        # processors named the out projection to_out_lora
                        if module.endswith(".to_out"):
                            module += ".0"
                        return tower, module, part
            return None
    return None


def read_lora(path: str) -> dict[str, dict[str, LoRAEntry]]:
    """Read a LoRA safetensors file -> {tower: {module: LoRAEntry}}.

    Raises on unrecognized tensor keys (loud failure beats silently
    dropping half an adapter) and on modules missing a down/up half.
    """
    tensors = read_safetensors(path)
    towers: dict[str, dict[str, LoRAEntry]] = {}
    unknown: list[str] = []
    for key, arr in tensors.items():
        parsed = _classify(key)
        if parsed is None:
            unknown.append(key)
            continue
        tower, module, part = parsed
        entry = towers.setdefault(tower, {}).setdefault(module, LoRAEntry())
        if part == "alpha":
            entry.alpha = float(np.asarray(arr).reshape(()))
        else:
            setattr(entry, part, np.asarray(arr))
    if unknown:
        raise KeyError(
            f"{path}: {len(unknown)} tensor keys in no known LoRA format, "
            f"e.g. {unknown[:3]}"
        )
    for tower, mods in towers.items():
        half = [m for m, e in mods.items() if e.down is None or e.up is None]
        if half:
            raise KeyError(
                f"{path}: modules missing a lora down/up half in {tower}: {half[:3]}"
            )
    return towers


# ------------------------------------------------------------------- fusion


def _get_path(tree, path: tuple):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set_path_cow(tree: dict, path: tuple, value):
    """Set tree[path] copying only the dict/list spine along the way."""
    new = dict(tree)
    node = new
    for p in path[:-1]:
        child = node[p]
        child = list(child) if isinstance(child, list) else dict(child)
        node[p] = child
        node = child
    node[path[-1]] = value
    return new


def fuse_lora(
    params: dict,
    plan: Plan,
    modules: dict[str, LoRAEntry],
    *,
    scale: float = 1.0,
) -> tuple[dict, list[str]]:
    """Fuse one tower's LoRA modules into a converted JAX param tree.

    ``plan`` is the tower's conversion plan (io/weights.py) — its torch
    keys define both the module-name vocabulary (dotted AND kohya
    underscore forms resolve against it) and the layout transpose to
    apply to each delta.  Returns ``(new_tree, unmatched_modules)``;
    untouched leaves are shared with the input tree.
    """
    # module-name lookup: dotted and underscore spellings of every plan key
    by_name: dict[str, tuple[tuple, str]] = {}
    for jpath, tkey, kind in plan:
        if kind not in ("linear", "conv") or not tkey.endswith(".weight"):
            continue
        module = tkey[: -len(".weight")]
        by_name[module] = (jpath, kind)
        by_name[module.replace(".", "_")] = (jpath, kind)

    tree = params
    unmatched: list[str] = []
    for module, entry in modules.items():
        hit = by_name.get(module)
        if hit is None:
            unmatched.append(module)
            continue
        jpath, kind = hit
        leaf = _get_path(tree, jpath)
        delta = _to_jax(entry.delta() * (scale * entry.scaling()), kind)
        if tuple(delta.shape) != tuple(leaf.shape):
            raise ValueError(
                f"lora delta shape {delta.shape} != param {tuple(leaf.shape)} "
                f"for module {module!r}"
            )
        fused = (leaf.astype(jnp.float32) + jnp.asarray(delta)).astype(leaf.dtype)
        tree = _set_path_cow(tree, jpath, fused)
    return tree, unmatched


def normalize_lora_setting(setting: Any, default_scale: float = 1.0):
    """Coerce the config ``lora`` value to ``[(path, scale), ...]``.

    Accepts a path string, a list of paths, or a list of
    ``{path|file: ..., scale: ...}`` dicts (mixed forms allowed).
    """
    if not setting:
        return []
    if isinstance(setting, (str, os.PathLike)):
        setting = [setting]
    out: list[tuple[str, float]] = []
    for item in setting:
        if isinstance(item, (str, os.PathLike)):
            out.append((os.fspath(item), float(default_scale)))
        elif isinstance(item, dict):
            path = item.get("path") or item.get("file")
            if not path:
                raise ValueError(f"lora entry missing 'path': {item!r}")
            out.append((os.fspath(path), float(item.get("scale", default_scale))))
        else:
            raise ValueError(f"unrecognized lora entry: {item!r}")
    return out


# tower name in the LoRA file -> (params key, plan builder name)
_TOWER_PARAMS = {
    "unet": "unet",
    "text_encoder": "clip",
    "text_encoder_2": "clip2",
}


def fuse_bundle_loras(
    bundle, loras: Iterable[tuple[str, float]], *, strict: bool = False
) -> dict[str, int]:
    """Fuse ``[(path, scale), ...]`` adapters into a ModelBundle's params.

    Mutates ``bundle.params`` (rebinds to a new dict; untouched leaves are
    shared).  Returns per-tower fused-module counts.  Unmatched modules
    warn (or raise under ``strict``) — a text-encoder-only tree with a
    unet+te adapter is a legitimate partial application.
    """
    from videosd_tpu.io import weights as W

    stats: dict[str, int] = {}
    params = dict(bundle.params)
    for path, scale in loras:
        towers = read_lora(path)
        for tower, modules in towers.items():
            pkey = _TOWER_PARAMS.get(tower)
            if pkey is None or pkey not in params or params[pkey] is None:
                msg = f"{path}: no {tower!r} tower in the serving bundle"
                if strict:
                    raise KeyError(msg)
                log.warning("lora: %s — skipped %d modules", msg, len(modules))
                continue
            if tower == "unet":
                plan = W.unet_plan(bundle.unet_cfg)
            elif tower == "text_encoder":
                plan = W.clip_plan(bundle.clip_cfg)
            else:
                plan = W.clip_plan(bundle.clip2_cfg)
            fused, unmatched = fuse_lora(
                params[pkey], plan, modules, scale=scale
            )
            if unmatched:
                msg = (
                    f"{path}: {len(unmatched)} {tower} modules matched no "
                    f"param (e.g. {unmatched[:3]})"
                )
                if strict:
                    raise KeyError(msg)
                log.warning("lora: %s", msg)
            params[pkey] = fused
            n = len(modules) - len(unmatched)
            stats[tower] = stats.get(tower, 0) + n
            log.info(
                "lora: fused %d %s modules from %s (scale %.3g)",
                n,
                tower,
                os.path.basename(path),
                scale,
            )
    bundle.params = params
    return stats
