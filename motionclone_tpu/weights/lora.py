"""LoRA merging on flat diffusers-style state dicts.

Rebuild of the reference's two merge paths
(convert_lora_safetensor_to_diffusers.py):

* ``merge_kohya_lora`` — community "lora_unet_*"/"lora_te_*" underscore
  naming with per-pair ``.alpha`` (reference ``convert_lora``, :50-112);
* ``merge_diffusers_lora`` — "...processor.to_q_lora.down.weight" naming
  used by AnimateDiff motion-LoRAs / domain adapters (reference
  ``load_diffusers_lora``, :27-47).

Both compute ``W += alpha * up @ down`` in float32 on numpy arrays, before
the torch->flax conversion, so the merge logic is model-agnostic.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

StateDict = Dict[str, np.ndarray]


def _matmul_delta(up: np.ndarray, down: np.ndarray) -> np.ndarray:
    if up.ndim == 4:  # 1x1 conv lora
        up2 = up.reshape(up.shape[0], up.shape[1])
        down2 = down.reshape(down.shape[0], down.shape[1])
        return (up2.astype(np.float32) @ down2.astype(np.float32))[
            :, :, None, None
        ]
    return up.astype(np.float32) @ down.astype(np.float32)


def _underscore_index(base: Mapping[str, np.ndarray]) -> Dict[str, str]:
    """{'down_blocks_0_attentions_0_..._to_q': 'down_blocks.0.….to_q.weight'}"""
    index = {}
    for key in base:
        if key.endswith(".weight"):
            index[key[: -len(".weight")].replace(".", "_")] = key
    return index


def merge_kohya_lora(
    base: Mapping[str, np.ndarray],
    lora: Mapping[str, np.ndarray],
    alpha: float = 0.6,
    prefix: str = "lora_unet",
) -> StateDict:
    """Merge a kohya-format LoRA into a base state dict (copy-on-write).

    The reference resolves underscore names by greedily walking module
    attributes (:76-88); here the same resolution is a dictionary lookup
    against the underscore-joined base keys.
    """
    out = dict(base)
    index = _underscore_index(base)
    for key in lora:
        if ".alpha" in key or "lora_up" in key:
            continue
        if not key.startswith(prefix + "_"):
            continue
        if "lora_down" not in key:
            continue
        name = key.split(".")[0][len(prefix) + 1:]
        target = index.get(name)
        if target is None:
            raise KeyError(f"LoRA target not found in base model: {name}")
        down = np.asarray(lora[key])
        up = np.asarray(lora[key.replace("lora_down", "lora_up")])
        delta = _matmul_delta(up, down)
        out[target] = (
            out[target].astype(np.float32) + alpha * delta
        ).astype(out[target].dtype)
    return out


def merge_diffusers_lora(
    base: Mapping[str, np.ndarray],
    lora: Mapping[str, np.ndarray],
    alpha: float = 1.0,
) -> StateDict:
    """Merge a diffusers processor-format LoRA (reference :27-47)."""
    out = dict(base)
    for key in lora:
        if "up." in key:
            continue
        up_key = key.replace(".down.", ".up.")
        model_key = (
            key.replace("processor.", "")
            .replace("_lora", "")
            .replace("down.", "")
            .replace("up.", "")
        )
        model_key = model_key.replace("to_out.", "to_out.0.")
        if model_key not in out:
            raise KeyError(f"LoRA target not found in base model: {model_key}")
        delta = _matmul_delta(np.asarray(lora[up_key]), np.asarray(lora[key]))
        out[model_key] = (
            out[model_key].astype(np.float32) + alpha * delta
        ).astype(out[model_key].dtype)
    return out
