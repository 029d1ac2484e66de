"""Generic torch-state-dict -> flax-param-tree conversion.

Because every model in this framework names its submodules after the
diffusers/HF dotted paths (``down_blocks.0.resnets.1.conv1`` ->
``down_blocks_0 / resnets_1 / conv1``), conversion is a mechanical rule:

* path segments: each ``name.N`` (digit) collapses into one segment
  ``name_N``; other names are their own segment;
* leaves: ``weight`` with ndim 4 -> conv ``kernel`` (OIHW -> HWIO);
  ndim 2 -> dense ``kernel`` (transposed); ndim 1 -> norm ``scale``;
  ``bias`` -> ``bias``; embedding tables -> ``embedding`` untransposed.

Replaces the per-model key surgery of the reference's loader
(util.py:115-215).  ``validate_against`` is the silent-error catcher
demanded by SURVEY §7 hard part 1: every loaded path must exist in the
model-initialized tree with the same shape, and (optionally) every model
parameter must be covered.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Mapping, Optional, Sequence, Tuple

import numpy as np

FlaxParams = Dict[str, object]

# buffers that exist in torch state dicts but are constants here
DEFAULT_SKIP_SUBSTRINGS: Tuple[str, ...] = ("pos_encoder.pe",)

_EMBEDDING_MARKERS: Tuple[str, ...] = (
    "token_embedding",
    "position_embedding",
    "class_embedding",
)


def torch_key_to_path(key: str) -> List[str]:
    """'down_blocks.0.resnets.1.conv1.weight' ->
    ['down_blocks_0', 'resnets_1', 'conv1', 'weight']."""
    segments: List[str] = []
    for seg in key.split("."):
        if seg.isdigit() and segments:
            segments[-1] = f"{segments[-1]}_{seg}"
        else:
            segments.append(seg)
    return segments


def transform_leaf(
    key: str, leaf: str, value: np.ndarray
) -> Tuple[str, np.ndarray]:
    """Map a torch parameter leaf to (flax_name, transformed array)."""
    if leaf == "bias":
        return "bias", value
    if leaf == "weight":
        if any(m in key for m in _EMBEDDING_MARKERS):
            return "embedding", value
        if value.ndim == 4:  # conv OIHW -> HWIO
            return "kernel", value.transpose(2, 3, 1, 0)
        if value.ndim == 2:  # dense (out,in) -> (in,out)
            return "kernel", value.T
        if value.ndim == 1:  # norm scale
            return "scale", value
    raise ValueError(f"unhandled leaf '{leaf}' (ndim={value.ndim}) for key '{key}'")


def _set_nested(tree: dict, path: Sequence[str], value: np.ndarray, key: str) -> None:
    node = tree
    for seg in path[:-1]:
        node = node.setdefault(seg, {})
        if not isinstance(node, dict):
            raise ValueError(f"path conflict at '{seg}' while inserting '{key}'")
    if path[-1] in node:
        raise ValueError(f"duplicate parameter path for '{key}'")
    node[path[-1]] = value


def torch_to_flax(
    state_dict: Mapping[str, np.ndarray],
    *,
    skip_substrings: Iterable[str] = DEFAULT_SKIP_SUBSTRINGS,
    strip_prefix: str = "",
    dtype: Optional[np.dtype] = None,
    norm_dtype: Optional[np.dtype] = np.float32,
) -> FlaxParams:
    """Convert a flat torch state dict into a nested flax param tree.

    ``dtype`` casts conv/dense kernels and biases (e.g. bfloat16 for TPU
    compute); ``norm_dtype`` keeps norm scales/biases in float32.
    """
    skip = tuple(skip_substrings)
    tree: FlaxParams = {}
    for key, value in state_dict.items():
        if strip_prefix:
            if not key.startswith(strip_prefix):
                continue
            key = key[len(strip_prefix):]
        if any(s in key for s in skip):
            continue
        path = torch_key_to_path(key)
        leaf_name, arr = transform_leaf(key, path[-1], np.asarray(value))
        if dtype is not None and leaf_name in ("kernel", "bias", "embedding"):
            # biases of norm layers travel with scale in norm_dtype; they are
            # distinguished by their sibling 'scale' only after assembly, so
            # cast 1-D biases conservatively to norm_dtype
            if norm_dtype is not None and leaf_name == "bias" and arr.ndim == 1:
                # both dense and norm biases are 1-D; keeping f32 is safe
                arr = arr.astype(norm_dtype)
            else:
                arr = arr.astype(dtype)
        if norm_dtype is not None and leaf_name == "scale":
            arr = arr.astype(norm_dtype)
        _set_nested(tree, path[:-1] + [leaf_name], arr, key)
    return tree


def merge_state_dicts(
    base: Mapping[str, np.ndarray],
    overlay: Mapping[str, np.ndarray],
    *,
    filter_substring: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """Overlay (optionally filtered) keys onto a base state dict.

    The motion-module merge of the reference (util.py:128-137) is
    ``merge_state_dicts(sd_unet, motion_ckpt, filter_substring="motion_modules.")``.
    """
    out = dict(base)
    for k, v in overlay.items():
        if filter_substring is not None and filter_substring not in k:
            continue
        out[k] = v
    return out


def flatten_tree(tree: Mapping, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, Mapping):
            flat.update(flatten_tree(v, p))
        else:
            flat[p] = v
    return flat


def validate_against(
    loaded: Mapping,
    reference: Mapping,
    *,
    require_full_coverage: bool = True,
    allow_missing_substrings: Tuple[str, ...] = (),
) -> None:
    """Raise unless every loaded path exists in ``reference`` with the same
    shape, and (optionally) every reference parameter was loaded."""
    flat_loaded = flatten_tree(loaded)
    flat_ref = flatten_tree(reference)

    unexpected = sorted(set(flat_loaded) - set(flat_ref))
    if unexpected:
        raise ValueError(
            f"{len(unexpected)} unexpected parameter paths, e.g. {unexpected[:5]}"
        )
    mismatched = [
        (k, flat_loaded[k].shape, flat_ref[k].shape)
        for k in flat_loaded
        if tuple(flat_loaded[k].shape) != tuple(flat_ref[k].shape)
    ]
    if mismatched:
        raise ValueError(f"shape mismatches: {mismatched[:5]}")
    if require_full_coverage:
        missing = sorted(
            k
            for k in set(flat_ref) - set(flat_loaded)
            if not any(s in k for s in allow_missing_substrings)
        )
        if missing:
            raise ValueError(
                f"{len(missing)} model parameters not covered by checkpoint, "
                f"e.g. {missing[:5]}"
            )
