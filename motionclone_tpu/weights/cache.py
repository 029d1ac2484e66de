"""Converted-parameter cache: skip checkpoint conversion on warm starts.

The reference re-runs its full torch checkpoint pipeline on every process
start — LDM key remapping, DreamBooth overrides, motion-module merge, LoRA
merges (reference util.py:115-215, convert_from_ckpt.py) — which costs tens
of seconds per run.  Here the *final* converted-and-merged flax parameter
trees are persisted once per unique source set as a single safetensors file
and loaded back (zero-copy mmap) on later startups.  Additive over the
reference (SURVEY §5: "Checkpoint / resume: model-weights-in only").

Cache entries are keyed by a fingerprint of every source file's
(path, size, mtime) plus the merge knobs and compute dtype, so editing or
swapping any checkpoint, LoRA, or model config invalidates the entry
automatically.  Entries are content-addressed files — concurrent runs can
share a cache directory (writes are atomic via rename).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Mapping, Optional, Sequence

import numpy as np

from motionclone_tpu.weights.convert import flatten_tree

_SEP = "::"  # component / parameter-path separator inside the safetensors


def _stat_entry(path: str):
    """(path, size, mtime_ns) for fingerprinting; missing files record as
    (path, None) so an appearing file also invalidates."""
    if not path:
        return None
    try:
        st = os.stat(path)
    except OSError:
        return [path, None]
    return [path, st.st_size, st.st_mtime_ns]


def _converter_fingerprint():
    """Stat entries for the conversion code itself (this package's source
    files): editing any converter — LDM remap, LoRA merge, tree builder —
    invalidates every cache entry automatically, so a remap fix can never
    silently serve stale wrongly-converted parameters."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    return [
        _stat_entry(os.path.join(pkg_dir, f))
        for f in sorted(os.listdir(pkg_dir))
        if f.endswith(".py")
    ]


def cache_key(source_paths: Sequence[str], knobs: Mapping[str, object]) -> str:
    """Fingerprint of the conversion inputs.

    ``source_paths``: every file whose bytes feed the converted parameters
    (resolved checkpoints, motion module, DreamBooth, LoRAs, model config).
    ``knobs``: non-file inputs (merge scales, dtype name, config digests).
    The conversion code's own source files are always included, so converter
    changes invalidate old entries without a manual schema bump.
    """
    payload = json.dumps(
        [
            [_stat_entry(p) for p in source_paths],
            dict(sorted(knobs.items())),
            _converter_fingerprint(),
        ],
        sort_keys=True,
        default=str,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:24]


def _entry_path(cache_dir: str, key: str) -> str:
    return os.path.join(cache_dir, f"params-{key}.safetensors")


def save_params(
    cache_dir: str, key: str, trees: Mapping[str, Optional[Mapping]]
) -> str:
    """Persist component parameter trees (``{"unet": {"params": ...}, ...}``)
    as one safetensors entry; ``None`` components are skipped.  Atomic."""
    from safetensors.numpy import save_file

    os.makedirs(cache_dir, exist_ok=True)
    # sweep crash-orphaned temp files from earlier runs (a crash between
    # save_file and the rename leaves a full-size *.tmp.<pid> behind);
    # age-gate the sweep so a concurrent run's in-flight tmp is untouched
    import time

    for name in os.listdir(cache_dir):
        if ".safetensors.tmp." in name:
            p = os.path.join(cache_dir, name)
            try:
                if time.time() - os.path.getmtime(p) > 3600:
                    os.remove(p)
            except OSError:
                pass
    flat: Dict[str, np.ndarray] = {}
    for comp, tree in trees.items():
        if tree is None:
            continue
        if _SEP in comp:
            raise ValueError(f"component name may not contain {_SEP!r}: {comp}")
        for k, v in flatten_tree(tree).items():
            # contiguous is load-bearing: safetensors serializes the RAW
            # buffer, so a transposed/sliced view would be written in its
            # source layout — same shape, silently permuted data
            flat[f"{comp}{_SEP}{k}"] = np.ascontiguousarray(np.asarray(v))
    path = _entry_path(cache_dir, key)
    tmp = f"{path}.tmp.{os.getpid()}"
    save_file(flat, tmp)
    os.replace(tmp, path)
    return path


def load_params(cache_dir: str, key: str) -> Optional[Dict[str, dict]]:
    """Load a cache entry back into nested component trees, or None on a
    miss (absent or unreadable entry — a corrupt file is treated as a miss
    rather than an error, since the caller can always reconvert)."""
    from safetensors.numpy import load_file

    path = _entry_path(cache_dir, key)
    if not os.path.exists(path):
        return None
    try:
        flat = load_file(path)
    except Exception:
        return None
    out: Dict[str, dict] = {}
    for fk, v in flat.items():
        comp, param_path = fk.split(_SEP, 1)
        node = out.setdefault(comp, {})
        parts = param_path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out
