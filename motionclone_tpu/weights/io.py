"""State-dict file readers: safetensors and torch pickle checkpoints.

Torch-free on the safetensors path; ``.ckpt``/``.pt`` pickles use torch-cpu
(baked into the image) purely as a deserializer, with tensors converted to
numpy immediately.  Replaces the reference's torch.load usage
(util.py:124-158).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a checkpoint file into a flat {torch_key: numpy array} dict."""
    if not os.path.isfile(path):
        raise FileNotFoundError(path)
    if path.endswith(".safetensors"):
        from safetensors import numpy as st_numpy

        return dict(st_numpy.load_file(path))
    # torch pickle (.ckpt / .pt / .pth / .bin)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out: Dict[str, np.ndarray] = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            t = v.detach()
            if t.dtype == torch.bfloat16:
                t = t.float()
            out[k] = t.numpy()
        else:
            out[k] = np.asarray(v)
    return out


# Known hub assets the reference can auto-fetch (util.py:28-54,101-113).
MOTION_MODULES = (
    "mm_sd_v14.ckpt", "mm_sd_v15.ckpt", "mm_sd_v15_v2.ckpt", "v3_sd15_mm.ckpt",
)
ADAPTERS = ("v3_sd15_adapter.ckpt",)


def auto_download(local_path: str, is_dreambooth_lora: bool = False) -> None:
    """Fetch a missing well-known checkpoint from the HF hub.

    Mirrors the reference's ``auto_download`` (util.py:101-113).  Gated:
    in zero-egress environments (no ``huggingface_hub`` or no network)
    this raises ``FileNotFoundError`` with the repo/filename the user
    should fetch manually, instead of failing deep inside a load.
    """
    if os.path.exists(local_path):
        return
    hf_repo = (
        "guoyww/animatediff_t2i_backups"
        if is_dreambooth_lora
        else "guoyww/animatediff"
    )
    folder, filename = os.path.split(local_path)
    folder = folder or "."
    hint = (
        f"{local_path} not found; download {filename} from "
        f"https://huggingface.co/{hf_repo} into {folder}/"
    )
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:
        raise FileNotFoundError(f"{hint} (huggingface_hub unavailable)") from e
    os.makedirs(folder, exist_ok=True)
    try:
        snapshot_download(repo_id=hf_repo, local_dir=folder,
                          allow_patterns=[filename])
    except Exception as e:  # zero-egress / auth / missing-asset
        raise FileNotFoundError(f"{hint} (auto-download failed: {e})") from e
