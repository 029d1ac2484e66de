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
