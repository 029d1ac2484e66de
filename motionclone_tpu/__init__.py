"""motionclone_tpu — a TPU-native JAX framework for training-free motion cloning.

A from-scratch rebuild of the capabilities of LPengYang/MotionClone
(reference: /root/reference, arXiv:2406.05338) designed TPU-first:

* AnimateDiff-style SD1.5 UNet3D (spatial + temporal motion-module attention)
  as pure flax.linen modules in channels-last layout.
* Sparse temporal-attention motion representation extracted in a single
  truncated UNet forward (reference: motionclone_functions.py:26-82).
* Motion guidance as ``jax.grad`` of a pure (latents -> loss) function —
  replacing the reference's autograd hooks / attention recorders
  (reference: motionclone_functions.py:236, xformer_attention.py).
* Guided DDIM sampling as two ``lax.scan`` phases under one ``jit``.
* CFG pairs / JSONL example batches shard over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from motionclone_tpu import config  # noqa: F401
