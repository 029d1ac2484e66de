from motionclone_tpu.ops.attention import (  # noqa: F401
    attention_probs,
    dot_product_attention,
)
