from motionclone_tpu.weights.convert import (  # noqa: F401
    merge_state_dicts,
    torch_to_flax,
    validate_against,
)
from motionclone_tpu.weights.io import load_state_dict  # noqa: F401
