from motionclone_tpu.diffusion.ddim import (  # noqa: F401
    DDIMParams,
    add_noise,
    build_timesteps,
    ddim_step,
    make_ddim_params,
)
from motionclone_tpu.diffusion.guidance import (  # noqa: F401
    gather_sparse_probs,
    motion_guidance_loss,
    ramp_scales,
    sparsify_top1,
)
