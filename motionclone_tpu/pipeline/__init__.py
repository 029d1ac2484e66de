from motionclone_tpu.pipeline.motionclone import (  # noqa: F401
    MotionClonePipeline,
    SamplingFns,
    make_sampling_fns,
)
