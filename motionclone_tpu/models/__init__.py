from motionclone_tpu.models.unet3d import UNet3DConditionModel  # noqa: F401
