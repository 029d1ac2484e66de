from motionclone_tpu.io.video import (  # noqa: F401
    preprocess_video,
    read_video_frames,
    resize_bilinear_align_corners,
    write_video,
)
