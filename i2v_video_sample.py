"""I2V / sketch-to-video motion-cloning CLI — mirrors the reference's
i2v_video_sample.py: SparseControlNet conditioning (RGB or scribble) on top
of the guided sampling pipeline.  (reference: /root/reference/
i2v_video_sample.py:140-157 for the flag surface)
"""

from motionclone_tpu.cli import i2v_main

if __name__ == "__main__":
    i2v_main()
