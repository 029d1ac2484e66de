"""T2V motion-cloning CLI — mirrors the reference's t2v_video_sample.py.

Same flags, same YAML/JSONL configs, same output naming; runs the TPU-native
pipeline.  (reference: /root/reference/t2v_video_sample.py:107-124)
"""

from motionclone_tpu.cli import t2v_main

if __name__ == "__main__":
    t2v_main()
