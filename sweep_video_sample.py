"""Data-parallel T2V sweep: all JSONL examples sharded across TPU chips.

New TPU-native surface (the reference is strictly serial/single-GPU,
SURVEY §2.5): examples batch along the leading axis and shard over the
mesh's ``data`` axis; a v5e-8 slice runs 8 examples per sampling pass.
"""

from motionclone_tpu.cli import sweep_main

if __name__ == "__main__":
    sweep_main()
