"""Warm-runtime HTTP serving of MotionClone generation jobs.

New TPU-native surface (the reference has no serving story, SURVEY §5):
one resident runtime (converted weights + compiled pipeline) drains a FIFO
job queue onto the single TPU stream; requests use the reference's JSONL
example schema as JSON bodies.

    python serve_video_sample.py --inference_config configs/t2v_camera.yaml
    curl -X POST localhost:8000/generate -d '{"video_path": "...", "new_prompt": "..."}'
"""

from motionclone_tpu.cli import serve_main

if __name__ == "__main__":
    serve_main()
