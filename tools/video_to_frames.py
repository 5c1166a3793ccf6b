"""Decode videos to frame JPEGs at annotation fps (ffmpeg shell-out).

Counterpart of reference datasets/vidor_video_to_frames.py and
vidvrd_video_to_frames.py:30-33. Frames land in <out_dir>/<video>/%06d.jpg.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import shutil
import subprocess


def decode_video(video_path: str, out_dir: str, fps: float) -> None:
    os.makedirs(out_dir, exist_ok=True)
    cmd = ["ffmpeg", "-loglevel", "error", "-i", video_path,
           "-r", str(fps), "-q:v", "1",
           os.path.join(out_dir, "%06d.jpg")]
    subprocess.run(cmd, check=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_dir", required=True)
    p.add_argument("--anno_dir", required=True,
                   help="per-video annotation JSONs carrying 'fps'")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--ext", default=".mp4")
    args = p.parse_args()

    if shutil.which("ffmpeg") is None:
        raise SystemExit("ffmpeg not found on PATH")

    for name in sorted(os.listdir(args.anno_dir)):
        if not name.endswith(".json"):
            continue
        video = name[:-5]
        with open(os.path.join(args.anno_dir, name)) as f:
            anno = json.load(f)
        fps = anno.get("fps", 30)
        src = os.path.join(args.video_dir, video + args.ext)
        dst = os.path.join(args.out_dir, video)
        if os.path.exists(dst) and os.listdir(dst):
            continue
        print(f"decoding {video} @ {fps} fps")
        decode_video(src, dst, fps)


if __name__ == "__main__":
    main()
