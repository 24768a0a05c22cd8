"""Video frame extraction / assembly (port of utility/video.py)."""
from __future__ import annotations

import glob
import os

import cv2


def extract_frames(video_path, out_dir, every=1, ext="png"):
    """Dump frames of a video to out_dir/%06d.ext. Returns count."""
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    i = saved = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % every == 0:
            cv2.imwrite(os.path.join(out_dir, f"{saved:06d}.{ext}"),
                        frame)
            saved += 1
        i += 1
    cap.release()
    return saved


def assemble_video(frame_dir, out_path, fps=30, pattern="*.png"):
    """Stitch sorted frames into an mp4. Returns frame count."""
    frames = sorted(glob.glob(os.path.join(frame_dir, pattern)))
    if not frames:
        return 0
    first = cv2.imread(frames[0])
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(out_path,
                             cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        writer.write(cv2.imread(f))
    writer.release()
    return len(frames)
