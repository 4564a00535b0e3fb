"""External-tool shell for the RGB pipeline: video -> frames, OpenPose
keypoint detection, person segmentation masks.

Behavioral parity target: /root/reference/humor/utils/video.py
(video_to_images :13-40, run_openpose :48-83, run_deeplab_v3 :86-156).

All three stay host-side subprocess / torch-hub steps (they never touch
the TPU). Each is gated on its tool's availability with a clear error,
and the fitting CLI keeps the precomputed-keypoints escape hatch
(reference run_fitting.py:124-161) so TPU CI never needs them.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import List, Optional


def video_to_images(vid_path: str, out_path: str, fps: float = 30.0,
                    ext: str = "png") -> str:
    """Extract frames at `fps` with ffmpeg (reference :13-40)."""
    if not shutil.which("ffmpeg"):
        raise RuntimeError(
            "ffmpeg not found; extract frames manually or install ffmpeg")
    os.makedirs(out_path, exist_ok=True)
    cmd = ["ffmpeg", "-i", vid_path, "-f", "image2", "-v", "error",
           "-vf", f"fps={fps}",
           os.path.join(out_path, f"%06d.{ext}")]
    subprocess.run(cmd, check=True)
    return out_path


def run_openpose(openpose_path: str, img_dir: str, out_dir: str,
                 video_out: Optional[str] = None,
                 img_out: Optional[str] = None) -> str:
    """Run the OpenPose binary for BODY_25 keypoints, max 1 person, JSON
    out (reference :48-83). Requires a local OpenPose build."""
    binary = os.path.join(openpose_path, "build/examples/openpose/"
                          "openpose.bin")
    if not os.path.exists(binary):
        raise RuntimeError(
            f"OpenPose binary not found at {binary}; pass precomputed "
            "keypoints with --op-keypts instead")
    os.makedirs(out_dir, exist_ok=True)
    cmd = [binary,
           "--image_dir", os.path.abspath(img_dir),
           "--write_json", os.path.abspath(out_dir),
           "--display", "0",
           "--model_pose", "BODY_25",
           "--number_people_max", "1"]
    if img_out:
        os.makedirs(img_out, exist_ok=True)
        cmd += ["--write_images", os.path.abspath(img_out)]
    else:
        cmd += ["--render_pose", "0"]
    if video_out:
        cmd += ["--write_video", os.path.abspath(video_out)]
    subprocess.run(cmd, check=True, cwd=openpose_path)
    return out_dir


def run_deeplab_v3(img_dir: str, out_dir: str, batch_size: int = 16,
                   device: str = "cpu") -> str:
    """Person segmentation masks with torchvision DeepLabv3 (reference
    :86-156 uses torch.hub; torchvision weights need one download). Masks
    are white where a person occluder is NOT (mask != 0 means occluded in
    the loaders' convention -> here person pixels are 0)."""
    import numpy as np
    import torch
    from PIL import Image

    try:
        model = torch.hub.load("pytorch/vision", "deeplabv3_resnet50",
                               weights="DEFAULT")
    except Exception as e:  # no network / cache
        raise RuntimeError(
            f"could not load DeepLabv3 ({e}); provide masks manually") \
            from e
    model.eval().to(device)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)

    os.makedirs(out_dir, exist_ok=True)
    paths = sorted(p for p in os.listdir(img_dir)
                   if p.endswith((".png", ".jpg")))
    with torch.no_grad():
        for i in range(0, len(paths), batch_size):
            batch_paths = paths[i: i + batch_size]
            imgs = []
            for p in batch_paths:
                im = np.asarray(Image.open(os.path.join(img_dir, p))
                                .convert("RGB"), np.float32) / 255.0
                t = torch.from_numpy(im).permute(2, 0, 1)
                imgs.append((t - mean) / std)
            out = model(torch.stack(imgs).to(device))["out"].argmax(1)
            person = (out == 15).cpu().numpy()  # VOC class 15 = person
            for p, m in zip(batch_paths, person):
                # occluder convention: non-person pixels are non-zero
                mask = ((~m) * 255).astype(np.uint8)
                Image.fromarray(mask).save(
                    os.path.join(out_dir,
                                 os.path.splitext(p)[0] + ".png"))
    return out_dir
