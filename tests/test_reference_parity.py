"""Differential test against the ACTUAL reference renderer.

Compiles cpu_launcher.cpp from the read-only reference checkout (in a temp
dir, nothing copied into this repo), runs it, and compares its PNG against
this framework's cpu-preset render at matched settings — the literal
'match CPU renders within Monte-Carlo tolerance' requirement
(BASELINE.json).  RNG streams differ (the reference's thread_local mt19937
is seeded from clock()), so the comparison is statistical: 16x16-block
means in gamma space.

Depth convention: the reference CPU recursion getColor(r, B) shades B+1
diffuse levels (terminates at depth < 0, cpu_launcher.cpp:567), so its
``bounces=B`` pairs with this framework's ``max_depth=B+1``.

Slow (compiles C++, renders 512x512 on the CPU backend) — enabled with
RT_REFERENCE_PARITY=1.  A recorded run against the real binary lives in
gallery/cpu_parity.json with the two images alongside.
"""
import os
import shutil
import subprocess

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    os.environ.get("RT_REFERENCE_PARITY") != "1"
    or not os.path.exists(os.path.join(REF, "cpu_launcher.cpp")),
    reason="set RT_REFERENCE_PARITY=1 (needs the reference checkout + g++)",
)


def _blockmean(x, b=16):
    h, w, c = x.shape
    return x.reshape(h // b, b, w // b, b, c).mean((1, 3))


def test_cpu_launcher_parity(tmp_path):
    from PIL import Image

    import jax

    from raytracinggpu_tpu.render.image_io import tonemap
    from raytracinggpu_tpu.render.pipeline import Camera, render_frame
    from raytracinggpu_tpu.scene.obj import CAT_OBJ_PATH
    from raytracinggpu_tpu.scene.presets import build_preset

    # Build + run the reference binary in a scratch dir.
    build = tmp_path / "refbuild"
    build.mkdir()
    for f in ("cpu_launcher.cpp", "stb_image.h", "stb_image_write.h"):
        shutil.copy(os.path.join(REF, f), build)
    subprocess.run(
        ["g++", "-O3", "-fopenmp", "-std=c++17", "cpu_launcher.cpp", "-o", "cpu_ref"],
        cwd=build, check=True,
    )
    assetdir = build / "cadnav.com_model" / "Models_F0202A090"
    assetdir.mkdir(parents=True)
    shutil.copy(CAT_OBJ_PATH, assetdir)
    spp, bounces = 4, 2
    subprocess.run(["./cpu_ref", str(spp), str(bounces)], cwd=build, check=True)
    ref_img = np.asarray(Image.open(build / "image.png").convert("RGB"))

    cfg, tables = build_preset(
        "cpu", width=512, height=512, spp=spp, max_depth=bounces + 1,
        traversal="dense",
    )
    cam = Camera.fixed(cfg.camera_c)
    img, _ = render_frame(tables, cfg, cam, jax.random.PRNGKey(0))
    ours = tonemap(np.asarray(img))

    diff = np.abs(
        _blockmean(ours.astype(np.float32)) - _blockmean(ref_img.astype(np.float32))
    )
    assert diff.mean() < 2.0, f"block-mean gamma diff {diff.mean():.2f}"
    assert (diff.max(-1) <= 8).mean() > 0.9
