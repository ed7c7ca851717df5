"""CLI custom-OBJ and LBVH-builder paths."""
import os

from raytracinggpu_tpu.cli.main import main
from raytracinggpu_tpu.render.image_io import read_png


def test_render_custom_obj(tmp_path):
    # A ground-plane quad mesh instead of the cat.
    p = tmp_path / "quad.obj"
    p.write_text(
        "v -10 -8 -10\nv 10 -8 -10\nv 10 -8 10\nv -10 -8 10\n"
        "f 1 2 3 4\n"
    )
    out = str(tmp_path / "o.png")
    rc = main([
        "render", "2", "2", "--preset", "array_bvh",
        "--width", "16", "--height", "16",
        "--obj", str(p), "--out", out,
    ])
    assert rc == 0
    assert read_png(out).shape == (16, 16, 3)


def test_render_lbvh_builder(tmp_path):
    out = str(tmp_path / "l.png")
    rc = main([
        "render", "1", "2", "--preset", "array_bvh",
        "--width", "16", "--height", "16",
        "--bvh-builder", "lbvh", "--out", out,
    ])
    assert rc == 0
    assert os.path.exists(out)
