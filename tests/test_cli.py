"""CLI smoke tests (python -m csgrenderer_tpu)."""

import numpy as np
import pytest

from csgrenderer_tpu.__main__ import main
from csgrenderer_tpu.io import image


def test_render_milestone01(tmp_path, capsys):
    out = tmp_path / "m1.png"
    main([
        "render", "--scene", "milestone01", "--width", "64", "--height", "48",
        "--out", str(out),
    ])
    img = image.read_png(out)
    assert img.shape == (48, 64, 3)
    assert "wrote" in capsys.readouterr().out


def test_render_diffuse_jnp(tmp_path):
    out = tmp_path / "d.png"
    main([
        "render", "--scene", "diffuse", "--width", "48", "--height", "32",
        "--spp", "1", "--bounces", "2", "--backend", "jnp", "--out", str(out),
    ])
    img = image.read_png(out)
    assert img.shape == (32, 48, 3)
    assert img.mean() > 10  # not black


def test_gif_milestone01(tmp_path):
    out = tmp_path / "m1.gif"
    main([
        "gif", "--scene", "milestone01", "--width", "32", "--height", "24",
        "--frames", "3", "--out", str(out),
    ])
    assert out.read_bytes().startswith(b"GIF89a")


def test_unknown_scene_errors(tmp_path):
    with pytest.raises(SystemExit):
        main(["render", "--scene", "nope", "--out", str(tmp_path / "x.png")])
