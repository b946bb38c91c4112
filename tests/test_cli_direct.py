"""CLI smoke test for the direct-lighting renderer and explicit tracers."""
import os

from rendertoy3c_tpu.app.cli import main


def test_cli_direct_renderer(tmp_path):
    out = str(tmp_path / "direct.png")
    rc = main([
        "--scene", "cornell", "--size", "24x24", "--spp", "1",
        "--subframes", "1", "--renderer", "direct", "--tracer", "brute",
        "--ray-block", "576", "-o", out,
    ])
    assert rc == 0
    assert os.path.exists(out)


def test_cli_wave_integrator(tmp_path):
    out = str(tmp_path / "wave.png")
    rc = main([
        "--scene", "cornell-empty", "--size", "16x16", "--spp", "1",
        "--subframes", "1", "--integrator", "wave", "--tracer", "brute",
        "--max-depth", "2", "--ray-block", "256", "-o", out,
    ])
    assert rc == 0
    assert os.path.exists(out)
