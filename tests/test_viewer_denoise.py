"""Headless viewer turntable + denoiser tests."""
import os

import numpy as np
import jax.numpy as jnp

from rendertoy3c_tpu.app.cli import main
from rendertoy3c_tpu.film.denoise import atrous_denoise


def test_denoiser_reduces_noise_preserves_edges():
    rng = np.random.default_rng(0)
    h, w = 48, 48
    clean = np.zeros((h, w, 3), np.float32)
    clean[:, w // 2:] = 1.0  # hard vertical edge
    noisy = clean + rng.normal(0, 0.15, clean.shape).astype(np.float32)
    out = np.asarray(atrous_denoise(jnp.asarray(noisy), iterations=3))

    # noise reduced on the flat halves
    mse_in = ((noisy - clean)[:, : w // 2 - 4] ** 2).mean()
    mse_out = ((out - clean)[:, : w // 2 - 4] ** 2).mean()
    assert mse_out < 0.4 * mse_in
    # edge preserved: the two halves stay separated
    assert out[:, : w // 2 - 4].mean() < 0.3
    assert out[:, w // 2 + 4:].mean() > 0.7


def test_denoiser_with_guides():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    n = np.tile([0.0, 0.0, 1.0], (16, 16, 1)).astype(np.float32)
    out = atrous_denoise(jnp.asarray(img), normal=jnp.asarray(n),
                         position=jnp.asarray(img), iterations=2)
    assert np.isfinite(np.asarray(out)).all()


def test_cli_turntable(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main([
        "--scene", "cornell-empty", "--size", "16x16", "--spp", "1",
        "--subframes", "1", "--max-depth", "2", "--tracer", "brute",
        "--ray-block", "256", "--turntable", "2",
    ])
    assert rc == 0
    assert os.path.exists("frame_000.png")
    assert os.path.exists("frame_001.png")


def test_cli_denoise_flag(tmp_path):
    out = str(tmp_path / "dn.png")
    rc = main([
        "--scene", "cornell-empty", "--size", "16x16", "--spp", "1",
        "--subframes", "1", "--max-depth", "2", "--tracer", "brute",
        "--ray-block", "256", "--denoise", "2", "-o", out,
    ])
    assert rc == 0
    assert os.path.exists(out)
