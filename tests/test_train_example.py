"""Smoke test for examples/train_t3.py: the sharded training loop runs,
losses are finite, and checkpoint/resume works (subprocess, 8 virtual CPU
devices)."""
import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(args, ckpt_dir):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = str(REPO / "tests" / ".jax_cache")
    env["PYTHONPATH"] = str(REPO)
    return subprocess.run(
        [sys.executable, str(REPO / "examples" / "train_t3.py"),
         "--tiny", "--dp", "2", "--batch", "2", "--warmup", "1",
         "--ckpt-dir", str(ckpt_dir)] + args,
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)


def test_train_and_resume(tmp_path):
    ckpt = tmp_path / "ckpt"
    r = _run(["--steps", "3", "--ckpt-every", "3"], ckpt)
    assert r.returncode == 0, r.stderr[-2000:]
    m = re.search(r"loss_text (\d+\.\d+)\s+loss_speech (\d+\.\d+)", r.stdout)
    assert m, r.stdout
    assert float(m.group(1)) > 0 and float(m.group(2)) > 0
    assert (ckpt / "params.safetensors").exists()
    assert (ckpt / "step.npy").exists()

    r2 = _run(["--steps", "5", "--ckpt-every", "5", "--resume"], ckpt)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed from step 3" in r2.stdout, r2.stdout
    assert "done: 2 steps" in r2.stdout, r2.stdout
