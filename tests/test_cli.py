"""CLI tests via subprocess (reference test/test_cli.py pattern)."""

import os
import subprocess
import sys

import h5py
import numpy as np
import pytest

# real training loops / multi-minute compiles: full tier only
pytestmark = pytest.mark.slow

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(func_name, args, cwd):
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.argv = ['cli'] + {args!r}\n"
        f"from torch_em_tpu.cli import {func_name}\n"
        f"{func_name}()\n"
    )
    env = dict(os.environ, PYTHONPATH=REPO_ROOT)
    return subprocess.run([sys.executable, "-c", code], cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=600)


@pytest.fixture
def cli_data(tmp_path):
    path = str(tmp_path / "data.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=np.random.rand(8, 64, 64).astype("float32"))
        f.create_dataset("labels", data=np.random.randint(0, 3, (8, 64, 64)).astype("uint32"))
    return path


class TestCLI:
    def test_train_2d_unet_and_predict(self, cli_data, tmp_path):
        result = _run_cli("train_2d_unet", [
            "-i", cli_data, "-l", cli_data, "-k", "raw", "--training_label_key", "labels",
            "-b", "2", "-p", "1", "32", "32", "-n", "2", "-m", "foreground",
            "--name", "cli-test",
        ], cwd=str(tmp_path))
        assert result.returncode == 0, result.stderr[-2000:]
        assert os.path.exists(tmp_path / "checkpoints" / "cli-test" / "latest.ckpt")

        # prediction with padding through the CLI (2d input for the 2d model)
        pred_input = str(tmp_path / "pred_input.h5")
        with h5py.File(pred_input, "w") as f:
            f.create_dataset("raw", data=np.random.rand(50, 70).astype("float32"))
        out_path = str(tmp_path / "pred.h5")
        result = _run_cli("predict", [
            "-c", str(tmp_path / "checkpoints" / "cli-test"), "-i", pred_input, "-k", "raw",
            "-o", out_path, "--output_key", "pred", "--min_divisible", "16", "16", "-d", "cpu",
        ], cwd=str(tmp_path))
        assert result.returncode == 0, result.stderr[-2000:]
        with h5py.File(out_path, "r") as f:
            assert "pred" in f

    def test_train_3d_unet_and_predict_with_tiling(self, cli_data, tmp_path):
        result = _run_cli("train_3d_unet", [
            "-i", cli_data, "-l", cli_data, "-k", "raw", "--training_label_key", "labels",
            "-b", "1", "-p", "8", "32", "32", "-n", "2", "-m", "boundaries",
            "-s", "[[1,2,2],[2,2,2]]", "--name", "cli-test-3d",
        ], cwd=str(tmp_path))
        assert result.returncode == 0, result.stderr[-2000:]
        assert os.path.exists(tmp_path / "checkpoints" / "cli-test-3d" / "latest.ckpt")

        pred_input = str(tmp_path / "pred_input3d.h5")
        with h5py.File(pred_input, "w") as f:
            f.create_dataset("raw", data=np.random.rand(8, 48, 48).astype("float32"))
        out_path = str(tmp_path / "pred3d.h5")
        result = _run_cli("predict_with_tiling", [
            "-c", str(tmp_path / "checkpoints" / "cli-test-3d"), "-i", pred_input, "-k", "raw",
            "-o", out_path, "--output_key", "pred", "-b", "8", "32", "32",
            "--halo", "0", "8", "8", "-d", "cpu",
        ], cwd=str(tmp_path))
        assert result.returncode == 0, result.stderr[-2000:]
        with h5py.File(out_path, "r") as f:
            assert "pred" in f
            assert f["pred"].shape[-3:] == (8, 48, 48)
