"""Torch-consumable bioimage.io weights: the exported ``weights.pt`` state
dict must load into the reference's own torch UNet (loaded standalone from
/root/reference — pure torch) and reproduce the native model's outputs.
This is the ilastik/deepimageJ interop contract
(reference torch_em/util/modelzoo.py:158).
"""

import importlib.util

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _load_ref_unet():
    spec = importlib.util.spec_from_file_location(
        "ref_unet_export_test", "/root/reference/torch_em/model/unet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
class TestTorchExport:
    def test_unet2d_state_dict_roundtrip(self):
        from torch_em_tpu.models import UNet2d
        from torch_em_tpu.utils.modelzoo import torch_state_dict_from_flax

        model = UNet2d(in_channels=1, out_channels=2, initial_features=8,
                       depth=2, final_activation="Sigmoid", seed=3)
        state = torch_state_dict_from_flax(model)
        assert state is not None

        ref = _load_ref_unet()
        net = ref.UNet2d(in_channels=1, out_channels=2, initial_features=8,
                         depth=2, final_activation="Sigmoid")
        # strict load: every tensor must match by name and shape
        net.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in state.items()})
        net.eval()

        x = np.random.RandomState(0).rand(1, 1, 64, 64).astype("float32")
        out_jax = np.asarray(model(x))
        with torch.no_grad():
            out_torch = net(torch.from_numpy(x)).numpy()
        assert out_jax.shape == out_torch.shape
        np.testing.assert_allclose(out_jax, out_torch, atol=1e-4, rtol=1e-3)

    def test_unet3d_state_dict_loads(self):
        from torch_em_tpu.models import UNet3d
        from torch_em_tpu.utils.modelzoo import torch_state_dict_from_flax

        model = UNet3d(in_channels=1, out_channels=1, initial_features=4, depth=2)
        state = torch_state_dict_from_flax(model)
        ref = _load_ref_unet()
        net = ref.UNet3d(in_channels=1, out_channels=1, initial_features=4, depth=2)
        net.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in state.items()})

    @pytest.mark.parametrize(
        "norm", [None, "GroupNorm", "InstanceNormTrackStats", "BatchNorm"])
    def test_norm_configurations_roundtrip(self, norm):
        """Non-default norms: conv block indices shift (block.{0,2} for
        norm=None, reference unet.py:419-427), affine params live at
        block.{0,3}, and running stats must come from batch_stats."""
        import jax

        from torch_em_tpu.models import UNet2d
        from torch_em_tpu.utils.modelzoo import torch_state_dict_from_flax

        model = UNet2d(in_channels=1, out_channels=2, initial_features=8,
                       depth=2, norm=norm, seed=11)
        if norm in ("InstanceNormTrackStats", "BatchNorm"):
            # perturb the running stats so the comparison exercises them
            rs = np.random.RandomState(4)
            stats = jax.tree_util.tree_map(
                lambda a: (np.abs(rs.rand(*a.shape)) + 0.5).astype(np.float32),
                jax.device_get(model.variables["batch_stats"]))
            model.variables = dict(model.variables, batch_stats=stats)

        state = torch_state_dict_from_flax(model)
        ref = _load_ref_unet()
        net = ref.UNet2d(in_channels=1, out_channels=2, initial_features=8,
                         depth=2, norm=norm)
        net.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                             for k, v in state.items()})
        net.eval()

        x = np.random.RandomState(1).rand(1, 1, 32, 32).astype("float32")
        out_jax = np.asarray(model(x))
        with torch.no_grad():
            out_torch = net(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(out_jax, out_torch, atol=1e-4, rtol=1e-3)

    def test_export_writes_torch_weights(self, tmp_path):
        import json
        import os

        import yaml

        from torch_em_tpu.models import UNet2d
        from torch_em_tpu.utils.modelzoo import _write_torch_weights

        model = UNet2d(in_channels=1, out_channels=1, initial_features=4, depth=2)
        path, arch = _write_torch_weights(model, str(tmp_path))
        assert path is not None and os.path.exists(path)
        assert arch == "torch_em.model.unet.UNet2d"
        loaded = torch.load(path, weights_only=True)
        assert "out_conv.weight" in loaded


class TestTorchImport:
    """Reverse direction: a reference-produced bioimage.io package
    (``state_dict.pt`` written from the reference's own torch UNet, plus an
    rdf weights entry as reference modelzoo.py:158-186 emits it) imports into
    the native framework and reproduces the torch outputs."""

    def _make_package(self, folder, norm="InstanceNorm", seed=0):
        import yaml

        ref = _load_ref_unet()
        torch.manual_seed(seed)
        kwargs = dict(in_channels=1, out_channels=2, initial_features=8,
                      depth=2, norm=norm, final_activation="Sigmoid")
        net = ref.UNet2d(**kwargs)
        net.eval()
        torch.save(net.state_dict(), f"{folder}/state_dict.pt")
        rdf = {
            "weights": {"pytorch_state_dict": {
                "source": "state_dict.pt",
                "architecture": {"callable": "UNet2d",
                                 "import_from": "torch_em.model.unet",
                                 "kwargs": kwargs},
            }},
            "inputs": [{"axes": "bcyx",
                        "preprocessing": [{"id": "zero_mean_unit_variance"}]}],
        }
        with open(f"{folder}/rdf.yaml", "w") as f:
            yaml.safe_dump(rdf, f)
        return net

    @pytest.mark.parametrize("norm", ["InstanceNorm", "GroupNorm", "BatchNorm"])
    def test_reference_package_roundtrip(self, tmp_path, norm):
        from torch_em_tpu.utils.modelzoo import import_bioimageio_model

        net = self._make_package(str(tmp_path), norm=norm)
        if norm == "BatchNorm":
            # perturb running stats so the import has to carry them over
            with torch.no_grad():
                for name, buf in net.named_buffers():
                    if "running_mean" in name:
                        buf.add_(torch.randn_like(buf) * 0.1)
                    elif "running_var" in name:
                        buf.mul_(1.5)
            torch.save(net.state_dict(), tmp_path / "state_dict.pt")

        model, normalizer = import_bioimageio_model(str(tmp_path))
        x = np.random.RandomState(0).rand(1, 1, 64, 64).astype("float32")
        out_jax = np.asarray(model(x))
        with torch.no_grad():
            out_torch = net(torch.from_numpy(x)).numpy()
        assert out_jax.shape == out_torch.shape
        np.testing.assert_allclose(out_jax, out_torch, atol=1e-4, rtol=1e-3)
        from torch_em_tpu.transforms.raw import standardize
        assert normalizer is standardize

    def test_zip_package(self, tmp_path):
        from shutil import make_archive

        from torch_em_tpu.utils.modelzoo import import_bioimageio_model

        pkg = tmp_path / "pkg"
        pkg.mkdir()
        net = self._make_package(str(pkg))
        zip_path = make_archive(str(tmp_path / "model"), "zip", str(pkg))
        model, _ = import_bioimageio_model(zip_path)
        x = np.random.RandomState(1).rand(1, 1, 32, 32).astype("float32")
        with torch.no_grad():
            want = net(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(np.asarray(model(x)), want, atol=1e-4, rtol=1e-3)

    def test_strict_rejects_unknown_tensors(self, tmp_path):
        from torch_em_tpu.models import UNet2d
        from torch_em_tpu.utils.modelzoo import load_torch_unet_state

        model = UNet2d(in_channels=1, out_channels=2, initial_features=8, depth=2)
        state = {"encoder.blocks.0.block.1.weight": np.zeros((8, 1, 3, 3), "float32"),
                 "bogus.weight": np.zeros(3, "float32")}
        with pytest.raises(ValueError):
            load_torch_unet_state(model, state)


class TestAddWeightFormats:
    def test_add_pytorch_state_dict_to_package(self, tmp_path):
        """Build a minimal package by hand and add the torch weights entry."""
        import json
        import os

        import yaml
        from flax import serialization as flax_serialization

        import jax

        from torch_em_tpu.models import UNet2d
        from torch_em_tpu.utils.modelzoo import add_weight_formats

        model = UNet2d(in_channels=1, out_channels=1, initial_features=4, depth=2)
        folder = str(tmp_path)
        state = flax_serialization.to_state_dict(jax.device_get(model.variables))
        with open(os.path.join(folder, "weights.msgpack"), "wb") as f:
            f.write(flax_serialization.msgpack_serialize(state))
        with open(os.path.join(folder, "model_manifest.json"), "w") as f:
            json.dump({"factory": "torch_em_tpu.models.unet.UNet2d",
                       "kwargs": model.init_kwargs}, f)
        with open(os.path.join(folder, "rdf.yaml"), "w") as f:
            yaml.safe_dump({"weights": {"jax": {"source": "weights.msgpack"}}}, f)

        add_weight_formats(folder, ["pytorch_state_dict"])
        assert os.path.exists(os.path.join(folder, "weights.pt"))
        with open(os.path.join(folder, "rdf.yaml")) as f:
            rdf = yaml.safe_load(f)
        entry = rdf["weights"]["pytorch_state_dict"]
        assert entry["source"] == "weights.pt"
        assert entry["architecture"]["import_from"] == "torch_em.model.unet"


class TestTorchscriptExport:
    """``add_weight_formats(..., ['torchscript'])`` must produce a loadable
    traced module matching the native model (reference modelzoo.py:617-660)."""

    @staticmethod
    def _make_package(folder, **unet_kwargs):
        import json
        import os

        import jax
        import yaml
        from flax import serialization as flax_serialization

        from torch_em_tpu.models import UNet2d

        kwargs = dict(in_channels=1, out_channels=2, initial_features=4,
                      depth=2, final_activation="Sigmoid", seed=5)
        kwargs.update(unet_kwargs)
        model = UNet2d(**kwargs)
        state = flax_serialization.to_state_dict(jax.device_get(model.variables))
        with open(os.path.join(folder, "weights.msgpack"), "wb") as f:
            f.write(flax_serialization.msgpack_serialize(state))
        with open(os.path.join(folder, "model_manifest.json"), "w") as f:
            json.dump({"factory": "torch_em_tpu.models.unet.UNet2d",
                       "kwargs": model.init_kwargs}, f)
        with open(os.path.join(folder, "rdf.yaml"), "w") as f:
            yaml.safe_dump({"weights": {"jax": {"source": "weights.msgpack"}}}, f)
        x = np.random.RandomState(0).rand(1, 1, 32, 32).astype("float32")
        np.save(os.path.join(folder, "test_input.npy"), x)
        np.save(os.path.join(folder, "test_output.npy"), np.asarray(model(x)))
        return model, x

    def test_torchscript_roundtrip(self, tmp_path):
        import os

        import yaml

        from torch_em_tpu.utils.modelzoo import add_weight_formats

        folder = str(tmp_path)
        model, x = self._make_package(folder)
        add_weight_formats(folder, ["torchscript"])

        ts_path = os.path.join(folder, "weights_torchscript.pt")
        assert os.path.exists(ts_path)
        with open(os.path.join(folder, "rdf.yaml")) as f:
            rdf = yaml.safe_load(f)
        assert rdf["weights"]["torchscript"]["source"] == "weights_torchscript.pt"

        loaded = torch.jit.load(ts_path)
        with torch.no_grad():
            out_ts = loaded(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(np.asarray(model(x)), out_ts, atol=1e-4, rtol=1e-3)
        # the trace stays valid for other divisible input sizes
        y = np.random.RandomState(1).rand(1, 1, 64, 96).astype("float32")
        with torch.no_grad():
            out_other = loaded(torch.from_numpy(y)).numpy()
        np.testing.assert_allclose(np.asarray(model(y)), out_other, atol=1e-4, rtol=1e-3)

    def test_onnx_gated_without_onnx_package(self, tmp_path):
        """Without the onnx package installed the conversion must refuse
        with guidance instead of writing a broken file (and with it, write
        a real model — exercised implicitly wherever onnx is available)."""
        from torch_em_tpu.utils.modelzoo import convert_to_onnx

        folder = str(tmp_path)
        self._make_package(folder)
        try:
            import onnx  # noqa: F401
        except ImportError:
            with pytest.raises(NotImplementedError, match="onnx"):
                convert_to_onnx(folder)
        else:
            import os
            convert_to_onnx(folder)
            assert os.path.exists(os.path.join(folder, "weights.onnx"))

    def test_torchscript_anisotropic_3d(self, tmp_path):
        """The 3D path: anisotropic per-level scales + (1,3,3) kernels must
        survive the shape-driven mirror reconstruction and trace."""
        import json
        import os

        import jax
        import yaml
        from flax import serialization as flax_serialization

        from torch_em_tpu.models import AnisotropicUNet
        from torch_em_tpu.utils.modelzoo import add_weight_formats

        model = AnisotropicUNet(
            in_channels=1, out_channels=1, scale_factors=[[1, 2, 2], [2, 2, 2]],
            initial_features=4, anisotropic_kernel=True,
            final_activation="Sigmoid", seed=7)
        folder = str(tmp_path)
        state = flax_serialization.to_state_dict(jax.device_get(model.variables))
        with open(os.path.join(folder, "weights.msgpack"), "wb") as f:
            f.write(flax_serialization.msgpack_serialize(state))
        with open(os.path.join(folder, "model_manifest.json"), "w") as f:
            json.dump({"factory": "torch_em_tpu.models.unet.AnisotropicUNet",
                       "kwargs": model.init_kwargs}, f)
        with open(os.path.join(folder, "rdf.yaml"), "w") as f:
            yaml.safe_dump({"weights": {"jax": {"source": "weights.msgpack"}}}, f)
        x = np.random.RandomState(2).rand(1, 1, 4, 32, 32).astype("float32")
        np.save(os.path.join(folder, "test_input.npy"), x)
        np.save(os.path.join(folder, "test_output.npy"), np.asarray(model(x)))

        add_weight_formats(folder, ["torchscript"])
        loaded = torch.jit.load(os.path.join(folder, "weights_torchscript.pt"))
        with torch.no_grad():
            out_ts = loaded(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(np.asarray(model(x)), out_ts, atol=1e-4, rtol=1e-3)
