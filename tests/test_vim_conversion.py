"""hustvl/Vim (bimamba-v2) checkpoint-conversion fidelity.

A minimal torch implementation of hustvl's VisionMamba geometry (the model
the reference wraps, torch_em/model/vim.py:30 with the get_vim_encoder
config of vim.py:210-226: bimamba_type="v2", rms_norm, middle cls token,
if_divide_out, abs pos embed, final_pool_type="all") is built with random
weights, saved with the hustvl state-dict naming (``layers.{i}.mixer.*``),
converted via ``load_vim_weights``, and the native flax ``ViM`` encoder
outputs are compared numerically against the torch outputs — the same
pattern as tests/test_hiera_conversion.py.  The torch side runs the S6
recurrence sequentially; the flax side uses the parallel associative scan,
so agreement also validates the scan itself.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def t_rmsnorm(x, weight, eps=1e-5):
    return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps) * weight


class TBiMamba(tnn.Module):
    """mamba_simple.Mamba with bimamba_type='v2' (slow/sequential path)."""

    def __init__(self, d_model, d_state=8, d_conv=4, expand=2):
        super().__init__()
        e = expand * d_model
        self.d_state, self.d_conv, self.e = d_state, d_conv, e
        self.dt_rank = math.ceil(d_model / 16)
        self.in_proj = tnn.Linear(d_model, 2 * e, bias=False)
        self.out_proj = tnn.Linear(e, d_model, bias=False)
        for sfx in ("", "_b"):
            setattr(self, f"conv1d{sfx}",
                    tnn.Conv1d(e, e, d_conv, groups=e, padding=d_conv - 1, bias=True))
            setattr(self, f"x_proj{sfx}",
                    tnn.Linear(e, self.dt_rank + 2 * d_state, bias=False))
            setattr(self, f"dt_proj{sfx}", tnn.Linear(self.dt_rank, e, bias=True))
        self.A_log = tnn.Parameter(torch.log(
            torch.arange(1, d_state + 1, dtype=torch.float32).expand(e, d_state).clone()))
        self.A_b_log = tnn.Parameter(self.A_log.data.clone())
        self.D = tnn.Parameter(torch.ones(e))
        self.D_b = tnn.Parameter(torch.ones(e))

    def _scan(self, u, delta, A, B, C, D):
        # u, delta: (b, L, e); A: (e, n); B, C: (b, L, n); D: (e,)
        b, L, e = u.shape
        h = torch.zeros(b, e, A.shape[1])
        ys = []
        for t in range(L):
            dA = torch.exp(delta[:, t, :, None] * A)
            dBu = delta[:, t, :, None] * B[:, t, None, :] * u[:, t, :, None]
            h = dA * h + dBu
            ys.append(torch.einsum("ben,bn->be", h, C[:, t]) + D * u[:, t])
        return torch.stack(ys, dim=1)

    def _direction(self, xs, z, sfx):
        conv = getattr(self, f"conv1d{sfx}")
        xp = getattr(self, f"x_proj{sfx}")
        dtp = getattr(self, f"dt_proj{sfx}")
        A = -torch.exp(getattr(self, f"A{sfx}_log"))
        D = getattr(self, f"D{sfx}")
        L = xs.shape[1]
        u = F.silu(conv(xs.transpose(1, 2))[..., :L].transpose(1, 2))
        dbl = xp(u)
        dt_low = dbl[..., :self.dt_rank]
        B = dbl[..., self.dt_rank:self.dt_rank + self.d_state]
        C = dbl[..., self.dt_rank + self.d_state:]
        delta = F.softplus(dtp(dt_low))
        return self._scan(u, delta, A, B, C, D) * F.silu(z)

    def forward(self, x):
        xz = self.in_proj(x)
        xs, z = xz.chunk(2, dim=-1)
        y_f = self._direction(xs, z, "")
        y_b = self._direction(xs.flip(1), z.flip(1), "_b").flip(1)
        return self.out_proj((y_f + y_b) / 2)  # if_divide_out=True


class TVimBlock(tnn.Module):
    def __init__(self, d_model, d_state=8):
        super().__init__()
        self.norm = tnn.Parameter(torch.ones(d_model))
        self.mixer = TBiMamba(d_model, d_state=d_state)

    def forward(self, hidden, residual):
        residual = hidden if residual is None else residual + hidden
        return self.mixer(t_rmsnorm(residual, self.norm)), residual

    def state_dict(self, *a, **kw):  # hustvl naming: layers.{i}.norm.weight
        sd = {"norm.weight": self.norm.data}
        sd.update({f"mixer.{k}": v for k, v in self.mixer.state_dict().items()})
        return sd


class TVisionMamba(tnn.Module):
    """hustvl VisionMamba with the reference get_vim_encoder config."""

    def __init__(self, img_size=32, patch_size=8, d_model=32, depth=2, d_state=8,
                 in_chans=3):
        super().__init__()
        self.patch_size = patch_size
        self.proj = tnn.Conv2d(in_chans, d_model, patch_size, stride=patch_size)
        n_patch = (img_size // patch_size) ** 2
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, d_model))
        self.pos_embed = tnn.Parameter(torch.zeros(1, n_patch + 1, d_model))
        self.layers = tnn.ModuleList([TVimBlock(d_model, d_state) for _ in range(depth)])
        self.norm_f = tnn.Parameter(torch.ones(d_model))

    def forward(self, x):
        h = self.proj(x).flatten(2).transpose(1, 2)  # (b, P, c)
        b, n_patch, c = h.shape
        tp = n_patch // 2
        cls = self.cls_token.expand(b, -1, -1)
        h = torch.cat([h[:, :tp], cls, h[:, tp:]], dim=1)
        h = h + self.pos_embed
        hidden, residual = h, None
        for layer in self.layers:
            hidden, residual = layer(hidden, residual)
        hidden = t_rmsnorm(residual + hidden, self.norm_f)
        hidden = hidden[:, 1:]  # reference vim.py:192 drops token 0
        g = int(hidden.shape[1] ** 0.5)
        return hidden.unflatten(1, (g, g)).permute(0, 3, 1, 2)

    def hustvl_state_dict(self):
        sd = {
            "patch_embed.proj.weight": self.proj.weight.data,
            "patch_embed.proj.bias": self.proj.bias.data,
            "cls_token": self.cls_token.data,
            "pos_embed": self.pos_embed.data,
            "norm_f.weight": self.norm_f.data,
            # a classification head, dropped by the converter
            "head.weight": torch.zeros(10, self.norm_f.shape[0]),
            "head.bias": torch.zeros(10),
        }
        for i, layer in enumerate(self.layers):
            sd.update({f"layers.{i}.{k}": v for k, v in layer.state_dict().items()})
        return sd


class TestVimConversion:
    D_MODEL, D_STATE, DEPTH, IMG, PATCH = 32, 8, 2, 32, 8

    def _build(self):
        torch.manual_seed(0)
        m = TVisionMamba(img_size=self.IMG, patch_size=self.PATCH,
                         d_model=self.D_MODEL, depth=self.DEPTH, d_state=self.D_STATE)
        with torch.no_grad():
            for p in m.parameters():
                if p.dim() > 0 and p.data.abs().sum() == 0:
                    p.normal_(0.0, 0.05)
                else:
                    p.add_(torch.randn_like(p) * 0.05)
        return m

    def _jax_encoder(self, img_size=None):
        import jax.numpy as jnp

        from torch_em_tpu.models.vim import ViM

        return ViM(img_size=img_size or self.IMG, patch_size=self.PATCH,
                   embed_dim=self.D_MODEL, depth=self.DEPTH, state_dim=self.D_STATE,
                   feature_indexes=(0,), variant="hustvl", dtype=jnp.float32)

    def test_conversion_matches_torch(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models.vim import load_vim_weights

        tm = self._build()
        ckpt = tmp_path / "vim_tiny.pth"
        torch.save({"model": tm.hustvl_state_dict()}, ckpt)

        enc = self._jax_encoder()
        x = np.random.RandomState(1).rand(2, 3, self.IMG, self.IMG).astype("float32")
        variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = load_vim_weights(variables, str(ckpt))

        out_jax, feats = enc.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            out_torch = tm(torch.from_numpy(x))

        assert out_jax.shape == tuple(out_torch.shape)
        np.testing.assert_allclose(np.asarray(out_jax), out_torch.numpy(),
                                   atol=2e-4, rtol=2e-3)
        assert len(feats) == 1

    def test_pos_embed_interpolation(self, tmp_path):
        """A 32px checkpoint loads into a 64px encoder: the flat pos embed is
        resized around the middle cls slot (hustvl interpolate_pos_embed
        analog) and conversion stays strict-clean."""
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models.vim import load_vim_weights

        tm = self._build()
        ckpt = tmp_path / "vim_small_img.pth"
        torch.save({"model": tm.hustvl_state_dict()}, ckpt)

        enc = self._jax_encoder(img_size=64)
        x = np.zeros((1, 3, 64, 64), "float32")
        variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = load_vim_weights(variables, str(ckpt))  # strict: must not raise
        out, _ = enc.apply(variables, jnp.asarray(x))
        assert out.shape == (1, self.D_MODEL, 8, 8)

    def test_strict_rejects_unmatched(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models.vim import load_vim_weights

        tm = self._build()
        state = tm.hustvl_state_dict()
        state["layers.0.mixer.bogus"] = torch.zeros(3)
        ckpt = tmp_path / "vim_bad.pth"
        torch.save({"model": state}, ckpt)

        enc = self._jax_encoder()
        variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, self.IMG, self.IMG)))
        with pytest.raises(ValueError):
            load_vim_weights(variables, str(ckpt))
        load_vim_weights(variables, str(ckpt), strict=False)

    def test_vimunet_hustvl_variant_runs(self):
        from torch_em_tpu.models.vim import get_vimunet_model

        model = get_vimunet_model(out_channels=1, model_type="vim_t", img_size=64,
                                  initial_features=8, depth=2)
        x = np.random.RandomState(2).rand(1, 3, 64, 64).astype("float32")
        y = model(x)
        assert np.asarray(y).shape == (1, 1, 64, 64)
