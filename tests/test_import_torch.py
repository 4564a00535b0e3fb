"""Checkpoint import: build a reference-architecture torch HuMoR model,
export its state dict, import into our pytree, and check activation
parity of prior / posterior / decoder MLPs.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from humor_tpu.models import humor as H
from humor_tpu.ops.mlp import mlp_apply
from humor_tpu.utils.import_torch import (humor_params_from_state_dict,
                                          strip_prefix)


class RefMLP(nn.Module):
    """Same structure as reference humor_model.py:1206-1241."""

    def __init__(self, layers, skip_input_idx=None):
        super().__init__()
        in_size = layers[0]
        out_channels = layers[1:]
        mods = [nn.Linear(in_size, out_channels[0])]
        skip_size = 0 if skip_input_idx is None else in_size - skip_input_idx
        for i in range(1, len(out_channels)):
            mods.append(nn.GroupNorm(16, out_channels[i - 1]))
            mods.append(nn.ReLU())
            mods.append(nn.Linear(out_channels[i - 1] + skip_size,
                                  out_channels[i]))
        self.net = nn.ModuleList(mods)
        self.skip_input_idx = skip_input_idx

    def forward(self, x):
        skip_in = None
        if self.skip_input_idx is not None:
            skip_in = x[:, self.skip_input_idx:]
        for i, layer in enumerate(self.net):
            if (self.skip_input_idx is not None and i > 0
                    and isinstance(layer, nn.Linear)):
                x = torch.cat([x, skip_in], dim=1)
            x = layer(x)
        return x


@pytest.fixture(scope="module")
def torch_model_and_params():
    torch.manual_seed(0)
    cfg = H.HumorConfig()
    D, L = cfg.past_data_dim, cfg.latent_size
    model = nn.Module()
    model.encoder = RefMLP([D + cfg.input_data_dim, 1024, 1024, 1024, 1024,
                            L * 2])
    model.prior_net = RefMLP([D, 1024, 1024, 1024, 1024, L * 2])
    model.decoder = RefMLP([D + L, 1024, 1024, 512, cfg.output_data_dim],
                           skip_input_idx=D)
    # randomize GN affine so parity is meaningful
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.GroupNorm):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return cfg, model, humor_params_from_state_dict(sd)


def test_prior_parity(torch_model_and_params):
    cfg, model, params = torch_model_and_params
    x = torch.randn(5, cfg.past_data_dim)
    with torch.no_grad():
        ref = model.prior_net(x).numpy()
    got = np.asarray(mlp_apply(params["prior"], jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_encoder_parity(torch_model_and_params):
    cfg, model, params = torch_model_and_params
    x = torch.randn(5, cfg.past_data_dim + cfg.input_data_dim)
    with torch.no_grad():
        ref = model.encoder(x).numpy()
    got = np.asarray(mlp_apply(params["encoder"], jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_decoder_skip_parity(torch_model_and_params):
    cfg, model, params = torch_model_and_params
    x = torch.randn(5, cfg.past_data_dim + cfg.latent_size)
    with torch.no_grad():
        ref = model.decoder(x).numpy()
    got = np.asarray(mlp_apply(params["decoder"], jnp.asarray(x.numpy()),
                               skip_dim=cfg.latent_size))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_full_model_usable(torch_model_and_params):
    cfg, _, params = torch_model_and_params
    key = jax.random.PRNGKey(0)
    past = jax.random.normal(key, (3, cfg.past_data_dim))
    t_in = jax.random.normal(key, (3, cfg.input_data_dim))
    out = H.single_step(cfg, params, key, past, t_in)
    assert out.z.shape == (3, cfg.latent_size)
    for v in jax.tree_util.tree_leaves(out.pred):
        assert np.all(np.isfinite(np.asarray(v)))


def test_strip_prefix():
    sd = {"module.encoder.net.0.weight": 1, "encoder.net.0.bias": 2}
    out = strip_prefix(sd)
    assert set(out) == {"encoder.net.0.weight", "encoder.net.0.bias"}


def test_pth_file_round_trip(tmp_path, torch_model_and_params):
    """Reference .pth training-checkpoint format -> load_humor_checkpoint."""
    from humor_tpu.utils.import_torch import load_humor_checkpoint

    cfg, model, params = torch_model_and_params
    path = str(tmp_path / "best_model.pth")
    # reference save format (utils/torch.py:29-50): dict with
    # model_state_dict + optimizer state + bookkeeping
    torch.save({
        "model_state_dict": model.state_dict(),
        "optim_state_dict": {},
        "epoch": 17,
        "min_train_loss": 0.5,
        "min_val_loss": 0.6,
    }, path)
    loaded = load_humor_checkpoint(path)
    for net in ("encoder", "decoder", "prior"):
        assert len(loaded[net]) == len(params[net])
        for la, lb in zip(loaded[net], params[net]):
            np.testing.assert_array_equal(np.asarray(la["w"]),
                                          np.asarray(lb["w"]))
