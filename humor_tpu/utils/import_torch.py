"""Import released reference checkpoints (torch .pth) into this
framework's parameter pytrees.

The reference HuMoR checkpoint stores `model_state_dict` with sub-network
keys `encoder.net.{i}`, `prior_net.net.{i}`, `decoder.net.{i}` where the
ModuleList interleaves [Linear, GroupNorm, ReLU, Linear, ...]
(/root/reference/humor/models/humor_model.py:1206-1241; save format
/root/reference/humor/utils/torch.py:29-50 incl. the DataParallel
'module.' prefix strip :52-57 and frozen-body-model ignore keys).

Our MLP layer j maps to: Linear -> net.{3j}; the GroupNorm that
normalizes layer j's input -> net.{3j-2}. Linear weights transpose from
torch (out, in) to (in, out).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np


def _arr(v) -> jnp.ndarray:
    return jnp.asarray(np.asarray(v), jnp.float32)


def strip_prefix(sd: Dict, prefix: str = "module.") -> Dict:
    """Drop a DataParallel-style prefix (reference torch.py:52-57)."""
    return {(k[len(prefix):] if k.startswith(prefix) else k): v
            for k, v in sd.items()}


def _import_mlp(sd: Dict, base: str) -> List[dict]:
    """Collect one reference MLP's layers from the state dict."""
    # find all Linear indices: net.{i}.weight with 2-d weight
    lin_idx = sorted(
        int(k.split(".")[-2]) for k, v in sd.items()
        if k.startswith(f"{base}.net.") and k.endswith(".weight")
        and np.asarray(v).ndim == 2)
    layers: List[dict] = []
    for j, i in enumerate(lin_idx):
        layer = {
            "w": _arr(sd[f"{base}.net.{i}.weight"]).T,
            "b": _arr(sd[f"{base}.net.{i}.bias"]),
        }
        if j > 0:
            gn = i - 2
            layer["gn_scale"] = _arr(sd[f"{base}.net.{gn}.weight"])
            layer["gn_bias"] = _arr(sd[f"{base}.net.{gn}.bias"])
        layers.append(layer)
    return layers


def humor_params_from_state_dict(sd: Dict) -> Dict:
    """Reference HumorModel state dict -> our params pytree
    {'encoder', 'decoder'[, 'prior']}. Frozen body-model buffers in the
    checkpoint are ignored."""
    sd = strip_prefix(dict(sd))
    params = {
        "encoder": _import_mlp(sd, "encoder"),
        "decoder": _import_mlp(sd, "decoder"),
    }
    if any(k.startswith("prior_net.") for k in sd):
        params["prior"] = _import_mlp(sd, "prior_net")
    return params


def load_humor_checkpoint(path: str) -> Dict:
    """Load a reference .pth training checkpoint (needs torch, CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in sd.items()}
    return humor_params_from_state_dict(sd)


def load_gmm_checkpoint(path: str):
    """Reference init-state GMM npz -> GmmParams
    (schema train_state_prior.py:123)."""
    from humor_tpu.models.gmm import load_npz

    return load_npz(path)


def load_vposer_checkpoint(path: str) -> Dict:
    """Released VPoser v1.0 snapshot .pt -> our vposer params."""
    import torch

    from humor_tpu.models.vposer import from_torch_state_dict

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(sd, dict) or "bodyprior_enc_fc1.weight" not in sd:
        sd = sd.get("state_dict", sd)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return from_torch_state_dict(sd)
