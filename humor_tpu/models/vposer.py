"""VPoser body-pose prior (VAE over SMPL body poses) in JAX.

The TTO pipeline optimizes body pose in VPoser's 32-d latent space:
`latent2pose` decodes latents to per-joint rotations and `pose2latent`
encodes poses to posterior means (reference
/root/reference/humor/fitting/motion_optimizer.py:1041-1063; the model is
loaded from the released VPoser v1.0 snapshot at fitting_utils.py:688-733).

This module re-expresses the public VPoser v1.0 architecture
(num_neurons=512, latentD=32, 21 body joints, eval-mode inference):

    encode(aa 63)  : BN -> Linear(63,512) -> LeakyReLU(.2) -> BN ->
                     Linear(512,512) -> LeakyReLU(.2) -> {mu, softplus(sigma)}
    decode(z 32)   : Linear(32,512) -> LeakyReLU(.2) ->
                     Linear(512,512) -> LeakyReLU(.2) ->
                     Linear(512,21*6) -> 6d-to-rotmat per joint

as pure functions over a params pytree, plus a torch-state-dict importer
so released VPoser checkpoints can be used directly. Dropout layers are
inference no-ops (the framework never trains VPoser).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from humor_tpu.ops import transforms

_BN_EPS = 1e-5
_LEAK = 0.2


@dataclass(frozen=True)
class VPoserConfig:
    latent_dim: int = 32
    hidden: int = 512
    num_joints: int = 21

    @property
    def pose_dim(self) -> int:
        return self.num_joints * 3


def init_params(cfg: VPoserConfig, key: jax.Array) -> Dict:
    """Random init (for tests / training from scratch)."""
    ks = jax.random.split(key, 6)

    def lin(k, n_in, n_out):
        kw, kb = jax.random.split(k)
        w = jax.random.normal(kw, (n_in, n_out)) * jnp.sqrt(2.0 / n_in)
        # nonzero biases (torch Linear default): with zero biases the
        # decoder maps z=0 to an exactly-zero 6d rotation — a degenerate
        # Gram-Schmidt input with pathological gradients
        bound = 1.0 / jnp.sqrt(n_in)
        b = jax.random.uniform(kb, (n_out,), minval=-bound, maxval=bound)
        return {"w": w, "b": b}

    def bn(n):
        return {"scale": jnp.ones((n,)), "bias": jnp.zeros((n,)),
                "mean": jnp.zeros((n,)), "var": jnp.ones((n,))}

    h, l, p = cfg.hidden, cfg.latent_dim, cfg.pose_dim
    return {
        "enc_bn1": bn(p),
        "enc_fc1": lin(ks[0], p, h),
        "enc_bn2": bn(h),
        "enc_fc2": lin(ks[1], h, h),
        "enc_mu": lin(ks[2], h, l),
        "enc_logvar": lin(ks[3], h, l),
        "dec_fc1": lin(ks[4], l, h),
        "dec_fc2": lin(ks[5], h, h),
        "dec_out": lin(jax.random.fold_in(ks[5], 1), h,
                       cfg.num_joints * 6),
    }


def _linear(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def _batchnorm(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    inv = jax.lax.rsqrt(p["var"] + _BN_EPS)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _leaky(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=_LEAK)


def encode(cfg: VPoserConfig, params: Dict, pose_aa: jnp.ndarray
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Body pose aa (..., 63) -> posterior (mean, std) each (..., latent)."""
    x = _batchnorm(params["enc_bn1"], pose_aa)
    x = _leaky(_linear(params["enc_fc1"], x))
    x = _batchnorm(params["enc_bn2"], x)
    x = _leaky(_linear(params["enc_fc2"], x))
    mu = _linear(params["enc_mu"], x)
    std = jax.nn.softplus(_linear(params["enc_logvar"], x))
    return mu, std


def decode_matrot(cfg: VPoserConfig, params: Dict, z: jnp.ndarray
                  ) -> jnp.ndarray:
    """Latent (..., latent) -> per-joint rotation matrices (..., J*9)."""
    x = _leaky(_linear(params["dec_fc1"], z))
    x = _leaky(_linear(params["dec_fc2"], x))
    x6 = _linear(params["dec_out"], x)  # (..., J*6)
    batch_shape = x6.shape[:-1]
    R = transforms.rot6d_to_rotmat(x6.reshape(*batch_shape, cfg.num_joints, 6))
    return R.reshape(*batch_shape, cfg.num_joints * 9)


def latent2pose(cfg: VPoserConfig, params: Dict, z: jnp.ndarray
                ) -> jnp.ndarray:
    """Latent (..., latent) -> aa body pose (..., J*3)
    (reference motion_optimizer.py:1041-1051)."""
    mats = decode_matrot(cfg, params, z)
    batch_shape = mats.shape[:-1]
    R = mats.reshape(*batch_shape, cfg.num_joints, 3, 3)
    return transforms.rotmat_to_aa(R).reshape(*batch_shape, cfg.pose_dim)


def pose2latent(cfg: VPoserConfig, params: Dict, pose_aa: jnp.ndarray
                ) -> jnp.ndarray:
    """aa body pose (..., J*3) -> posterior mean latent (..., latent)
    (reference motion_optimizer.py:1053-1063)."""
    mu, _ = encode(cfg, params, pose_aa)
    return mu


def sample_poses(cfg: VPoserConfig, params: Dict, key: jax.Array,
                 num: int) -> jnp.ndarray:
    """Draw aa body poses from the standard-normal latent prior."""
    z = jax.random.normal(key, (num, cfg.latent_dim))
    return latent2pose(cfg, params, z)


# ---------------------------------------------------------------------------
# torch checkpoint import
# ---------------------------------------------------------------------------

_TORCH_MAP = {
    "enc_bn1": "bodyprior_enc_bn1",
    "enc_fc1": "bodyprior_enc_fc1",
    "enc_bn2": "bodyprior_enc_bn2",
    "enc_fc2": "bodyprior_enc_fc2",
    "enc_mu": "bodyprior_enc_mu",
    "enc_logvar": "bodyprior_enc_logvar",
    "dec_fc1": "bodyprior_dec_fc1",
    "dec_fc2": "bodyprior_dec_fc2",
    "dec_out": "bodyprior_dec_out",
}


def from_torch_state_dict(sd: Dict[str, "np.ndarray"]) -> Dict:
    """Map a released VPoser v1.0 torch state dict (tensor or ndarray
    values) onto this module's params pytree. Linear weights transpose to
    (in, out); BatchNorm running stats come along."""
    def arr(v):
        return jnp.asarray(np.asarray(v), jnp.float32)

    params: Dict = {}
    for ours, theirs in _TORCH_MAP.items():
        if ours.endswith("bn1") or ours.endswith("bn2"):
            params[ours] = {
                "scale": arr(sd[f"{theirs}.weight"]),
                "bias": arr(sd[f"{theirs}.bias"]),
                "mean": arr(sd[f"{theirs}.running_mean"]),
                "var": arr(sd[f"{theirs}.running_var"]),
            }
        else:
            params[ours] = {
                "w": arr(sd[f"{theirs}.weight"]).T,
                "b": arr(sd[f"{theirs}.bias"]),
            }
    return params
