"""Checkpoint save/load: params + optimizer state + epoch bookkeeping.

Behavioral parity target: /root/reference/humor/utils/torch.py:29-82
(save_state/load_state with min-loss tracking, ignore_keys for frozen body
models, non-strict load). Here checkpoints are msgpack-serialized pytrees
(flax.serialization) — host-portable, no pickle of code objects.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_state(path: str, params: Any, opt_state: Any = None,
               epoch: int = 0, min_train_loss: float = float("inf"),
               min_val_loss: float = float("inf"),
               extra: Optional[Dict[str, Any]] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    params = jax.device_get(params)
    payload = {
        "params": serialization.to_bytes(params),
        "epoch": int(epoch),
        "min_train_loss": float(min_train_loss),
        "min_val_loss": float(min_val_loss),
    }
    if opt_state is not None:
        payload["opt_state"] = serialization.to_bytes(jax.device_get(opt_state))
    if extra:
        payload["extra"] = serialization.to_bytes(extra)
    np.savez(path, **payload)


def load_state(path: str, params_template: Any,
               opt_state_template: Any = None,
               extra_template: Any = None) -> Dict[str, Any]:
    """Restore into the given pytree templates. Returns dict with params,
    opt_state (or None), epoch, min losses."""
    raw = np.load(path, allow_pickle=False)
    out: Dict[str, Any] = {
        "params": serialization.from_bytes(params_template,
                                           raw["params"].tobytes()),
        "epoch": int(raw["epoch"]),
        "min_train_loss": float(raw["min_train_loss"]),
        "min_val_loss": float(raw["min_val_loss"]),
        "opt_state": None,
    }
    if "opt_state" in raw and opt_state_template is not None:
        out["opt_state"] = serialization.from_bytes(
            opt_state_template, raw["opt_state"].tobytes())
    if "extra" in raw and extra_template is not None:
        out["extra"] = serialization.from_bytes(extra_template,
                                                raw["extra"].tobytes())
    return out
