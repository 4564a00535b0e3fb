"""Initial-state GMM prior training CLI:
`python -m humor_tpu.train.gmm_cli --data-path ... --out ...`.

Behavioral parity target: /root/reference/humor/train/train_state_prior.py
(138-d initial states :79-93, GaussianMixture(12, full) :99-113, npz
persistence :123, test-set mean log-prob eval :207-263).

TPU-first: EM runs as one jitted scan on device (humor_tpu.models.gmm)
instead of sklearn on host; the npz schema is identical so checkpoints
interchange with the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np


@dataclass
class GmmCLIConfig:
    data_path: str = "./data/amass_processed"
    out: str = "./out/init_state_prior_gmm.npz"
    n_components: int = 12
    n_iters: int = 100
    max_states: int = 200000
    seed: int = 0


def collect_initial_states(dataset, max_states: int, seed: int = 0
                           ) -> np.ndarray:
    """All (subsampled) frames' 138-d [joints, joints_vel, trans_vel,
    root_orient_vel] vectors in each frame's canonical heading frame."""
    import jax
    import jax.numpy as jnp

    from humor_tpu.data.windows import window_to_pairs
    from humor_tpu.models.gmm import pack_initial_state

    states = []
    total = 0
    for i in range(dataset.num_seqs):
        world_np = dataset.sequence(i)
        world = {k: jnp.asarray(v[None]) for k, v in world_np.items()}
        # canonicalize every frame into its own heading frame: data_in of
        # the window-pairs view IS exactly that
        data_in, _, _ = window_to_pairs(world)
        s = np.asarray(pack_initial_state(
            {k: np.asarray(v[0]) for k, v in data_in.items()}))
        states.append(s)
        total += s.shape[0]
        if total >= max_states:
            break
    all_states = np.concatenate(states)[:max_states]
    rng = np.random.RandomState(seed)
    rng.shuffle(all_states)
    return all_states.astype(np.float32)


def main(argv=None) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp

    from humor_tpu.models import gmm as G
    from humor_tpu.train.cli import build_dataset
    from humor_tpu.utils.config import parse_into

    cfg = parse_into(GmmCLIConfig, argv, prog="humor-train-gmm")
    dataset = build_dataset(cfg, None)
    states = collect_initial_states(dataset, cfg.max_states, cfg.seed)
    print(f"[gmm] fitting {cfg.n_components} components on "
          f"{states.shape[0]} x {states.shape[1]} states")
    gmm = G.fit(jax.random.PRNGKey(cfg.seed), jnp.asarray(states),
                n_components=cfg.n_components, n_iters=cfg.n_iters)
    G.save_npz(cfg.out, gmm)
    lp = float(np.mean(np.asarray(G.log_prob(gmm, jnp.asarray(states)))))
    print(f"[gmm] saved {cfg.out}; mean train log-prob {lp:.3f}")
    return {"mean_log_prob": lp}


if __name__ == "__main__":
    from humor_tpu.utils.platform import setup_platform

    setup_platform()
    main()
