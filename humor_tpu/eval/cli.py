"""Model evaluation CLI: `python -m humor_tpu.eval.cli @configs/
test_humor_sampling.cfg`.

Behavioral parity target: /root/reference/humor/test/test_humor.py
(--eval-test :119-150, --eval-sampling :170-239, --eval-recon :241-338).
Rendering stays host-side and optional (humor_tpu.viz); this CLI writes
npz motion outputs which the viz tools consume.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def main(argv=None) -> Dict:
    import jax
    import jax.numpy as jnp

    from humor_tpu.data.windows import window_to_pairs
    from humor_tpu.eval import humor_eval as HE
    from humor_tpu.losses.elbo import LossConfig
    from humor_tpu.models import humor as H
    from humor_tpu.train.cli import build_dataset, load_body_models
    from humor_tpu.utils.checkpoint import load_state
    from humor_tpu.utils.config import TestCLIConfig, parse_into
    from humor_tpu.utils.import_torch import load_humor_checkpoint

    cfg = parse_into(TestCLIConfig, argv, prog="humor-test")
    os.makedirs(cfg.out, exist_ok=True)

    model_cfg = H.HumorConfig()
    if cfg.ckpt and os.path.exists(cfg.ckpt):
        if cfg.ckpt.endswith((".pth", ".pt")):
            params = load_humor_checkpoint(cfg.ckpt)
        else:
            params = load_state(cfg.ckpt)["params"]
    else:
        print("[test] no checkpoint; using random init")
        params = H.init_params(model_cfg, jax.random.PRNGKey(0))

    from humor_tpu.data import amass as A

    # split selection (reference --test-on-train/--test-on-val,
    # test_humor.py via utils/config.py:146-148): explicit
    # --test-datasets wins; otherwise the HuMoR paper split constants
    split_names = A.TEST_DATASETS
    if cfg.test_on_train:
        split_names = A.TRAIN_DATASETS
    elif cfg.test_on_val:
        split_names = A.VAL_DATASETS
    dataset = build_dataset(cfg, cfg.test_datasets,
                            default_names=split_names)
    key = jax.random.PRNGKey(cfg.seed)
    results: Dict = {}

    keep = ("trans", "trans_vel", "root_orient", "root_orient_vel",
            "pose_body", "joints", "joints_vel", "contacts")

    if cfg.eval_test:
        to_pairs = jax.jit(window_to_pairs)

        def batches():
            for i in range(8):
                world_np, meta = dataset.sample_windows(
                    cfg.seed + i, cfg.batch_size, 11)
                world = {k: jnp.asarray(world_np[k]) for k in keep}
                data_in, data_out, _ = to_pairs(world)
                yield {"data_in": data_in, "data_out": data_out,
                       "betas": jnp.asarray(meta["betas"]),
                       "gender_ids": jnp.asarray(meta["gender_ids"] % 2)}

        stats = HE.eval_test(model_cfg, LossConfig(), params, batches(),
                             key, load_body_models(cfg.smplh_root))
        results["test"] = stats
        print("[test] mean losses:")
        for k, v in sorted(stats.items()):
            print(f"  {k}: {v:.5f}")

    if cfg.eval_sampling:
        steps = int(cfg.eval_sampling_len * 30)
        world_np, meta = dataset.sample_windows(cfg.seed, cfg.batch_size, 2)
        init_state = {k: jnp.asarray(world_np[k][:, 0]) for k in keep
                      if k in model_cfg.input_spec.names}
        joint_fn = None
        if cfg.qual:
            from humor_tpu.body_model.gendered import make_rollout_joint_fn

            joint_fn = make_rollout_joint_fn(
                load_body_models(cfg.smplh_root),
                jnp.asarray(meta["gender_ids"] % 2),
                jnp.asarray(meta["betas"]))
        for s in range(cfg.eval_num_samples):
            out = HE.sample_motion(model_cfg, params,
                                   jax.random.fold_in(key, s), init_state,
                                   steps, smpl_joint_fn=joint_fn)
            path = os.path.join(cfg.out, f"sample_{s:02d}.npz")
            np.savez(path, **{k: np.asarray(v) for k, v in out.items()})
            print(f"[test] wrote {path} ({steps} frames)")
            if cfg.viz:
                from humor_tpu.viz.utils import viz_smpl_seq

                joints = np.asarray(out["joints"]).reshape(
                    -1, steps, 22, 3)[0]
                res = viz_smpl_seq(joints,
                                   os.path.join(cfg.out,
                                                f"sample_{s:02d}_viz"))
                print(f"[test] rendered {res.get('video')}")
        results["sampling"] = {"steps": steps,
                               "samples": cfg.eval_num_samples}

    if cfg.eval_recon:
        world_np, meta = dataset.sample_windows(cfg.seed, cfg.batch_size,
                                                60)
        seq = {k: jnp.asarray(world_np[k]) for k in keep}
        err0 = HE.recon_error(model_cfg, params, seq, translate=0.0)
        err5 = HE.recon_error(model_cfg, params, seq, translate=5.0)
        results["recon"] = {"base": err0, "translated_5m": err5}
        print(f"[test] recon errors: {err0}")
        print(f"[test] +5m probe:    {err5}")
        recon = HE.reconstruct(model_cfg, params, seq)
        path = os.path.join(cfg.out, "recon.npz")
        np.savez(path, **{k: np.asarray(v) for k, v in recon.items()})
        print(f"[test] wrote {path}")

    return results


if __name__ == "__main__":
    from humor_tpu.utils.platform import setup_platform

    setup_platform()
    main()
