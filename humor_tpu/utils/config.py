"""Config / flag system: argparse with `@file.cfg` fromfile presets.

Behavioral parity target: /root/reference/humor/utils/config.py
(SplitLineParser :7-9 — one "--flag value" token pair per line;
TrainConfig/TestConfig :114-167) and /root/reference/humor/fitting/
config.py (flat fitting parser with NSTAGES-length weight lists :53-74).

Design difference (TPU-first, simpler): configs are typed dataclasses
populated from argparse; the reference's dynamic `<Name>Config` class
loading becomes explicit dataclass fields. Preset `.cfg` files in
humor_tpu/configs/ use the same one-token-per-line syntax so reference
users can port their presets directly.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field, fields
from typing import Any, List, Optional, Sequence, Tuple, Type, TypeVar

T = TypeVar("T")

NSTAGES = 3


class SplitLineParser(argparse.ArgumentParser):
    """fromfile parser: each line of an @file holds whitespace-separated
    tokens (reference utils/config.py:7-9)."""

    def __init__(self, *a, **kw):
        kw.setdefault("fromfile_prefix_chars", "@")
        super().__init__(*a, **kw)

    def convert_arg_line_to_args(self, arg_line: str) -> List[str]:
        line = arg_line.strip()
        if not line or line.startswith("#"):
            return []
        return line.split()


def _add_dataclass_args(parser: argparse.ArgumentParser, cls: Type,
                        prefix: str = "") -> None:
    for f in fields(cls):
        name = f"--{prefix}{f.name.replace('_', '-')}"
        if f.type in ("bool", bool):
            default = (f.default if f.default is not dataclasses.MISSING
                       else False)
            group = parser.add_mutually_exclusive_group()
            group.add_argument(name, dest=f.name, action="store_true",
                               default=default)
            group.add_argument(
                f"--no-{prefix}{f.name.replace('_', '-')}",
                dest=f.name, action="store_false")
        elif (isinstance(f.default, (tuple, list))
              or "Tuple" in str(f.type) or "List" in str(f.type)):
            elem = float
            if f.default is not dataclasses.MISSING and len(f.default):
                elem = type(f.default[0])
            parser.add_argument(name, dest=f.name, nargs="+", type=elem,
                                default=(list(f.default)
                                         if f.default is not dataclasses.MISSING
                                         else None))
        else:
            typ = (type(f.default)
                   if f.default is not dataclasses.MISSING
                   and f.default is not None else str)
            parser.add_argument(name, dest=f.name, type=typ,
                                default=(f.default
                                         if f.default is not dataclasses.MISSING
                                         else None))


def parse_into(cls: Type[T], argv: Optional[Sequence[str]] = None,
               prog: Optional[str] = None) -> T:
    """Parse argv (supporting @file.cfg) into a dataclass instance."""
    parser = SplitLineParser(prog=prog, allow_abbrev=False)
    _add_dataclass_args(parser, cls)
    ns = parser.parse_args(argv)
    kwargs = {}
    for f in fields(cls):
        v = getattr(ns, f.name)
        if isinstance(f.default, tuple) and isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


# ---------------------------------------------------------------------------
# Top-level run configs (reference TrainConfig/TestConfig + fitting config)
# ---------------------------------------------------------------------------

@dataclass
class TrainCLIConfig:
    # data
    data_path: str = "./data/amass_processed"
    train_datasets: Tuple[str, ...] = ()
    val_datasets: Tuple[str, ...] = ()
    batch_size: int = 200
    sample_num_frames: int = 10
    data_noise_std: float = 0.0
    # stage the packed frame store in device HBM and build batches on
    # device from index-only transfers (data/device_store.py): 1 = on,
    # 0 = off (host gather + per-batch transfer), -1 = auto (on when
    # the staged columns fit HUMOR_DEVICE_DATA_BUDGET, default 8 GB)
    data_on_device: int = -1
    # model
    latent_size: int = 48
    in_rot_rep: str = "mat"
    out_rot_rep: str = "aa"
    model_data_config: str = "smpl+joints+contacts"
    conditional_prior: bool = True
    output_delta: bool = True
    # HuMoR-Qual: SMPL-forward joints fed back during scheduled sampling
    # (reference --model-use-smpl-joint-inputs, utils/config.py:201-202)
    model_use_smpl_joint_inputs: bool = False
    # past-window length (reference --model-steps-in,
    # humor_model.py:104-176; released configs all use 1)
    model_steps_in: int = 1
    # low-precision matmul policy for the HuMoR MLP stacks ("bfloat16"
    # halves MXU/HBM weight traffic on TPU; "" = full f32). Geometry,
    # LBS and losses always stay f32. TPU-only knob, no reference
    # equivalent.
    model_compute_dtype: str = ""
    # loss
    kl_loss: float = 0.0004
    kl_loss_anneal_start: int = 0
    kl_loss_anneal_end: int = 50
    contacts_loss: float = 0.01
    contacts_vel_loss: float = 0.01
    smpl_joint_loss: float = 1.0
    smpl_mesh_loss: float = 1.0
    smpl_joint_consistency_loss: float = 1.0
    # optimization
    out: str = "./out/humor_train"
    epochs: int = 200
    lr: float = 1e-4
    sched_milestones: Tuple[int, ...] = (50, 80, 140)
    sched_decays: Tuple[float, ...] = (0.5, 0.2, 0.4)
    sched_samp_start: int = 10
    sched_samp_end: int = 20
    val_every: int = 2
    save_every: int = 25
    print_every: int = 10
    # k > 1 scans k train steps per device dispatch (train.step
    # .make_multi_steps) — amortizes the ~32 ms fixed dispatch cost:
    # measured 67.9 -> 41.1 -> 36.4 ms/step at k=1/4/8 on the chip, flat
    # at k=16 (RESULTS.md "Training throughput"). 0 = auto (the measured
    # knee, k=8); set 1 for per-step logging granularity (NaN-skip is
    # on-device via optax.apply_if_finite either way).
    steps_per_dispatch: int = 0
    # host batches pre-gathered ahead of the device by a daemon thread
    # (trainer.TrainRunConfig.prefetch_depth); 0 disables the thread
    prefetch_depth: int = 2
    ckpt: str = ""
    no_load_optim: bool = False
    steps_per_epoch: int = 200
    seed: int = 0
    # body model
    smplh_root: str = "./body_models/smplh"
    use_smpl_losses: bool = True


@dataclass
class TestCLIConfig:
    data_path: str = "./data/amass_processed"
    test_datasets: Tuple[str, ...] = ()
    batch_size: int = 32
    ckpt: str = ""
    out: str = "./out/humor_test"
    eval_test: bool = False
    # evaluate on the train/val split instead of test (reference
    # --test-on-train/--test-on-val, utils/config.py:146-148); with an
    # empty --test-datasets the split resolves to the HuMoR paper
    # dataset constants (data/amass.py)
    test_on_train: bool = False
    test_on_val: bool = False
    eval_sampling: bool = False
    qual: bool = False  # HuMoR-Qual: SMPL-joint feedback during rollout
    viz: bool = False   # render skeleton gifs of sampling/recon outputs
    eval_recon: bool = False
    eval_sampling_len: float = 10.0  # seconds
    eval_num_samples: int = 1
    seed: int = 0
    smplh_root: str = "./body_models/smplh"


@dataclass
class FitCLIConfig:
    # data
    data_path: str = ""
    data_type: str = "AMASS"  # AMASS | PROX-RGB | PROX-RGBD | iMapper-RGB | RGB
    batch_size: int = 1
    seq_len: int = 60
    overlap_len: int = 10
    # RGB pipeline extras (reference fitting/config.py:51,56-57)
    rgb_intrinsics: str = ""   # json [[fx,0,cx],[0,fy,cy],[0,0,1]]
    rgb_no_split: bool = False  # whole clip as ONE window (reference
    #                             fit_rgb_demo_no_split.cfg semantics)
    mask_joints2d: bool = False
    mask_path: str = ""        # person-mask pngs for joint occlusion
    # PROX pseudo-GT SMPL fits (PROXD qualitative / MoSh quantitative;
    # reference prox_dataset.py:111-147 return_fitting): loaded per frame
    # and saved beside results as gt_results.npz for `--mode prox` eval
    prox_load_fitting: bool = False
    prox_fitting_root: str = ""  # override the fittings/{mosh,proxd} walk
    # observation modalities
    amass_use_joints: bool = True
    amass_use_verts: bool = False
    amass_use_points: bool = False
    amass_noise_std: float = 0.0
    amass_make_partial: bool = False
    amass_partial_height: float = 0.9
    # models
    humor_ckpt: str = ""
    vposer_ckpt: str = ""
    init_motion_prior_ckpt: str = ""
    smplh_root: str = "./body_models/smplh"
    gt_body_type: str = "smplh"
    # "bfloat16" runs the HuMoR MLP matmuls (stage-3 rollout hot path)
    # in bf16 on the MXU; "" = full f32 (see TrainCLIConfig)
    model_compute_dtype: str = ""
    # optimization
    lr: float = 1.0
    num_iters: Tuple[int, ...] = (30, 80, 70)
    # multiplies every stage's iteration budget. Our num_iters count TRUE
    # L-BFGS iterations; the reference's count outer torch-LBFGS steps of
    # up to 20 inner iterations each, so --num-iters-scale 20 reproduces
    # the reference's full effective optimization effort. Default 4 = the
    # measured accuracy knee: synthetic-GT recovery saturates there and
    # more effort buys nothing (RESULTS.md "accuracy-vs-effort knee";
    # --num-iters-scale 1 for quick low-fidelity fits)
    num_iters_scale: int = 4
    lbfgs_max_iter: int = 20   # zoom probe budget (zoom search only)
    # "auto" (parallel at small window batches, armijo at B >= 12 —
    # measured crossover, RESULTS.md "line-search choice by batch"),
    # "parallel" (speculative vectorized strong-Wolfe, one vmapped eval
    # per iteration), "armijo" (value-only speculative grid), "zoom"
    # (sequential, reference torch semantics), or "hybrid" (parallel
    # bulk + a zoom polish tail per stage)
    lbfgs_linesearch: str = "auto"
    # hybrid only: fraction of each stage's iterations run as the zoom
    # polish tail (zoom is ~6-8x/iter; 0.08 keeps ~1.5x total)
    lbfgs_polish_frac: float = 0.08
    # parallel/armijo grid size; 0 = auto-scale by window batch
    # (K = clamp(128 // B, 4, 16) — see fitting/optimizer.resolve_candidates)
    lbfgs_candidates: int = 8
    # convergence early exit (torch LBFGS tolerance semantics). 0 = off
    # (full fixed budget — the accuracy-first default); the torch values
    # 1e-7/1e-9 cut the knee-budget fit ~3x at a measured ~16% median
    # MPJPE cost on hard synthetic seeds (RESULTS.md "convergence early
    # exit") — the right trade for interactive/preview fits, not for
    # benchmark-accuracy ones
    lbfgs_tol_grad: float = 0.0
    lbfgs_tol_change: float = 0.0
    lbfgs_stall_patience: int = 3
    stage3_tune_init_num_frames: int = 15
    stage3_freeze_start: int = 30
    stage3_freeze_end: int = 55
    stage3_no_tune_init_state: bool = False
    stage3_contact_refine_only: bool = False
    # weights: one value per stage (reference fitting/config.py:60-74)
    joint3d_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    joint3d_rollout_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    vert3d_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    point3d_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    joint2d_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    pose_prior_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    shape_prior_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    motion_prior_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    init_motion_prior_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    joint_consistency_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    bone_length_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    joint3d_smooth_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    contact_vel_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    contact_height_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    floor_reg_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    rgb_overlap_consist_weight: Tuple[float, ...] = (0.0, 0.0, 0.0)
    # robustness
    robust_loss: str = "none"
    robust_tuning_const: float = 4.6851
    joint2d_sigma: float = 100.0
    # output
    out: str = "./out/humor_fit"
    save_results: bool = True
    save_stages_results: bool = False
    seed: int = 0

    def stage_weights(self):
        """-> 3 StageWeights from the per-stage weight lists."""
        from humor_tpu.fitting.energies import StageWeights

        def w(name, i):
            vals = getattr(self, name)
            return float(vals[i]) if i < len(vals) else 0.0

        mapping = {
            "joints3d": "joint3d_weight",
            "joints3d_rollout": "joint3d_rollout_weight",
            "verts3d": "vert3d_weight",
            "points3d": "point3d_weight",
            "joints2d": "joint2d_weight",
            "pose_prior": "pose_prior_weight",
            "shape_prior": "shape_prior_weight",
            "motion_prior": "motion_prior_weight",
            "init_motion_prior": "init_motion_prior_weight",
            "joint_consistency": "joint_consistency_weight",
            "bone_length": "bone_length_weight",
            "joints3d_smooth": "joint3d_smooth_weight",
            "contact_vel": "contact_vel_weight",
            "contact_height": "contact_height_weight",
            "floor_reg": "floor_reg_weight",
            "rgb_overlap_consist": "rgb_overlap_consist_weight",
        }
        return tuple(
            StageWeights(**{k: w(v, i) for k, v in mapping.items()})
            for i in range(NSTAGES))


@dataclass
class VizCLIConfig:
    """Flags for the fit-result visualization CLI
    (`python -m humor_tpu.viz.fitting`), mirroring the reference's
    viz_fitting_rgb.py parser (:49-87)."""

    # fitting output dir (the fit CLI's --out): holds final_results/ and
    # per-window <seq>/ result dirs
    results: str = ""
    out: str = "./out/humor_viz"
    # dir of the source video frames (sorted); blank canvas when absent
    frames: str = ""
    intrinsics: str = ""       # json [[fx,0,cx],[0,fy,cy],[0,0,1]]
    smplh_root: str = "./body_models/smplh"
    viz_final_only: bool = False   # skip the per-window sub-sequences
    viz_prior_frame: bool = False  # also render *_results_prior.npz
    viz_obs_2d: bool = False       # overlay observed OpenPose keypoints
    viz_no_mesh: bool = False      # skeleton overlays only
    max_frames: int = 120
    render_width: int = 1920
    render_height: int = 1080
