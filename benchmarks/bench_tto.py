"""Flagship benchmark: 3-stage TTO wall-clock per 60-frame sub-sequence
batch (the driver-defined baseline, BASELINE.md).

Ours: the jitted stage programs from humor_tpu.fitting.optimizer at the
reference's workload (batch 2 x 60 frames @30fps, iters 30/70/70, L-BFGS
strong Wolfe) on whatever backend jax selects (real TPU under the driver).

Baseline: a faithful torch-CPU re-creation of the reference's hot loop —
per-iteration L-BFGS closures that run VPoser-decode + SMPL LBS for
stages 1/2 and the T-step Python rollout through the HuMoR MLPs + SMPL
for stage 3 (motion_optimizer.py:202-610 structure). We run torch's own
LBFGS(strong_wolfe) for a few iterations per stage and extrapolate its
measured per-iteration cost to the full 30/70/70 budget.

Usage: python benchmarks/bench_tto.py [--quick]
Prints one JSON line: tto_60frame_batch2_wallclock (seconds) +
vs_baseline speedup.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B, T = 2, 60
NUM_ITERS = (30, 70, 70)
# Headline iteration budget = KNEE_SCALE x the reference's outer counts.
# benchmarks/bench_knee.py (trained fixture, T=60, chip, round 3):
# stage-3 MPJPE saturates 0.400 -> 0.161 -> 0.116 -> 0.108 -> 0.108 m
# across scales 1/2/4/8/16 on the attribution seed, and cross-seed
# medians peak AT scale 4 — so scale 4 is where added effort stops
# buying accuracy (within 7% of the scale-8 plateau at half the time).
# Our num_iters count TRUE L-BFGS iterations while the reference's count
# outer torch-LBFGS steps of up to 20 inner iterations each, so this is
# ~1/5 of the reference's worst-case effective budget — but past OUR
# measured accuracy knee, which is the defensible stopping point
# (RESULTS.md "accuracy-vs-effort knee").
KNEE_SCALE = 4
V_VERTS, V_JOINTS = 6890, 52  # real SMPL+H scale


def bench_ours(quick=False, batch=B, scale=KNEE_SCALE, modality="joints3d"):
    """Wall-clock of the full 3-stage fit. modality:
      'joints3d' — noisy 3D joints (fit_amass_joints.cfg workload);
      'rgb' — 2D OpenPose keypoints + floor-plane optimization +
        cam2prior + overlap consistency (the i3DB/PROX RGB-video
        workload BASELINE.md names as the driver metric);
      'keypts' — noisy, partially occluded 43-keypoint mesh vertices
        (the fit_amass_keypts.cfg workload, BASELINE.md config #4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from humor_tpu.body_model import constants as C
    from humor_tpu.body_model.smpl import synthetic_smpl_model
    from humor_tpu.fitting import energies as E
    from humor_tpu.fitting import geometry as geo
    from humor_tpu.fitting import optimizer as O
    from humor_tpu.models import gmm as gmm_lib
    from humor_tpu.models import humor as H
    from humor_tpu.models import vposer as vp

    body = synthetic_smpl_model(num_verts=V_VERTS, num_joints=22)
    vcfg = vp.VPoserConfig()
    # HUMOR_COMPUTE_DTYPE=bfloat16 runs the HuMoR MLP matmuls (the
    # stage-3 rollout hot path) in bf16 on the MXU
    hcfg = H.HumorConfig(
        compute_dtype=os.environ.get("HUMOR_COMPUTE_DTYPE") or None)
    models = O.TTOModels(
        body=body, vposer_cfg=vcfg,
        vposer=vp.init_params(vcfg, jax.random.PRNGKey(1)),
        humor_cfg=hcfg, humor=H.init_params(hcfg, jax.random.PRNGKey(2)),
        init_gmm=gmm_lib.GmmParams(jnp.ones((12,)) / 12,
                                   jnp.zeros((12, 138)),
                                   jnp.broadcast_to(jnp.eye(138),
                                                    (12, 138, 138))))
    def make_body(seed):
        rng = np.random.RandomState(seed)
        z = jnp.asarray(rng.randn(batch, T, vcfg.latent_dim) * 0.3,
                        jnp.float32)
        pose = vp.latent2pose(vcfg, models.vposer, z)
        trans = jnp.asarray(rng.randn(batch, T, 3) * 0.1, jnp.float32)
        ro = jnp.asarray(np.tile(rng.randn(batch, 1, 3) * 0.2, (1, T, 1)),
                         jnp.float32)
        return rng, trans, ro, pose

    def make_obs(seed):
        rng, trans, ro, pose = make_body(seed)
        gt = O.smpl_results(models.body, trans, ro, pose,
                            jnp.zeros((batch, 16)), verts="none")
        return {"joints3d": gt["joints3d"]}

    def make_obs_keypts(seed):
        """Noisy 43-keypoint mesh vertices with a synthetic-occlusion
        inf mask — the fit_amass_keypts.cfg partial-keypoint workload
        (BASELINE.md config #4; reference amass_fit_dataset.py:97-142
        make_partial)."""
        rng, trans, ro, pose = make_body(seed)
        gt = O.smpl_results(models.body, trans, ro, pose,
                            jnp.zeros((batch, 16)), verts="keypt")
        v = np.asarray(gt["verts3d"])
        v = v + rng.randn(*v.shape).astype(np.float32) * 0.02
        # occlude ~40% of keypoints by height (the synthetic body's
        # scale is arbitrary, so threshold at the GT's own quantile
        # instead of the reference's fixed 0.9 m)
        thresh = np.quantile(v[..., 2], 0.6)
        v = np.where(v[..., 2:3] > thresh, np.inf, v)
        return {"verts3d": jnp.asarray(v.astype(np.float32))}

    n_out = body.num_joints + body.vtx_joint_ids.size
    smpl2op = tuple(int(i % n_out) for i in range(C.OP_NUM_JOINTS))
    cam_f = jnp.tile(jnp.asarray([1060.5, 1060.4]), (batch, 1))
    cam_center = jnp.tile(jnp.asarray([951.3, 536.8]), (batch, 1))

    def make_obs_rgb(seed):
        """2D OpenPose keypoints projected from a body ~2.5 m in front of
        the camera + the fit_proxd-style floor/overlap observations."""
        rng, trans, ro, pose = make_body(seed)
        trans = trans + jnp.asarray([0.0, 0.3, 2.5])
        gt = O.smpl_results(models.body, trans, ro, pose,
                            jnp.zeros((batch, 16)), verts="none")
        full = jnp.concatenate([gt["joints3d"], gt["joints3d_extra"]],
                               axis=2)
        op3d = full[:, :, np.asarray(smpl2op)].reshape(batch * T, -1, 3)
        eye3 = jnp.broadcast_to(jnp.eye(3), (batch * T, 3, 3))
        uv = geo.perspective_projection(
            op3d, eye3, jnp.zeros((batch * T, 3)),
            jnp.repeat(cam_f, T, axis=0),
            jnp.repeat(cam_center, T, axis=0)
        ).reshape(batch, T, C.OP_NUM_JOINTS, 2)
        uv = uv + jnp.asarray(
            rng.randn(batch, T, C.OP_NUM_JOINTS, 2) * 2.0, jnp.float32)
        conf = jnp.ones((batch, T, C.OP_NUM_JOINTS, 1), jnp.float32)
        iv = np.stack([np.arange(batch) * (T - 10),
                       np.arange(batch) * (T - 10) + T], axis=1)
        return {
            "joints2d": jnp.concatenate([uv, conf], axis=-1),
            "cam_f": cam_f,
            "cam_center": cam_center,
            "floor_plane": jnp.tile(jnp.asarray([0.0, 1.0, 0.0, 1.5]),
                                    (batch, 1)),
            "seq_interval": jnp.asarray(iv, jnp.int32),
        }

    iters = (4, 4, 4) if quick else tuple(n * scale for n in NUM_ITERS)
    if modality == "rgb":
        # the reference fit_proxd/fit_rgb weight structure
        w1 = E.StageWeights(joints2d=0.001, joints3d_smooth=100.0,
                            rgb_overlap_consist=200.0)
        w2 = E.StageWeights(joints2d=0.001, pose_prior=2e-4,
                            shape_prior=1.67e-4, joints3d_smooth=100.0,
                            rgb_overlap_consist=200.0)
        w3 = E.StageWeights(joints2d=0.001, pose_prior=2e-4,
                            shape_prior=1.67e-4, motion_prior=1e-3,
                            init_motion_prior=1e-3, joint_consistency=1.0,
                            bone_length=10.0, contact_vel=1.0,
                            contact_height=1.0, floor_reg=0.167,
                            rgb_overlap_consist=200.0)
        cfg = O.TTOConfig(seq_len=T, stage_weights=(w1, w2, w3),
                          energy=E.EnergyConfig(smpl2op_map=smpl2op),
                          num_iters=iters, optim_floor=True,
                          stage3_freeze_start=min(30 * scale, iters[2]),
                          stage3_freeze_end=min(55 * scale, iters[2]))
        obs_fn = make_obs_rgb
    elif modality == "keypts":
        # the reference fit_amass_keypts.cfg weights (verts3d data
        # term; joint3d-smooth 0.1 in stages 1/2, motion priors 5e-4 —
        # NOT the joints config's 10.0/1e-3)
        w1 = E.StageWeights(verts3d=1.0, joints3d_smooth=0.1)
        w2 = E.StageWeights(verts3d=1.0, pose_prior=2e-4,
                            shape_prior=1.67e-4, joints3d_smooth=0.1)
        w3 = E.StageWeights(verts3d=1.0, shape_prior=1.67e-4,
                            motion_prior=5e-4, init_motion_prior=5e-4,
                            joint_consistency=1.0, bone_length=10.0,
                            contact_vel=1.0, contact_height=1.0)
        cfg = O.TTOConfig(seq_len=T, stage_weights=(w1, w2, w3),
                          num_iters=iters,
                          stage3_freeze_start=min(30 * scale, iters[2]),
                          stage3_freeze_end=min(55 * scale, iters[2]))
        obs_fn = make_obs_keypts
    else:
        w1 = E.StageWeights(joints3d=1.0)
        w2 = E.StageWeights(joints3d=1.0, pose_prior=2e-4,
                            shape_prior=1.67e-4, joints3d_smooth=10.0)
        w3 = E.StageWeights(joints3d=1.0, shape_prior=1.67e-4,
                            motion_prior=1e-3, init_motion_prior=1e-3,
                            joint_consistency=1.0, bone_length=10.0,
                            contact_vel=1.0, contact_height=1.0)
        cfg = O.TTOConfig(seq_len=T, stage_weights=(w1, w2, w3),
                          num_iters=iters,
                          stage3_freeze_start=min(30 * scale, iters[2]),
                          stage3_freeze_end=min(55 * scale, iters[2]))
        obs_fn = make_obs
    make_obs = obs_fn
    runner = O.make_runner(cfg, models)

    res = runner(make_obs(0))  # compile
    jax.block_until_ready(res.final["trans"])
    times = []
    # fresh observations per rep: identical (program, inputs) pairs can be
    # served from an execution cache on some remote backends
    for i in range(5):
        obs = make_obs(i + 1)
        t0 = time.perf_counter()
        res = runner(obs)
        jax.block_until_ready(res.final["trans"])
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_reference_style(quick=False, modality="joints3d"):
    """torch-CPU reference-structure TTO cost, extrapolated from measured
    per-iteration L-BFGS times.

    modality='joints3d' models the fit_amass_joints closures (VPoser
    decode + SMPL per stage-1/2 eval; T-step Python rollout + SMPL for
    stage 3 — reference motion_optimizer.py:202-610).

    modality='rgb' models the i3DB/PROX closures the driver metric names
    (reference motion_optimizer.py:514-608 + fitting_loss.py:136-179,
    317-358): stages 1/2 add perspective projection + GMoF robust
    weighting + the within-batch overlap-consistency terms (verts
    position+velocity over overlapping frames, betas agreement); stage 3
    additionally recomputes cam2prior each closure (an extra SMPL pass
    over the full sequence), applies the prior<->camera transform inside
    the rollout, re-encodes the rolled-out pose through VPoser
    (pose2latent over B*T), and runs a SECOND full SMPL pass for the
    camera-frame losses."""
    import numpy as np
    import torch

    torch.manual_seed(0)
    D_in, L, LP = 339, 48, 32
    rgb = modality == "rgb"
    kp = modality == "keypts"

    def mlp(sizes):
        layers = [torch.nn.Linear(sizes[0], sizes[1])]
        for i in range(1, len(sizes) - 1):
            layers += [torch.nn.GroupNorm(16, sizes[i]), torch.nn.ReLU(),
                       torch.nn.Linear(sizes[i], sizes[i + 1])]
        return torch.nn.Sequential(*layers)

    prior_net = mlp([D_in, 1024, 1024, 1024, 1024, L * 2])
    decoder = mlp([D_in + L, 1024, 1024, 512, 216])
    vposer_dec = torch.nn.Sequential(
        torch.nn.Linear(LP, 512), torch.nn.LeakyReLU(0.2),
        torch.nn.Linear(512, 512), torch.nn.LeakyReLU(0.2),
        torch.nn.Linear(512, 21 * 6))
    # VPoser encoder (pose2latent) — the RGB stage-3 closure re-encodes
    # the rolled-out pose sequence every evaluation (reference :558)
    vposer_enc = torch.nn.Sequential(
        torch.nn.Linear(21 * 6, 512), torch.nn.LeakyReLU(0.2),
        torch.nn.Linear(512, 512), torch.nn.LeakyReLU(0.2),
        torch.nn.Linear(512, LP * 2))
    for m in (prior_net, decoder, vposer_dec, vposer_enc):
        for p in m.parameters():
            p.requires_grad_(False)

    # SMPL-scale LBS stand-in: shape/pose blend + skinning matmuls
    Vv, J = V_VERTS, 22
    shapedirs = torch.randn(Vv * 3, 16) * 0.01
    weights_x_rot = torch.randn(Vv, J * 9) * 0.02  # skinning contraction
    j_reg = torch.randn(J, Vv) * 0.01

    def smpl_fwd(betas, pose_aa, trans):
        n = pose_aa.shape[0]
        v = (shapedirs @ betas.T).T.reshape(n, Vv, 3)
        rot_feats = torch.cat([pose_aa, pose_aa, pose_aa], dim=1)[:, :J * 9]
        v = v + (weights_x_rot @ rot_feats.unsqueeze(-1)).reshape(n, Vv, 1) * 0.001
        joints = torch.einsum("jv,nvc->njc", j_reg, v) + trans.unsqueeze(1)
        return v, joints

    obs_joints = torch.randn(B, T, J, 3)
    # fit_amass_keypts: the data term reads 43 chosen mesh vertices
    # (reference body_model/utils.py KEYPT_VERTS + fitting_loss.py:372-376)
    kp_ids = torch.randint(0, Vv, (43,))
    obs_verts = torch.randn(B, T, 43, 3)
    NOP = 25
    obs_2d = torch.rand(B, T, NOP, 2) * 500.0
    conf_2d = torch.rand(B, T, NOP)
    cam_f = torch.tensor([1060.5, 1060.4])
    cam_c = torch.tensor([951.3, 536.8])
    n_overlap = 10

    def project(j3d):
        """perspective projection + confidence-weighted GMoF residual
        (reference fitting_loss.py:317-358)."""
        pts = j3d[:, :, :NOP] if j3d.shape[2] >= NOP else \
            j3d.repeat(1, 1, -(-NOP // j3d.shape[2]), 1)[:, :, :NOP]
        z = torch.clamp(pts[..., 2:3], min=1e-3)
        uv = pts[..., :2] / z * cam_f + cam_c
        res = torch.sum((uv - obs_2d) ** 2, dim=-1)
        gmof = (res / (res + 100.0 ** 2)) * 100.0 ** 2
        return torch.sum(conf_2d ** 2 * gmof)

    def overlap_terms(verts, betas_):
        """within-batch overlap consistency: verts position+velocity
        agreement over the n_overlap shared frames + betas agreement
        (reference fitting_loss.py:136-179)."""
        vA = verts.reshape(B, T, Vv, 3)[:-1, -n_overlap:]
        vB = verts.reshape(B, T, Vv, 3)[1:, :n_overlap]
        pos = torch.sum((vA - vB) ** 2)
        vel = torch.sum(((vA[:, 1:] - vA[:, :-1])
                         - (vB[:, 1:] - vB[:, :-1])) ** 2)
        bet = torch.sum((betas_[:-1] - betas_[1:]) ** 2)
        return pos + vel + bet

    def run_lbfgs_iters(params, closure, n_iters):
        opt = torch.optim.LBFGS(params, max_iter=20, lr=1.0,
                                line_search_fn="strong_wolfe")
        t0 = time.perf_counter()
        for _ in range(n_iters):
            opt.step(closure)
        return (time.perf_counter() - t0) / n_iters

    # stage 1/2-style closure: vposer decode + SMPL over B*T frames
    trans = torch.zeros(B, T, 3, requires_grad=True)
    latent_pose = torch.zeros(B, T, LP, requires_grad=True)
    betas = torch.zeros(B, 16, requires_grad=True)
    floor_plane = torch.zeros(B, 3, requires_grad=True)

    def closure12():
        pose6 = vposer_dec(latent_pose.reshape(-1, LP))
        pose_aa = pose6.reshape(B * T, -1)[:, :63]
        bt = betas.unsqueeze(1).expand(B, T, 16).reshape(-1, 16)
        verts, joints = smpl_fwd(bt, torch.cat(
            [pose_aa, pose_aa, pose_aa], dim=1)[:, :J * 9],
            trans.reshape(-1, 3))
        if rgb:
            loss = project(joints.reshape(B, T, J, 3))
            loss = loss + overlap_terms(verts, betas)
        elif kp:
            loss = torch.sum(
                (verts.reshape(B, T, Vv, 3)[:, :, kp_ids]
                 - obs_verts) ** 2)
        else:
            loss = torch.sum(
                (joints.reshape(B, T, J, 3) - obs_joints) ** 2)
        loss.backward()
        return loss

    n_meas = 2 if quick else 3
    t12 = run_lbfgs_iters([trans, latent_pose, betas],
                          lambda: (closure12()), n_meas)

    # stage 3-style closure: T-step python rollout + SMPL + backward
    latent_motion = torch.zeros(B, T - 1, L, requires_grad=True)

    def closure3():
        if rgb:
            # cam2prior recomputation: an SMPL pass over the full current
            # sequence + the frame-0 alignment solve (reference :518-524)
            pose6 = vposer_dec(latent_pose.detach().reshape(-1, LP))
            pose_aa0 = pose6.reshape(B * T, -1)[:, :63]
            bt0 = betas.unsqueeze(1).expand(B, T, 16).reshape(-1, 16)
            _, j0 = smpl_fwd(bt0, torch.cat(
                [pose_aa0, pose_aa0, pose_aa0], dim=1)[:, :J * 9],
                trans.detach().reshape(-1, 3))
            n = floor_plane / torch.clamp(
                torch.norm(floor_plane, dim=-1, keepdim=True), min=1e-6)
            R_c2p = torch.eye(3).unsqueeze(0).expand(B, 3, 3) \
                + 0.0 * n.unsqueeze(-1)
            t_c2p = j0.reshape(B, T, J, 3)[:, 0, 0]
        x = torch.randn(B, D_in) * 0.01 + 0.0 * latent_motion.sum()
        poses = []
        for t in range(T - 1):
            z = latent_motion[:, t]
            out = decoder(torch.cat([x, z], dim=1))
            # delta compose + canonicalization stand-in
            Rm = out[:, :9].reshape(B, 3, 3)
            _ = torch.matmul(Rm, Rm.transpose(1, 2))
            if rgb:
                # prior->camera transform of the step's root state
                # (reference rollout_latent_motion applies cam2prior
                # fwd/inv around every rollout, :542 + apply_cam2prior)
                _ = torch.matmul(R_c2p, Rm) + t_c2p.unsqueeze(-1)
            x = torch.cat([out, x[:, 216:]], dim=1)
            poses.append(out[:, 9: 9 + 63])
        pose_aa = torch.stack(poses, dim=1).reshape(-1, 63)
        bt = betas.detach().unsqueeze(1).expand(B, T - 1, 16).reshape(-1, 16)
        verts, joints = smpl_fwd(bt, torch.cat(
            [pose_aa, pose_aa, pose_aa], dim=1)[:, :J * 9],
            torch.zeros(B * (T - 1), 3))
        if rgb:
            # re-encode rolled-out pose to the VPoser latent (:558)
            pose6r = torch.cat([pose_aa, pose_aa[:, :63]],
                               dim=1)[:, :21 * 6]
            _ = vposer_enc(pose6r)
            # SECOND full SMPL pass: camera-frame predictions (:585)
            cam_verts, cam_joints = smpl_fwd(
                bt, torch.cat([pose_aa, pose_aa, pose_aa],
                              dim=1)[:, :J * 9],
                torch.zeros(B * (T - 1), 3) + t_c2p.repeat_interleave(
                    T - 1, dim=0))
            cj = torch.cat([cam_joints.reshape(B, T - 1, J, 3),
                            cam_joints.reshape(B, T - 1, J, 3)[:, -1:]],
                           dim=1)
            loss = project(cj)
            loss = loss + overlap_terms(
                torch.cat([cam_verts.reshape(B, T - 1, Vv, 3),
                           cam_verts.reshape(B, T - 1, Vv, 3)[:, -1:]],
                          dim=1).reshape(B * T, Vv, 3), betas)
            loss = loss + torch.sum(floor_plane ** 2)
        elif kp:
            loss = torch.sum(verts[:, kp_ids] ** 2) * 1e-6
        else:
            loss = torch.sum(joints ** 2) * 1e-6
        loss = loss + torch.sum(latent_motion ** 2)
        loss.backward()
        return loss

    s3_params = [latent_motion, floor_plane] if rgb else [latent_motion]
    t3 = run_lbfgs_iters(s3_params, lambda: (closure3()), n_meas)

    total = (NUM_ITERS[0] + NUM_ITERS[1]) * t12 + NUM_ITERS[2] * t3
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=B,
                    help="window batch size (default 2 = the driver "
                         "baseline; larger batches measure throughput)")
    ap.add_argument("--scale", type=int, default=KNEE_SCALE,
                    help="iteration-budget multiple of the reference's "
                         "outer counts (default = the measured accuracy "
                         "knee, bench_knee.py)")
    ap.add_argument("--modality", default="joints3d",
                    choices=("joints3d", "rgb", "keypts"),
                    help="'rgb' = 2D keypoints + floor optimization + "
                         "overlap consistency (the i3DB/PROX workload "
                         "BASELINE.md names); each modality's "
                         "vs_baseline uses its own torch-CPU closure "
                         "re-creation")
    args = ap.parse_args()

    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    ours = bench_ours(quick=args.quick, batch=args.batch,
                      scale=args.scale, modality=args.modality)
    if args.quick:
        # extrapolate quick iters to the full budget at args.scale
        ours = ours * (args.scale * sum(NUM_ITERS)) / 12.0
    try:
        ref = bench_reference_style(quick=args.quick,
                                    modality=args.modality)
        # the torch-CPU baseline is measured at B=2; normalize both
        # sides to per-window time so vs_baseline stays
        # apples-to-apples at any --batch
        vs = (ref / B) / (ours / args.batch)
    except Exception:
        ref, vs = float("nan"), float("nan")
    tag = "" if args.modality == "joints3d" else f"_{args.modality}"
    out = {
        "metric": f"tto_60frame_batch{args.batch}{tag}_wallclock",
        "value": round(ours, 3),
        "unit": "s",
        "vs_baseline": round(vs, 2),
        "baseline_s": round(ref, 3),
        "num_iters": [n * args.scale for n in NUM_ITERS],
    }
    if args.batch != B:
        out["windows_per_s"] = round(args.batch / ours, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
