"""Pallas fused-rollout kernel: the whole stage-3 autoregressive chain as
ONE TPU kernel with the HuMoR prior+decoder weights resident in VMEM.

Why: the TTO stage-3 closure is a 59-step sequential rollout of ~23 MB of
MLP weights at tiny batch (B=2, x8 line-search candidates). Under XLA the
scan executes dozens of small ops per step (measured ~103 us/step fwd+bwd
at B=16 on a v5e against ~25 us of pure matmul time — see RESULTS.md).
This kernel runs the entire chain inside one `pallas_call` with

  * grid = (T,): one grid step per rollout step (TPU grid iterations are
    sequential, so the carry lives in VMEM scratch);
  * every weight block's index_map constant in t -> fetched into VMEM
    once and reused for all T steps (v5e has 128 MB VMEM; the default
    16 MB scoped limit is raised via CompilerParams);
  * the BACKWARD pass as a second kernel over the reversed grid that
    re-traces `jax.vjp` of the SAME step function per step — gradients
    come from JAX autodiff at kernel-trace time, never hand derivation.
    Only input/variable gradients are produced (z, initial state): TTO
    freezes the model, so weight cotangents are declared zero.

Kernel data layout (Mosaic cannot split the minor/lane dimension —
(B, 9) -> (B, 3, 3) is an unsupported shape cast):

  * rotations are packed row-major 9-lane vectors; rotation algebra is
    explicit lane slice/stack arithmetic (`rot9_*` below);
  * pose is (B, 21, 9), joints are (B, 22, 3) — per-atom math indexes the
    minor dim and re-stacks;
  * the MLP input packing is replaced by per-component matmul SPLITS:
    layer-0 weights are pre-sliced on host (`prep_weights`) so
    h0 = x_flat @ W_flat + sum_k pose[..k] @ W_pose_k + ... — identical
    math to concat-then-matmul, different f32 summation order.

Behavioral parity: humor_tpu.ops.rollout_step.rollout_scan (itself pinned
to models.humor.rollout and the reference roll_out,
/root/reference/humor/models/humor_model.py:785-1015); equivalence and
gradient parity are pinned by tests/test_rollout_kernel.py.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from humor_tpu.ops.mlp import GN_EPS, GN_GROUPS, group_norm

LATENT = 48
N_JNT = 22          # SMPL joints in the state
N_POSE = 21         # body pose joints
D_FLAT = 18         # trans 3 | trans_vel 3 | root9 9 | root_orient_vel 3
VMEM_LIMIT = 127 * 1024 * 1024


def _interpret() -> bool:
    """Run the pallas_calls in interpreter mode — exercises the real
    kernel bodies (grid sequencing, scratch carries, reversed backward)
    on CPU, where Mosaic lowering is unavailable. Tests set this;
    defaults to interpret on non-TPU backends so the kernel path is
    usable everywhere."""
    import os

    v = os.environ.get("HUMOR_ROLLOUT_INTERPRET")
    if v is not None:
        return v not in ("0", "false", "")
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Packed-9 rotation algebra (lane slice/stack only — Pallas-lowerable)
# ---------------------------------------------------------------------------

def rot9_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., 9) @ (..., 9) row-major packed rotation product."""
    out = []
    for i in range(3):
        for j in range(3):
            out.append(sum(a[..., 3 * i + k] * b[..., 3 * k + j]
                           for k in range(3)))
    return jnp.stack(out, axis=-1)


def rot9_transpose(a: jnp.ndarray) -> jnp.ndarray:
    idx = [0, 3, 6, 1, 4, 7, 2, 5, 8]
    return jnp.stack([a[..., i] for i in idx], axis=-1)


def rot9_apply(r: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vectors: r (B, 9) applied to v (B, ..., 3); r broadcasts
    over v's middle dims."""
    extra = v.ndim - r.ndim
    rr = r.reshape(r.shape[:-1] + (1,) * extra + (9,)) if extra else r
    out = []
    for i in range(3):
        out.append(sum(rr[..., 3 * i + j] * v[..., j] for j in range(3)))
    return jnp.stack(out, axis=-1)


def aa_to_rot9(aa: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues on (..., 3) -> packed (..., 9), identical math to
    transforms.aa_to_rotmat (incl. its +1e-8 bias inside the norm)."""
    x = aa[..., 0] + 1e-8
    y = aa[..., 1] + 1e-8
    z = aa[..., 2] + 1e-8
    sq = x * x + y * y + z * z
    angle = jnp.sqrt(jnp.maximum(sq, 1e-8 * 1e-8))
    ux, uy, uz = x / angle, y / angle, z / angle
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    C = 1.0 - c
    return jnp.stack([
        c + ux * ux * C, ux * uy * C - uz * s, ux * uz * C + uy * s,
        uy * ux * C + uz * s, c + uy * uy * C, uy * uz * C - ux * s,
        uz * ux * C - uy * s, uz * uy * C + ux * s, c + uz * uz * C,
    ], axis=-1)


def heading_rot9(root9: jnp.ndarray) -> jnp.ndarray:
    """compute_world2aligned_mat on a packed rotation: body_right =
    -column 0 = -(r[0], r[3], r[6]); closed-form Rz (see
    transforms.compute_aligned_from_right)."""
    bx = -root9[..., 0]
    by = -root9[..., 3]
    h = jnp.sqrt(jnp.maximum(bx * bx + by * by, 1e-12))
    degenerate = h < 1e-6
    c = jnp.where(degenerate, 1.0, bx / (h + 1e-6))
    s = jnp.where(degenerate, 0.0, by / (h + 1e-6))
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack([c, s, zero, -s, c, zero, zero, zero, one], axis=-1)


# ---------------------------------------------------------------------------
# Host-side weight preparation
# ---------------------------------------------------------------------------

_IN_OFFS = {"trans": 0, "trans_vel": 3, "root_orient": 6,
            "root_orient_vel": 15, "pose_body": 18, "joints": 207,
            "joints_vel": 273}
# decoder raw-output column offsets (aa out spec):
_OUT_OFFS = {"flat": (0, 12), "pose": (12, 75), "joints": (75, 141),
             "joints_vel": (141, 207), "contacts": (207, 216)}


def _split_in_w(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Split a layer-0 weight (339 [+48], H) by input component, with
    pose/joints rearranged entry-major so the kernel's (B, n) @ (n, H)
    per-entry matmuls reproduce the packed matmul."""
    H = w.shape[1]
    o = _IN_OFFS
    flat = jnp.concatenate([w[o["trans"]:o["trans"] + 3],
                            w[o["trans_vel"]:o["trans_vel"] + 3],
                            w[o["root_orient"]:o["root_orient"] + 9],
                            w[o["root_orient_vel"]:o["root_orient_vel"] + 3]],
                           axis=0)                       # (18, H)
    pose = w[o["pose_body"]:o["pose_body"] + 189]
    pose = pose.reshape(N_POSE, 9, H).transpose(1, 0, 2).reshape(
        9 * N_POSE, H)                                   # entry-major
    jts = w[o["joints"]:o["joints"] + 66]
    jts = jts.reshape(N_JNT, 3, H).transpose(1, 0, 2).reshape(3 * N_JNT, H)
    jv = w[o["joints_vel"]:o["joints_vel"] + 66]
    jv = jv.reshape(N_JNT, 3, H).transpose(1, 0, 2).reshape(3 * N_JNT, H)
    out = {"flat": flat, "pose": pose, "joints": jts, "jvel": jv}
    if w.shape[0] > 339:                                 # decoder: +z rows
        out["z"] = w[339:]
    return out


def _split_out_w(w: jnp.ndarray, b: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Split the decoder's final weight/bias by OUTPUT component; pose and
    joint blocks become entry-major so the kernel can emit (B, n, 3)
    without lane-splitting reshapes."""
    def cols(name):
        s, e = _OUT_OFFS[name]
        return w[:, s:e], b[s:e]

    wf, bf = cols("flat")
    wp, bp = cols("pose")
    wj, bj = cols("joints")
    wv, bv = cols("joints_vel")
    wc, bc = cols("contacts")
    D = w.shape[0]
    wp = wp.reshape(D, N_POSE, 3).transpose(0, 2, 1).reshape(D, 3 * N_POSE)
    bp = bp.reshape(N_POSE, 3).transpose(1, 0).reshape(3 * N_POSE)
    wj = wj.reshape(D, N_JNT, 3).transpose(0, 2, 1).reshape(D, 3 * N_JNT)
    bj = bj.reshape(N_JNT, 3).transpose(1, 0).reshape(3 * N_JNT)
    wv = wv.reshape(D, N_JNT, 3).transpose(0, 2, 1).reshape(D, 3 * N_JNT)
    bv = bv.reshape(N_JNT, 3).transpose(1, 0).reshape(3 * N_JNT)
    return {"w_flat": wf, "b_flat": bf[None], "w_pose": wp,
            "b_pose": bp[None], "w_joints": wj, "b_joints": bj[None],
            "w_jvel": wv, "b_jvel": bv[None], "w_contacts": wc,
            "b_contacts": bc[None]}


def prep_weights(params: Dict) -> Dict[str, jnp.ndarray]:
    """HuMoR params pytree -> flat dict of kernel-layout arrays (biases
    and GN affines as (1, C) so every array is >= 2-D)."""
    kw: Dict[str, jnp.ndarray] = {}
    pr = params["prior"]
    for k, v in _split_in_w(pr[0]["w"]).items():
        kw[f"pr0_{k}"] = v
    kw["pr0_b"] = pr[0]["b"][None]
    for i in range(1, 5):
        kw[f"pr{i}_w"] = pr[i]["w"]
        kw[f"pr{i}_b"] = pr[i]["b"][None]
        kw[f"pr{i}_gs"] = pr[i]["gn_scale"][None]
        kw[f"pr{i}_gb"] = pr[i]["gn_bias"][None]
    de = params["decoder"]
    for k, v in _split_in_w(de[0]["w"]).items():
        kw[f"de0_{k}"] = v
    kw["de0_b"] = de[0]["b"][None]
    for i in (1, 2):
        kw[f"de{i}_wh"] = de[i]["w"][:-LATENT]
        kw[f"de{i}_wz"] = de[i]["w"][-LATENT:]
        kw[f"de{i}_b"] = de[i]["b"][None]
        kw[f"de{i}_gs"] = de[i]["gn_scale"][None]
        kw[f"de{i}_gb"] = de[i]["gn_bias"][None]
    w3, b3 = de[3]["w"], de[3]["b"]
    for k, v in _split_out_w(w3[:-LATENT], b3).items():
        kw[f"de3h_{k}"] = v
    for k, v in _split_out_w(w3[-LATENT:],
                             jnp.zeros_like(b3)).items():
        if k.startswith("w_"):
            kw[f"de3z_{k}"] = v
    kw[f"de3_gs"] = de[3]["gn_scale"][None]
    kw[f"de3_gb"] = de[3]["gn_bias"][None]
    return kw


# ---------------------------------------------------------------------------
# The kernel-layout step function (pure jnp; traced inside the kernels)
# ---------------------------------------------------------------------------

class KCarry(NamedTuple):
    flat: jnp.ndarray        # (B, 18) trans|trans_vel|root9|root_vel
    pose: jnp.ndarray        # (B, 21, 9)
    joints: jnp.ndarray      # (B, 22, 3)
    jvel: jnp.ndarray        # (B, 22, 3)
    g_rot: jnp.ndarray       # (B, 9)
    g_trans: jnp.ndarray     # (B, 3)


class KOut(NamedTuple):
    world_flat: jnp.ndarray  # (B, 18)
    world_pose: jnp.ndarray  # (B, 21, 9)
    world_joints: jnp.ndarray  # (B, 22, 3)
    world_jvel: jnp.ndarray  # (B, 22, 3)
    contacts: jnp.ndarray    # (B, 9) logits
    pm: jnp.ndarray          # (B, 48)
    pv: jnp.ndarray          # (B, 48)


_HIP = jax.lax.Precision.HIGHEST


def _is_matmul_weight(name: str) -> bool:
    return not (name.endswith(("_b", "_gs", "_gb")) or "_b_" in name
                or name.endswith("@T"))


def add_transposes(kw: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Add `name@T` pre-transposed copies of every matmul weight. The
    BACKWARD kernel needs them: autodiff's input-cotangent `g @ W^T`
    lowers in Mosaic to a register-level transpose of the VMEM-resident
    W, and with three 1024x1024 stacks per step the register allocator
    reserved >100 MB of spill slots (measured: scoped-vmem OOM at
    124/110 MB). With W^T as its own VMEM-resident input, the backward
    is a plain matmul; XLA constant-folds the transposes once since the
    weights are closure constants of the TTO program."""
    out = dict(kw)
    for k, v in kw.items():
        if _is_matmul_weight(k):
            out[k + "@T"] = jnp.swapaxes(v, 0, 1)
    return out


@jax.custom_vjp
def _mm_t(x, W, Wt):
    return jnp.dot(x, W, precision=_HIP)


def _mm_t_fwd(x, W, Wt):
    return jnp.dot(x, W, precision=_HIP), (W, Wt)


def _mm_t_bwd(res, g):
    W, Wt = res
    # weight cotangents are structurally required but pruned by DCE —
    # the kernel differentiates only (carry, z); the TTO freezes weights
    return (jnp.dot(g, Wt, precision=_HIP),
            jnp.zeros_like(W), jnp.zeros_like(Wt))


_mm_t.defvjp(_mm_t_fwd, _mm_t_bwd)


def _mm(kw, name, x):
    """x @ kw[name]; uses the pre-transposed backward when kw carries
    `name@T` (backward kernel), plain autodiff otherwise."""
    Wt = kw.get(name + "@T")
    if Wt is None:
        return jnp.dot(x, kw[name], precision=_HIP)
    return _mm_t(x, kw[name], Wt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _split_mm_t(n, x3, W, Wt):
    ncomp = x3.shape[-1]
    return sum(jnp.dot(x3[..., k], W[k * n:(k + 1) * n], precision=_HIP)
               for k in range(ncomp))


def _split_mm_t_fwd(n, x3, W, Wt):
    return _split_mm_t(n, x3, W, Wt), (W, Wt)


def _split_mm_t_bwd(n, res, g):
    W, Wt = res
    ncomp = Wt.shape[1] // n
    dx3 = jnp.stack([jnp.dot(g, Wt[:, k * n:(k + 1) * n], precision=_HIP)
                     for k in range(ncomp)], axis=-1)
    return dx3, jnp.zeros_like(W), jnp.zeros_like(Wt)


_split_mm_t.defvjp(_split_mm_t_fwd, _split_mm_t_bwd)


def _split_mm(kw, name, x3, n):
    """Entry-major split matmul: x3 (B, n, ncomp) against W (ncomp*n, H)
    as sum over per-entry (B, n) @ (n, H) blocks (identical math to the
    packed concat-matmul); pre-transposed backward like _mm."""
    W = kw[name]
    Wt = kw.get(name + "@T")
    ncomp = x3.shape[-1]
    if Wt is None:
        return sum(jnp.dot(x3[..., k], W[k * n:(k + 1) * n],
                           precision=_HIP) for k in range(ncomp))
    return _split_mm_t(n, x3, W, Wt)


def _layer0(kw, pre, carry: KCarry, z=None) -> jnp.ndarray:
    h = _mm(kw, f"{pre}_flat", carry.flat)
    h = h + _split_mm(kw, f"{pre}_pose", carry.pose, N_POSE)
    h = h + _split_mm(kw, f"{pre}_joints", carry.joints, N_JNT)
    h = h + _split_mm(kw, f"{pre}_jvel", carry.jvel, N_JNT)
    if z is not None:
        h = h + _mm(kw, f"{pre}_z", z)
    return h + kw[f"{pre}_b"]


def _gn_relu(h, gs, gb):
    h = group_norm(h, gs[0], gb[0], groups=GN_GROUPS, eps=GN_EPS)
    return jax.nn.relu(h)


def _prior_mlp(kw, carry: KCarry) -> Tuple[jnp.ndarray, jnp.ndarray]:
    h = _layer0(kw, "pr0", carry)
    for i in range(1, 5):
        h = _gn_relu(h, kw[f"pr{i}_gs"], kw[f"pr{i}_gb"])
        h = _mm(kw, f"pr{i}_w", h) + kw[f"pr{i}_b"]
    return h[:, :LATENT], jnp.exp(h[:, LATENT:])


def _decoder_mlp(kw, carry: KCarry, z: jnp.ndarray):
    h = _layer0(kw, "de0", carry, z=z)
    for i in (1, 2):
        h = _gn_relu(h, kw[f"de{i}_gs"], kw[f"de{i}_gb"])
        h = (_mm(kw, f"de{i}_wh", h) + _mm(kw, f"de{i}_wz", z)
             + kw[f"de{i}_b"])
    h = _gn_relu(h, kw["de3_gs"], kw["de3_gb"])

    def head(name):
        out = (_mm(kw, f"de3h_w_{name}", h)
               + _mm(kw, f"de3z_w_{name}", z)
               + kw[f"de3h_b_{name}"])
        return out

    flat = head("flat")                        # (B, 12) deltas
    pose = head("pose")                        # (B, 63) entry-major
    jts = head("joints")                       # (B, 66) entry-major
    jv = head("jvel")
    contacts = head("contacts")                # (B, 9)
    B = flat.shape[0]
    pose3 = jnp.stack([pose[:, c * N_POSE:(c + 1) * N_POSE]
                       for c in range(3)], axis=-1)       # (B, 21, 3)
    jts3 = jnp.stack([jts[:, c * N_JNT:(c + 1) * N_JNT]
                      for c in range(3)], axis=-1)        # (B, 22, 3)
    jv3 = jnp.stack([jv[:, c * N_JNT:(c + 1) * N_JNT]
                     for c in range(3)], axis=-1)
    return flat, pose3, jts3, jv3, contacts


def kstep(kw: Dict[str, jnp.ndarray], carry: KCarry, z: jnp.ndarray,
          t2j: jnp.ndarray) -> Tuple[KCarry, KOut]:
    """One rollout transition in kernel layout — the same math as
    rollout_step.rollout_step (prior -> decode -> delta compose -> world
    un-canonicalization -> re-canonicalize)."""
    pm, pv = _prior_mlp(kw, carry)
    dflat, dpose, djts, djv, contacts = _decoder_mlp(kw, carry, z)

    trans = carry.flat[:, 0:3]
    trans_vel = carry.flat[:, 3:6]
    root9 = carry.flat[:, 6:15]
    root_vel = carry.flat[:, 15:18]

    # delta composition (output_delta=True; rotations compose)
    n_trans = trans + dflat[:, 0:3]
    n_trans_vel = trans_vel + dflat[:, 3:6]
    n_root9 = rot9_multiply(aa_to_rot9(dflat[:, 6:9]), root9)
    n_root_vel = root_vel + dflat[:, 9:12]
    n_pose = rot9_multiply(aa_to_rot9(dpose), carry.pose)  # (B, 21, 9)
    n_joints = carry.joints + djts
    n_jvel = carry.jvel + djv

    # world frame: inverse of the running global transform
    gT = rot9_transpose(carry.g_rot)
    w_root9 = rot9_multiply(gT, n_root9)
    w_trans = rot9_apply(gT, n_trans) - carry.g_trans
    t2jn = t2j[:, None, :]
    w_joints = (rot9_apply(gT, n_joints + t2jn) - t2jn
                - carry.g_trans[:, None, :])
    w_trans_vel = rot9_apply(gT, n_trans_vel)
    w_root_vel = rot9_apply(gT, n_root_vel)
    w_jvel = rot9_apply(gT, n_jvel)

    # new canonical frame from the prediction
    W9 = heading_rot9(n_root9)
    zeros1 = jnp.zeros_like(n_trans[:, 0:1])
    f_trans = jnp.concatenate([-n_trans[:, 0:2], zeros1], axis=-1)
    l_root9 = rot9_multiply(W9, n_root9)
    l_trans = rot9_apply(W9, n_trans + f_trans)
    l_joints = rot9_apply(W9, n_joints + f_trans[:, None, :] + t2jn) - t2jn
    l_trans_vel = rot9_apply(W9, n_trans_vel)
    l_root_vel = rot9_apply(W9, n_root_vel)
    l_jvel = rot9_apply(W9, n_jvel)

    new_g_trans = jnp.concatenate([-w_trans[:, 0:2], zeros1], axis=-1)
    new_g_rot = rot9_multiply(carry.g_rot, W9)

    new_carry = KCarry(
        flat=jnp.concatenate([l_trans, l_trans_vel, l_root9, l_root_vel],
                             axis=-1),
        pose=n_pose, joints=l_joints, jvel=l_jvel,
        g_rot=new_g_rot, g_trans=new_g_trans)
    out = KOut(
        world_flat=jnp.concatenate(
            [w_trans, w_trans_vel, w_root9, w_root_vel], axis=-1),
        world_pose=n_pose, world_joints=w_joints, world_jvel=w_jvel,
        contacts=contacts, pm=pm, pv=pv)
    return new_carry, out


# ---------------------------------------------------------------------------
# Layout conversion (XLA side, outside the kernels)
# ---------------------------------------------------------------------------

def carry_from_state(init_state: Dict[str, jnp.ndarray]
                     ) -> Tuple[KCarry, jnp.ndarray]:
    """Typed world init state (matrix rots, (B, D) components) -> kernel
    carry + trans2joint, matching rollout_step.init_carry."""
    B = init_state["trans"].shape[0]
    dtype = init_state["trans"].dtype
    t2j = jnp.concatenate(
        [-init_state["joints"][:, :2], jnp.zeros((B, 1), dtype)], axis=-1)
    flat = jnp.concatenate(
        [init_state["trans"], init_state["trans_vel"],
         init_state["root_orient"], init_state["root_orient_vel"]],
        axis=-1)
    carry = KCarry(
        flat=flat,
        pose=init_state["pose_body"].reshape(B, N_POSE, 9),
        joints=init_state["joints"].reshape(B, N_JNT, 3),
        jvel=init_state["joints_vel"].reshape(B, N_JNT, 3),
        g_rot=jnp.broadcast_to(
            jnp.eye(3, dtype=dtype).reshape(9), (B, 9)),
        g_trans=jnp.zeros((B, 3), dtype))
    return carry, t2j


def world_to_dict(outs: KOut) -> Dict[str, jnp.ndarray]:
    """Per-step KOut stacked over time (B, T, ...) -> the humor.rollout
    world dict layout."""
    B, T = outs.world_flat.shape[:2]
    return {
        "trans": outs.world_flat[..., 0:3],
        "trans_vel": outs.world_flat[..., 3:6],
        "root_orient": outs.world_flat[..., 6:15],
        "root_orient_vel": outs.world_flat[..., 15:18],
        "pose_body": outs.world_pose.reshape(B, T, N_POSE * 9),
        "joints": outs.world_joints.reshape(B, T, N_JNT * 3),
        "joints_vel": outs.world_jvel.reshape(B, T, N_JNT * 3),
        "contacts": outs.contacts,
    }


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

_CARRY_FIELDS = ("flat", "pose", "joints", "jvel", "g_rot", "g_trans")


def _carry_shapes(B):
    return {"flat": (B, D_FLAT), "pose": (B, N_POSE, 9),
            "joints": (B, N_JNT, 3), "jvel": (B, N_JNT, 3),
            "g_rot": (B, 9), "g_trans": (B, 3)}


def _out_shapes(B):
    return {"world_flat": (B, D_FLAT), "world_pose": (B, N_POSE, 9),
            "world_joints": (B, N_JNT, 3), "world_jvel": (B, N_JNT, 3),
            "contacts": (B, 9), "pm": (B, LATENT), "pv": (B, LATENT)}


def _const_spec(shape):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _step_spec(shape):
    """Per-step block of a (T,)-leading array: block (1, ...) at index t."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nd = len(shape)
    return pl.BlockSpec((1,) + shape,
                        lambda t: (t,) + (0,) * nd,
                        memory_space=pltpu.VMEM)


def _fwd_pallas(kw: Dict[str, jnp.ndarray], carry0: KCarry,
                z_seq: jnp.ndarray, t2j: jnp.ndarray, num_steps: int):
    """Forward kernel. Returns (outs stacked (T, B, ...), saved carries
    (T, B, ...) — each step's ENTRY carry, for the backward)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = t2j.shape[0]
    kw_names = sorted(kw)
    cshapes = _carry_shapes(B)
    oshapes = _out_shapes(B)
    out_names = list(KOut._fields)

    n_kw = len(kw_names)
    n_c = len(_CARRY_FIELDS)

    def kernel(*refs):
        kw_refs = refs[:n_kw]
        c0_refs = refs[n_kw:n_kw + n_c]
        z_ref = refs[n_kw + n_c]
        t2j_ref = refs[n_kw + n_c + 1]
        out_refs = refs[n_kw + n_c + 2:n_kw + n_c + 2 + len(out_names)]
        save_refs = refs[n_kw + n_c + 2 + len(out_names):
                         n_kw + n_c + 2 + len(out_names) + n_c]
        scratch = refs[n_kw + n_c + 2 + len(out_names) + n_c:]

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            for s_ref, c_ref in zip(scratch, c0_refs):
                s_ref[...] = c_ref[...]

        kwv = {n: r[...] for n, r in zip(kw_names, kw_refs)}
        carry = KCarry(*[r[...] for r in scratch])
        for s_ref, v in zip(save_refs, carry):
            s_ref[0] = v
        z = z_ref[0]
        new_carry, out = kstep(kwv, carry, z, t2j_ref[...])
        for r, v in zip(out_refs, out):
            r[0] = v
        for s_ref, v in zip(scratch, new_carry):
            s_ref[...] = v

    out_shape = ([jax.ShapeDtypeStruct((num_steps,) + oshapes[n],
                                       jnp.float32) for n in out_names]
                 + [jax.ShapeDtypeStruct((num_steps,) + cshapes[f],
                                         jnp.float32)
                    for f in _CARRY_FIELDS])
    in_specs = ([_const_spec(kw[n].shape) for n in kw_names]
                + [_const_spec(cshapes[f]) for f in _CARRY_FIELDS]
                + [_step_spec(z_seq.shape[1:])]
                + [_const_spec(t2j.shape)])
    out_specs = ([_step_spec(oshapes[n]) for n in out_names]
                 + [_step_spec(cshapes[f]) for f in _CARRY_FIELDS])
    scratch_shapes = [pltpu.VMEM(cshapes[f], jnp.float32)
                      for f in _CARRY_FIELDS]

    res = pl.pallas_call(
        kernel, grid=(num_steps,),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(*[kw[n] for n in kw_names], *carry0, z_seq, t2j)

    outs = KOut(*res[:len(out_names)])
    saved = KCarry(*res[len(out_names):])
    return outs, saved


def _bwd_pallas(kw: Dict[str, jnp.ndarray], saved: KCarry,
                z_seq: jnp.ndarray, t2j: jnp.ndarray,
                out_cot: KOut, num_steps: int):
    """Backward kernel: reversed grid; per step re-runs jax.vjp(kstep)
    on the saved entry carry. Returns (d_carry0, d_z_seq, d_t2j)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = t2j.shape[0]
    kw = add_transposes(kw)   # VMEM-resident W^T for the cotangent matmuls
    kw_names = sorted(kw)
    cshapes = _carry_shapes(B)
    oshapes = _out_shapes(B)
    out_names = list(KOut._fields)
    n_kw = len(kw_names)
    n_c = len(_CARRY_FIELDS)

    def rev(shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1,) + shape,
            lambda t: (num_steps - 1 - t,) + (0,) * nd,
            memory_space=pltpu.VMEM)

    def kernel(*refs):
        kw_refs = refs[:n_kw]
        save_refs = refs[n_kw:n_kw + n_c]
        z_ref = refs[n_kw + n_c]
        t2j_ref = refs[n_kw + n_c + 1]
        cot_refs = refs[n_kw + n_c + 2:n_kw + n_c + 2 + len(out_names)]
        dz_ref = refs[n_kw + n_c + 2 + len(out_names)]
        dc_refs = refs[n_kw + n_c + 3 + len(out_names):
                       n_kw + n_c + 3 + len(out_names) + n_c]
        dt2j_ref = refs[n_kw + n_c + 3 + len(out_names) + n_c]
        scratch = refs[n_kw + n_c + 4 + len(out_names) + n_c:]
        c_scr = scratch[:n_c]       # carry cotangent
        t2j_scr = scratch[n_c]      # accumulated t2j cotangent

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            for s in c_scr:
                s[...] = jnp.zeros_like(s)
            t2j_scr[...] = jnp.zeros_like(t2j_scr)

        kwv = {n: r[...] for n, r in zip(kw_names, kw_refs)}
        carry = KCarry(*[r[0] for r in save_refs])
        z = z_ref[0]
        t2jv = t2j_ref[...]

        def f(c, zz, tt):
            return kstep(kwv, c, zz, tt)

        _, vjp_fn = jax.vjp(f, carry, z, t2jv)
        carry_cot = KCarry(*[s[...] for s in c_scr])
        out_cot_t = KOut(*[r[0] for r in cot_refs])
        d_carry, d_z, d_t2j = vjp_fn((carry_cot, out_cot_t))

        dz_ref[0] = d_z
        for s, v in zip(c_scr, d_carry):
            s[...] = v
        t2j_scr[...] = t2j_scr[...] + d_t2j

        @pl.when(t == num_steps - 1)
        def _():
            for r, s in zip(dc_refs, c_scr):
                r[...] = s[...]
            dt2j_ref[...] = t2j_scr[...]

    in_specs = ([_const_spec(kw[n].shape) for n in kw_names]
                + [rev(cshapes[f]) for f in _CARRY_FIELDS]
                + [rev(z_seq.shape[1:])]
                + [_const_spec(t2j.shape)]
                + [rev(oshapes[n]) for n in out_names])
    out_shape = ([jax.ShapeDtypeStruct(z_seq.shape, jnp.float32)]
                 + [jax.ShapeDtypeStruct(cshapes[f], jnp.float32)
                    for f in _CARRY_FIELDS]
                 + [jax.ShapeDtypeStruct(t2j.shape, jnp.float32)])
    out_specs = ([rev(z_seq.shape[1:])]
                 + [_const_spec(cshapes[f]) for f in _CARRY_FIELDS]
                 + [_const_spec(t2j.shape)])
    scratch_shapes = ([pltpu.VMEM(cshapes[f], jnp.float32)
                       for f in _CARRY_FIELDS]
                      + [pltpu.VMEM(t2j.shape, jnp.float32)])

    res = pl.pallas_call(
        kernel, grid=(num_steps,),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(*[kw[n] for n in kw_names], *saved, z_seq, t2j,
      *out_cot)

    d_z = res[0]
    d_carry0 = KCarry(*res[1:1 + n_c])
    d_t2j = res[1 + n_c]
    return d_carry0, d_z, d_t2j


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _rollout_kernel(kw, carry0, z_seq, t2j, num_steps):
    outs, _ = _fwd_pallas(kw, carry0, z_seq, t2j, num_steps)
    return outs


def _rollout_kernel_fwd(kw, carry0, z_seq, t2j, num_steps):
    outs, saved = _fwd_pallas(kw, carry0, z_seq, t2j, num_steps)
    return outs, (kw, saved, z_seq, t2j)


def _rollout_kernel_bwd(num_steps, residuals, out_cot):
    kw, saved, z_seq, t2j = residuals
    d_carry0, d_z, d_t2j = _bwd_pallas(kw, saved, z_seq, t2j,
                                       out_cot, num_steps)
    # model weights are frozen in the TTO — declare zero cotangents
    d_kw = jax.tree_util.tree_map(jnp.zeros_like, kw)
    return d_kw, d_carry0, d_z, d_t2j


_rollout_kernel.defvjp(_rollout_kernel_fwd, _rollout_kernel_bwd)


def rollout_fused(cfg, params: Dict, init_state: Dict[str, jnp.ndarray],
                  z_seq: jnp.ndarray,
                  kw: Dict[str, jnp.ndarray] = None
                  ) -> Tuple[Dict[str, jnp.ndarray],
                             Tuple[jnp.ndarray, jnp.ndarray]]:
    """Drop-in equivalent of rollout_step.rollout_scan running the whole
    chain in the Pallas kernels. Gradients flow to (init_state, z_seq)
    only (weights frozen — the TTO contract). Pass `kw = prep_weights(
    params)` to reuse the host-side weight preparation across calls."""
    if kw is None:
        kw = prep_weights(params)
    carry0, t2j = carry_from_state(init_state)
    T = z_seq.shape[1]
    z_steps = jnp.swapaxes(z_seq, 0, 1)          # (T, B, latent)
    outs = _rollout_kernel(kw, carry0, z_steps, t2j, T)
    # (T, B, ...) -> (B, T, ...)
    outs_bt = KOut(*[jnp.swapaxes(v, 0, 1) for v in outs])
    world = world_to_dict(outs_bt)
    return world, (outs_bt.pm, outs_bt.pv)


def kstep_scan_reference(params: Dict, init_state: Dict[str, jnp.ndarray],
                         z_seq: jnp.ndarray):
    """XLA lax.scan over kstep (same kernel-layout math, no Pallas) —
    the intermediate oracle separating layout/packing differences from
    kernel-lowering differences in tests."""
    kw = prep_weights(params)
    carry0, t2j = carry_from_state(init_state)

    def body(c, z):
        c2, out = kstep(kw, c, z, t2j)
        return c2, out

    _, outs = jax.lax.scan(body, carry0, jnp.swapaxes(z_seq, 0, 1))
    outs_bt = KOut(*[jnp.swapaxes(v, 0, 1) for v in outs])
    return world_to_dict(outs_bt), (outs_bt.pm, outs_bt.pv)
