"""Fitting geometry + robust weighting: plane math invariants,
cam2prior round trips, projection sanity, bisquare/MAD behavior,
VPoser encode/decode shapes and rotation validity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from humor_tpu.fitting import geometry as geo
from humor_tpu.fitting import robust as rob
from humor_tpu.models import vposer as vp
from humor_tpu.ops import transforms


# ---------------------------------------------------------------- geometry

def test_plane_intersection():
    # floor y = -1 in camera frame (normal -y up), ray straight down from origin
    plane = jnp.asarray([[0.0, -1.0, 0.0, 1.0]])  # -y = 1 -> y = -1
    point = jnp.zeros((1, 3))
    direction = jnp.asarray([[0.0, 1.0, 0.0]])  # pointing down (+y)
    itsct, s = geo.compute_plane_intersection(point, direction, plane)
    np.testing.assert_allclose(np.asarray(itsct), [[0.0, -1.0, 0.0]],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), [-1.0], atol=1e-6)


def test_parse_floor_plane_round_trip():
    n = jnp.asarray([[0.1, -0.9, 0.2]])
    n = n / jnp.linalg.norm(n)
    d = jnp.asarray([1.7])
    plane3 = geo.make_floor_plane_3d(n, d)
    plane4 = geo.parse_floor_plane(plane3)
    np.testing.assert_allclose(np.asarray(plane4[:, :3]), np.asarray(n),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(plane4[:, 3]), np.asarray(d),
                               atol=1e-6)


def test_parse_floor_plane_flips_down_normal():
    # a normal with +y (down in camera frame) must be flipped
    plane3 = jnp.asarray([[0.0, 2.0, 0.0]])
    plane4 = geo.parse_floor_plane(plane3)
    assert float(plane4[0, 1]) < 0
    assert float(plane4[0, 3]) < 0


def test_cam2prior_properties():
    # camera frame: -y up. body at trans, upright (identity root orient
    # means body x left/-x right in our convention)
    B = 3
    rng = np.random.RandomState(0)
    floor = jnp.asarray([[0.0, -1.0, 0.0]] * B) * 1.5  # floor y = -1.5? no:
    # opt-form = normal * offset; normal (0,-1,0), offset 1.5 -> y = -1.5
    # camera -y is up: y < -1.5 places the body ABOVE the y=-1.5 floor
    trans = jnp.asarray(rng.randn(B, 3) * 0.1 + [0.0, -2.5, 3.0],
                        jnp.float32)
    root_orient = jnp.asarray(rng.randn(B, 3) * 0.2, jnp.float32)
    joints = jnp.tile(trans[:, None], (1, 22, 1))

    R, t, h = geo.compute_cam2prior(floor, trans, root_orient, joints)
    # R orthonormal
    RtR = np.einsum("bij,bik->bjk", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (B, 1, 1)),
                               atol=1e-5)
    # up axis maps to prior z: R @ (-y up) == +z
    up_cam = np.asarray([[0.0, -1.0, 0.0]] * B)
    up_prior = np.einsum("bij,bj->bi", np.asarray(R), up_cam)
    np.testing.assert_allclose(up_prior, np.tile([0, 0, 1.0], (B, 1)),
                               atol=1e-4)
    # root height: trans sits |y+1.5| above floor along -normal direction
    expect_h = np.abs(np.asarray(trans)[:, 1] + 1.5)
    np.testing.assert_allclose(np.asarray(h)[:, 0], expect_h, atol=1e-4)


def test_apply_cam2prior_round_trip():
    B, T = 2, 5
    rng = np.random.RandomState(1)
    trans = jnp.asarray(rng.randn(B, T, 3), jnp.float32)
    orient = jnp.asarray(rng.randn(B, T, 3) * 0.5, jnp.float32)
    floor = jnp.asarray([[0.05, -1.0, 0.02]] * B, jnp.float32)
    key_idx = jnp.zeros((B,), jnp.int32)
    R, t, h = geo.compute_cam2prior(
        floor, trans[:, 0], orient[:, 0],
        jnp.tile(trans[:, 0][:, None], (1, 22, 1)))

    fwd = geo.apply_cam2prior(trans, orient, R, t, h, key_idx,
                              smpl_root_joint_fn=None)
    back = geo.apply_cam2prior(fwd["trans"], fwd["root_orient"], R, t, h,
                               key_idx, inverse=True)
    # orientations must round trip exactly
    r1 = transforms.aa_to_rotmat(orient)
    r2 = transforms.aa_to_rotmat(back["root_orient"])
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-4)
    # translation round trip: forward (no height offset) then inverse
    # restores original relative trajectory shape
    rel0 = np.asarray(trans) - np.asarray(trans)[:, 0:1]
    rel1 = np.asarray(back["trans"]) - np.asarray(back["trans"])[:, 0:1]
    np.testing.assert_allclose(rel1, rel0, atol=1e-4)


def test_perspective_projection_center():
    # a point on the optical axis projects to the camera center
    pts = jnp.asarray([[[0.0, 0.0, 2.0]]])
    eye = jnp.eye(3)[None]
    zero = jnp.zeros((1, 3))
    f = jnp.asarray([[500.0, 500.0]])
    c = jnp.asarray([[320.0, 240.0]])
    uv = geo.perspective_projection(pts, eye, zero, f, c)
    np.testing.assert_allclose(np.asarray(uv), [[[320.0, 240.0]]],
                               atol=1e-4)
    # a point 1m right at 2m depth: u = 320 + 500*0.5
    pts2 = jnp.asarray([[[1.0, 0.0, 2.0]]])
    uv2 = geo.perspective_projection(pts2, eye, zero, f, c)
    np.testing.assert_allclose(np.asarray(uv2), [[[570.0, 240.0]]],
                               atol=1e-4)


# ------------------------------------------------------------------ robust

def test_robust_std_mad():
    res = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 100.0]])
    std = rob.robust_std(res)
    # median 3, abs dev [2,1,0,1,97], MAD 1 -> std = 1/0.67449
    np.testing.assert_allclose(np.asarray(std), [[1.0 / 0.67449]],
                               rtol=1e-5)


def test_bisquare_outliers_zeroed():
    # inliers need spread: MAD of constant residuals is 0, which
    # legitimately degenerates bisquare (same as the reference)
    rng = np.random.RandomState(3)
    res = jnp.asarray([np.concatenate([rng.rand(20) * 0.2,
                                       [50.0]])]).astype(jnp.float32)
    w = rob.bisquare_robust_weights(res)
    assert float(w[0, -1]) == 0.0
    assert np.all(np.asarray(w[0, :20]) > 0.2)
    assert np.mean(np.asarray(w[0, :20])) > 0.6


def test_apply_robust_weighting_no_weight_grad():
    res = jnp.asarray(np.random.RandomState(2).rand(2, 30), jnp.float32)

    def loss(r):
        wr, _ = rob.apply_robust_weighting(r)
        return jnp.sum(wr)

    g = jax.grad(loss)(res)
    # gradient of w*r^2 with w detached = 2*w*r
    _, w = rob.apply_robust_weighting(res)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * w * res),
                               rtol=1e-4)


def test_masked_median_matches_dense():
    rng = np.random.RandomState(7)
    x = rng.rand(3, 40).astype(np.float32)
    mask = rng.rand(3, 40) > 0.4
    mask[0] = True  # one fully-visible row
    got = np.asarray(rob.masked_median(jnp.asarray(x), jnp.asarray(mask)))
    for i in range(3):
        np.testing.assert_allclose(got[i, 0], np.median(x[i, mask[i]]),
                                   rtol=1e-6)


def test_robust_scale_ignores_padding():
    """Padded (masked-out) 1e6-scale fake residuals must not perturb the
    MAD scale (ADVICE r1: padding was inflating/capturing the median and
    silently disabling outlier rejection)."""
    rng = np.random.RandomState(3)
    real = np.concatenate([rng.rand(20).astype(np.float32) * 0.2, [50.0]])
    padded = np.concatenate([real, np.full(30, 1e6, np.float32)])
    mask = np.concatenate([np.ones(21, bool), np.zeros(30, bool)])

    w_clean = rob.bisquare_robust_weights(jnp.asarray(real[None]))
    w_mask = rob.bisquare_robust_weights(jnp.asarray(padded[None]),
                                         mask=jnp.asarray(mask[None]))
    # same weights on the real residuals as the padding-free computation
    np.testing.assert_allclose(np.asarray(w_mask[0, :21]),
                               np.asarray(w_clean[0]), rtol=1e-5)
    assert float(w_mask[0, 20]) == 0.0  # outlier still rejected
    # without the mask the padding majority captures the median and the
    # MAD collapses to 0 -> every REAL residual is wrongly rejected
    w_bad = rob.bisquare_robust_weights(jnp.asarray(padded[None]))
    assert float(np.max(np.asarray(w_bad[0, :20]))) == 0.0
    assert float(np.min(np.asarray(w_mask[0, :20]))) > 0.0


def test_gmof_saturates():
    r = jnp.asarray([0.0, 1.0, 100.0])
    out = rob.gmof(r, sigma=2.0)
    np.testing.assert_allclose(float(out[0]), 0.0)
    assert float(out[2]) < 4.01  # saturates at sigma^2


# ------------------------------------------------------------------ vposer

def test_vposer_shapes_and_rotations():
    cfg = vp.VPoserConfig()
    params = vp.init_params(cfg, jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.latent_dim))
    pose = vp.latent2pose(cfg, params, z)
    assert pose.shape == (4, 63)
    mats = vp.decode_matrot(cfg, params, z).reshape(4, 21, 3, 3)
    RtR = np.einsum("bjik,bjil->bjkl", np.asarray(mats), np.asarray(mats))
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (4, 21, 1, 1)),
                               atol=1e-5)
    z_back = vp.pose2latent(cfg, params, pose)
    assert z_back.shape == (4, cfg.latent_dim)


def test_vposer_torch_import():
    torch = __import__("torch")
    cfg = vp.VPoserConfig()
    h, l, p = cfg.hidden, cfg.latent_dim, cfg.pose_dim
    sd = {}
    g = torch.Generator().manual_seed(0)
    def lin(name, i, o):
        sd[f"{name}.weight"] = torch.randn(o, i, generator=g) * 0.05
        sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.05
    def bn(name, n):
        sd[f"{name}.weight"] = torch.rand(n, generator=g) + 0.5
        sd[f"{name}.bias"] = torch.randn(n, generator=g) * 0.1
        sd[f"{name}.running_mean"] = torch.randn(n, generator=g) * 0.1
        sd[f"{name}.running_var"] = torch.rand(n, generator=g) + 0.5
        sd[f"{name}.num_batches_tracked"] = torch.tensor(100)
    bn("bodyprior_enc_bn1", p); lin("bodyprior_enc_fc1", p, h)
    bn("bodyprior_enc_bn2", h); lin("bodyprior_enc_fc2", h, h)
    lin("bodyprior_enc_mu", h, l); lin("bodyprior_enc_logvar", h, l)
    lin("bodyprior_dec_fc1", l, h); lin("bodyprior_dec_fc2", h, h)
    lin("bodyprior_dec_out", h, 21 * 6)

    params = vp.from_torch_state_dict(sd)

    # torch-side forward of the same architecture
    import torch.nn.functional as F
    x = torch.randn(3, 63, generator=g)
    def t_bn(name, v):
        return F.batch_norm(v, sd[f"{name}.running_mean"],
                            sd[f"{name}.running_var"],
                            sd[f"{name}.weight"], sd[f"{name}.bias"],
                            training=False)
    def t_lin(name, v):
        return v @ sd[f"{name}.weight"].T + sd[f"{name}.bias"]
    hdn = F.leaky_relu(t_lin("bodyprior_enc_fc1", t_bn("bodyprior_enc_bn1", x)), 0.2)
    hdn = F.leaky_relu(t_lin("bodyprior_enc_fc2", t_bn("bodyprior_enc_bn2", hdn)), 0.2)
    mu_t = t_lin("bodyprior_enc_mu", hdn)

    mu_j, _ = vp.encode(cfg, params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_slice_observations_schema_dispatch():
    """Regression: slicing must dispatch on TIME_INDEXED_OBS_KEYS, not on
    shape — floor_plane (B, 3) must survive nsteps slicing even when the
    window length T equals its trailing dim (T == 3)."""
    import jax.numpy as jnp
    from humor_tpu.fitting import energies as E
    from humor_tpu.fitting.optimizer import slice_observations

    B, T, n = 2, 3, 2
    observed = {
        "joints3d": jnp.zeros((B, T, 22, 3)),
        "points3d": jnp.zeros((B, T, 16, 3)),
        "floor_plane": jnp.ones((B, 3)),       # K == T == 3 trap
        "cam_f": jnp.ones((B, 2)),
        "cam_center": jnp.ones((B, 2)),
        "seq_interval": jnp.zeros((B, 2), jnp.int32),
        "prev_batch_overlap_res": {"verts3d": jnp.zeros((T, 4, 3))},
    }
    out = slice_observations(observed, n)
    assert out["joints3d"].shape == (B, n, 22, 3)
    assert out["points3d"].shape == (B, n, 16, 3)
    for k in ("floor_plane", "cam_f", "cam_center", "seq_interval"):
        assert out[k].shape == observed[k].shape, k
    assert out["prev_batch_overlap_res"] is observed["prev_batch_overlap_res"]
    # schema stays in sync with the energies' data-term keys
    assert E.TIME_INDEXED_OBS_KEYS == frozenset(
        {"joints3d", "verts3d", "points3d", "joints2d"})
