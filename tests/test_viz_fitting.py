"""RGB overlay viz: projection + overlay rendering."""

import os

import numpy as np

from humor_tpu.viz import fitting as VF


def test_project_to_image():
    pts = np.asarray([[[0.0, 0.0, 2.0], [1.0, 0.5, 2.0]]])
    uv = VF.project_to_image(pts, (500.0, 500.0), (320.0, 240.0))
    np.testing.assert_allclose(uv[0, 0], [320.0, 240.0])
    np.testing.assert_allclose(uv[0, 1], [570.0, 365.0])


def test_overlay_frames(tmp_path):
    rng = np.random.RandomState(0)
    joints = rng.randn(3, 22, 3).astype(np.float32) * 0.3
    joints[..., 2] += 3.0
    obs = np.concatenate(
        [rng.rand(3, 25, 2) * 500 + 200, np.ones((3, 25, 1))], axis=-1)
    paths = VF.overlay_skeleton_frames(
        joints, (500.0, 500.0), (960.0, 540.0), str(tmp_path),
        joints2d_obs=obs, make_video=False)
    assert len(paths) == 3
    assert all(os.path.getsize(p) > 1000 for p in paths)


# ------------------------------------------------------------- rasterizer

def test_rasterize_mesh_draws_shaded_pixels():
    from humor_tpu.viz import raster as R

    # a camera-facing square at z=2 made of two triangles
    verts = np.asarray([[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0],
                        [0.5, 0.5, 2.0], [-0.5, 0.5, 2.0]], np.float32)
    # wind so normals face the camera (-z): counter-clockwise in image
    faces = np.asarray([[0, 2, 1], [0, 3, 2]], np.int32)
    img = np.zeros((240, 320, 3), np.uint8)
    out = R.rasterize_mesh(img, verts, faces, (200.0, 200.0),
                           (160.0, 120.0))
    assert out[120, 160].sum() > 60          # body pixels shaded
    assert out[5, 5].sum() == 0              # background untouched
    # backfacing version draws nothing
    back = R.rasterize_mesh(img, verts, faces[:, ::-1], (200.0, 200.0),
                            (160.0, 120.0))
    assert back.sum() == 0


def test_rasterize_behind_camera_culled():
    from humor_tpu.viz import raster as R

    verts = np.asarray([[-0.5, -0.5, -2.0], [0.5, -0.5, -2.0],
                        [0.0, 0.5, -2.0]], np.float32)
    img = np.zeros((60, 80, 3), np.uint8)
    out = R.rasterize_mesh(img, verts, np.asarray([[0, 2, 1]]),
                           (50.0, 50.0), (40.0, 30.0))
    assert out.sum() == 0


def test_checkerboard_floor():
    from humor_tpu.viz import raster as R

    img = np.zeros((120, 160, 3), np.uint8)
    floor = np.asarray([0.0, -1.0, 0.0, -0.8], np.float32)  # y = 0.8
    out = R.draw_checkerboard_floor(img, floor, (100.0, 100.0),
                                    (80.0, 60.0), center_xz=(0.0, 3.0))
    assert out.sum() > 0
    # both tile shades present
    vals = np.unique(out[out.sum(-1) > 0].reshape(-1, 3)[:, 0])
    assert len(vals) >= 2


def test_render_mesh_over_frames(tmp_path):
    from humor_tpu.viz import raster as R

    rng = np.random.RandomState(0)
    verts0 = rng.rand(40, 3).astype(np.float32) * 0.4 - 0.2
    verts0[:, 2] += 2.5
    verts = np.stack([verts0, verts0 + [0.05, 0, 0]])
    faces = rng.randint(0, 40, (60, 3)).astype(np.int32)
    contacts = np.zeros((2, 40), np.float32)
    contacts[:, :10] = 1.0
    paths = R.render_mesh_over_frames(
        verts, faces, (200.0, 200.0), (160.0, 120.0), str(tmp_path),
        img_size=(320, 240),
        floor_plane=np.asarray([0.0, -1.0, 0.0, -0.6]),
        contact_verts=contacts, make_video=False)
    assert len(paths) == 2
    assert all(os.path.getsize(p) > 500 for p in paths)


def test_viz_stitched_mesh(tmp_path):
    """End-to-end: stitched npz + synthetic body -> mesh overlay frames."""
    import jax.numpy as jnp

    from humor_tpu.body_model.smpl import synthetic_smpl_model

    body = synthetic_smpl_model()
    T = 2
    rng = np.random.RandomState(1)
    npz = tmp_path / "stitched.npz"
    np.savez(npz,
             trans=np.tile([[0.0, 0.0, 2.5]], (T, 1)).astype(np.float32),
             root_orient=rng.randn(T, 3).astype(np.float32) * 0.1,
             pose_body=rng.randn(T, 63).astype(np.float32) * 0.1,
             betas=np.zeros(16, np.float32),
             contacts=np.zeros((T, 22), np.float32))
    paths = VF.viz_stitched_result(str(npz), str(tmp_path / "viz"),
                                   body=body, max_frames=T)
    mesh_frames = [p for p in paths if "mesh_" in os.path.basename(p)]
    assert len(mesh_frames) == T
    assert all(os.path.getsize(p) > 500 for p in mesh_frames)
