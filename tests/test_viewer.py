"""Headless tests for the interactive-viewer scene core (eval/viewer.py):
frustum glyphs, orbit-camera math, async two-video merge, scene assembly."""

from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp
import pytest

from droid_slam_tpu.eval.viewer import (OrbitCamera, ViewerScene, build_scene,
                                        frustum_segments, merge_videos,
                                        perspective_matrix,
                                        transform_segments)
from droid_slam_tpu.lie import se3


def test_frustum_segments_paired():
    segs = frustum_segments(scale=0.1)
    assert segs.ndim == 2 and segs.shape[1] == 3
    assert len(segs) % 2 == 0
    # apex rays: every other early vertex is the origin
    assert np.allclose(segs[0], 0)
    # all plane vertices at z = 1.5*scale (within the glyph depth)
    assert np.all(segs[:, 2] >= 0) and np.all(segs[:, 2] <= 0.15 + 1e-6)


def test_transform_segments_identity_and_shift():
    segs = frustum_segments()
    poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (2, 1)).astype(np.float32)
    poses[1, 0] = -3.0  # w2c translation => camera center at +3 in world x
    out = transform_segments(poses, segs)
    assert out.shape == (2 * len(segs), 3)
    np.testing.assert_allclose(out[:len(segs)], segs, atol=1e-6)
    np.testing.assert_allclose(out[len(segs):, 0], segs[:, 0] + 3.0,
                               atol=1e-5)


class TestOrbitCamera:
    def test_view_matrix_looks_at_target(self):
        cam = OrbitCamera(target=np.array([1.0, 2.0, 3.0]), radius=5.0,
                          yaw=0.7, pitch=0.3)
        V = cam.view_matrix()
        # target maps onto the -z axis at distance radius
        t_cam = V @ np.array([1.0, 2.0, 3.0, 1.0])
        np.testing.assert_allclose(t_cam[:2], 0, atol=1e-6)
        np.testing.assert_allclose(t_cam[2], -5.0, atol=1e-6)
        # rigid: upper 3x3 orthonormal
        R = V[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)

    def test_zoom_and_rotate_bounds(self):
        cam = OrbitCamera()
        r0 = cam.radius
        cam.zoom(1.0)
        assert cam.radius < r0
        for _ in range(100):
            cam.rotate(0, 10000)
        assert abs(cam.pitch) <= 1.55 + 1e-9

    def test_perspective_shape(self):
        P = perspective_matrix()
        assert P.shape == (4, 4) and P[3, 2] == -1.0


def _fake_video(poses, disps, intrinsics=None, images=None):
    t = len(poses)
    buf = SimpleNamespace(poses=jnp.asarray(poses, jnp.float32),
                          disps=jnp.asarray(disps, jnp.float32),
                          intrinsics=jnp.asarray(
                              intrinsics if intrinsics is not None
                              else np.tile([8.0, 8.0, 8.0, 6.0], (t, 1)),
                              jnp.float32))
    h, w = disps.shape[-2:]
    return SimpleNamespace(counter=t, buf=buf, h=h, w=w, buffer=t,
                           images=images or [None] * t)


class TestMergeVideos:
    def _traj(self, n, step=0.1):
        xi = np.zeros((n, 6), np.float32)
        xi[:, 0] = step * np.arange(n)
        return np.asarray(se3.exp(jnp.asarray(xi)))

    def test_front_only(self):
        poses = self._traj(6)
        disps = np.ones((6, 4, 4), np.float32)
        vf = _fake_video(poses, disps)
        p, d = merge_videos(vf, None)
        np.testing.assert_allclose(p, poses, atol=1e-6)
        assert d.shape == (6, 4, 4)

    def test_backend_authoritative_when_complete(self):
        poses = self._traj(6)
        disps = np.ones((6, 4, 4), np.float32)
        vf = _fake_video(poses, disps)
        vb = _fake_video(2.0 * poses, 2 * disps)
        p, _ = merge_videos(vf, vb)
        np.testing.assert_allclose(p, 2.0 * poses, atol=1e-6)

    def test_tail_aligned_into_backend_frame(self):
        n, t2 = 10, 6
        poses_f = self._traj(n)
        disps_f = np.full((n, 4, 4), 2.0, np.float32)
        # backend = frontend with uniform scale 2 on translations
        s_true = 2.0
        poses_b = poses_f[:t2].copy()
        poses_b[:, :3] *= s_true
        vf = _fake_video(poses_f, disps_f)
        vb = _fake_video(poses_b, disps_f[:t2] / s_true)
        p, d = merge_videos(vf, vb)
        assert p.shape == (n, 7)
        # the tail must land on the scaled trajectory
        expect = poses_f[t2:].copy()
        expect[:, :3] *= s_true
        np.testing.assert_allclose(p[t2:], expect, atol=1e-4)
        np.testing.assert_allclose(d[t2:], disps_f[t2:] / s_true, atol=1e-5)


def test_build_scene_smoke(rng):
    n, h, w = 5, 12, 16
    xi = np.zeros((n, 6), np.float32)
    xi[:, 0] = 0.05 * np.arange(n)
    poses = np.asarray(se3.exp(jnp.asarray(xi)))
    disps = (0.9 + 0.1 * rng.uniform(size=(n, h, w))).astype(np.float32)
    images = [rng.integers(0, 255, (h * 8, w * 8, 3)).astype(np.uint8)
              for _ in range(n)]
    video = _fake_video(poses, disps,
                        intrinsics=np.tile([16.0, 16.0, 8.0, 6.0], (n, 1)),
                        images=images)
    scene = build_scene(video)
    assert isinstance(scene, ViewerScene)
    assert scene.points.shape == (n * h * w, 3)
    assert scene.colors.shape == (n * h * w, 3)
    assert scene.alpha.shape == (n * h * w,)
    assert scene.cam_segments.shape[0] == n * len(frustum_segments())
    assert scene.colors.max() <= 1.0
    # a static fronto-parallel-ish scene: most points multiview-consistent
    assert scene.alpha.mean() > 0.2


def test_build_scene_too_few_frames():
    video = _fake_video(np.tile([0, 0, 0, 0, 0, 0, 1.0], (2, 1)),
                        np.ones((2, 4, 4), np.float32))
    assert build_scene(video) is None


class TestOffscreenRender:
    """The viewer actually draws frames (VERDICT r3 item 7): the software
    rasterizer runs the same MVP pipeline as the GL layer and must produce a
    non-trivial image from a synthetic reconstruction."""

    def _scene(self, rng):
        n, h, w = 5, 12, 16
        xi = np.zeros((n, 6), np.float32)
        xi[:, 0] = 0.05 * np.arange(n)
        poses = np.asarray(se3.exp(jnp.asarray(xi)))
        disps = (0.9 + 0.1 * rng.uniform(size=(n, h, w))).astype(np.float32)
        images = [rng.integers(40, 255, (h * 8, w * 8, 3)).astype(np.uint8)
                  for _ in range(n)]
        video = _fake_video(poses, disps,
                            intrinsics=np.tile([16.0, 16.0, 8.0, 6.0],
                                               (n, 1)),
                            images=images)
        return build_scene(video), video

    def test_render_offscreen_draws_points_and_cameras(self, rng):
        from droid_slam_tpu.eval.viewer import render_offscreen
        scene, _ = self._scene(rng)
        img = render_offscreen(scene, size=(120, 160))
        assert img.shape == (120, 160, 3) and img.dtype == np.uint8
        bg = np.array([0.09, 0.09, 0.10]) * 255
        nonbg = np.abs(img.astype(np.float32)
                       - bg[None, None]).max(axis=-1) > 8
        assert nonbg.mean() > 0.02          # something was drawn
        assert nonbg.mean() < 0.98          # ...on a visible background
        # frustum wireframes: near-white pixels present
        assert (img.min(axis=-1) > 225).sum() > 10
        # point colors: chromatic pixels from the random textures present
        chroma = img.astype(np.int32)
        assert ((chroma.max(-1) - chroma.min(-1)) > 25).sum() > 20

    def test_render_zbuffer_prefers_near(self):
        from droid_slam_tpu.eval.viewer import render_offscreen
        # two points on the same ray: red near, green far
        cam = OrbitCamera(target=np.zeros(3), radius=2.0, yaw=0.0, pitch=0.0)
        eye = cam.eye
        d = -eye / np.linalg.norm(eye)
        pts = np.stack([eye + 1.2 * d, eye + 1.8 * d]).astype(np.float32)
        scene = ViewerScene(points=pts,
                            colors=np.array([[1, 0, 0], [0, 1, 0]],
                                            np.float32),
                            alpha=np.ones(2, np.float32),
                            cam_segments=np.zeros((0, 3), np.float32))
        img = render_offscreen(scene, camera=cam, size=(64, 64))
        reds = (img[..., 0] > 200) & (img[..., 1] < 50)
        greens = (img[..., 1] > 200) & (img[..., 0] < 50)
        assert reds.sum() == 1 and greens.sum() == 0

    def test_alpha_discard(self):
        from droid_slam_tpu.eval.viewer import render_offscreen
        cam = OrbitCamera(target=np.zeros(3), radius=2.0)
        scene = ViewerScene(points=np.zeros((3, 3), np.float32),
                            colors=np.ones((3, 3), np.float32),
                            alpha=np.zeros(3, np.float32),
                            cam_segments=np.zeros((0, 3), np.float32))
        img = render_offscreen(scene, camera=cam, size=(32, 32))
        assert (img.min(axis=-1) > 225).sum() == 0   # all discarded

    def test_save_screenshot_writes_png(self, rng, tmp_path):
        from droid_slam_tpu.eval.viewer import save_screenshot
        _, video = self._scene(rng)
        out = tmp_path / "recon.png"
        assert save_screenshot(out, video)
        import cv2
        back = cv2.imread(str(out))
        assert back is not None and back.shape == (480, 640, 3)
