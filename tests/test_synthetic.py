"""Synthetic scene generator: exact-geometry guarantees.

The generator's value is that its geometry is exact by construction; these
tests pin that: (1) cross-view photo-consistency under GT reprojection,
(2) depth consistency (projected depth matches the target view's z-buffer),
(3) the tuple contract train.py's collate expects, (4) stream/groundtruth
pairing.
"""

import numpy as np
import pytest

from droid_slam_tpu.data import synthetic


def _bilinear(img, x, y):
    H, W = img.shape[:2]
    x0 = np.clip(np.floor(x).astype(int), 0, W - 2)
    y0 = np.clip(np.floor(y).astype(int), 0, H - 2)
    dx = np.clip(x - x0, 0, 1)[..., None]
    dy = np.clip(y - y0, 0, 1)[..., None]
    return ((1 - dx) * (1 - dy) * img[y0, x0]
            + dx * (1 - dy) * img[y0, x0 + 1]
            + (1 - dx) * dy * img[y0 + 1, x0]
            + dx * dy * img[y0 + 1, x0 + 1])


class TestRenderConsistency:
    @pytest.fixture(scope="class")
    def pair(self):
        rng = np.random.default_rng(3)
        Rs, ts = synthetic.random_trajectory(2, rng, step=0.15,
                                             rot_step=0.03)
        intr = np.array([160.0, 160.0, 96.0, 64.0], np.float32)
        a = synthetic.render_view(Rs[0], ts[0], intr, (128, 192), seed=11)
        b = synthetic.render_view(Rs[1], ts[1], intr, (128, 192), seed=11)
        return Rs, ts, intr, a, b

    def _reproject(self, Rs, ts, intr, depth_a):
        """Pixels of view 0 -> (x, y, z_cam) in view 1, exact GT."""
        H, W = depth_a.shape
        fx, fy, cx, cy = intr
        u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32), indexing="xy")
        dc = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], -1)
        pts_w = ts[0] + (dc * depth_a[..., None]) @ Rs[0].T
        pts_c1 = (pts_w - ts[1]) @ Rs[1]
        z1 = pts_c1[..., 2]
        x1 = fx * pts_c1[..., 0] / z1 + cx
        y1 = fy * pts_c1[..., 1] / z1 + cy
        return x1, y1, z1

    def test_photo_consistency(self, pair):
        Rs, ts, intr, (img_a, dep_a), (img_b, _) = pair
        x1, y1, z1 = self._reproject(Rs, ts, intr, dep_a)
        H, W = dep_a.shape
        inb = (x1 >= 1) & (x1 < W - 2) & (y1 >= 1) & (y1 < H - 2) & (z1 > 0)
        sampled = _bilinear(img_b, x1, y1)
        err = np.abs(sampled - img_a)[inb]
        # the scene has no occlusions from inside the box; the only error is
        # bilinear interpolation of the procedural texture
        assert np.median(err) < 10.0
        assert err.mean() < 14.0

    def test_depth_consistency(self, pair):
        Rs, ts, intr, (_, dep_a), (_, dep_b) = pair
        x1, y1, z1 = self._reproject(Rs, ts, intr, dep_a)
        H, W = dep_a.shape
        inb = (x1 >= 1) & (x1 < W - 2) & (y1 >= 1) & (y1 < H - 2) & (z1 > 0)
        zb = _bilinear(dep_b[..., None], x1, y1)[..., 0]
        rel = (np.abs(zb - z1) / z1)[inb]
        assert np.median(rel) < 0.01

    def test_depth_positive_bounded(self, pair):
        _, _, _, (_, dep_a), _ = pair
        assert (dep_a > 0.05).all()
        assert (dep_a < 20.0).all()


class TestDatasetContract:
    def test_getitem_shapes_and_cache(self):
        db = synthetic.SyntheticBox(n_clips=2, n_frames=3,
                                    image_size=(64, 96), seed=5)
        images, poses, disps, intr = db[0]
        assert images.shape == (3, 64, 96, 3)
        assert poses.shape == (3, 7)
        assert disps.shape == (3, 64, 96)
        assert intr.shape == (3, 4)
        assert np.isfinite(images).all() and np.isfinite(disps).all()
        # unit quaternions
        assert np.allclose(np.linalg.norm(poses[:, 3:], axis=-1), 1, atol=1e-5)
        again = db[0]
        assert np.array_equal(again[0], images)
        # mutating a returned copy must not poison the cache
        again[0][:] = 0
        assert not np.array_equal(db[0][0], again[0])

    def test_se3_convention_roundtrip(self):
        """poses c2w as [t,q] must reproduce the rendering matrices through
        the repo's se3 (same convention as the TartanAir loader)."""
        import jax.numpy as jnp
        from droid_slam_tpu.lie import se3

        rng = np.random.default_rng(0)
        Rs, ts = synthetic.random_trajectory(3, rng)
        poses = synthetic.poses_c2w_from_mats(Rs, ts)
        # act on canonical basis points: R @ e + t
        e = np.eye(3, dtype=np.float32)
        for k in range(3):
            X = np.concatenate([e, np.ones((3, 1), np.float32)], 1)
            Y = np.asarray(se3.act(jnp.asarray(poses[k]), jnp.asarray(X)))
            assert np.allclose(Y[:, :3], (Rs[k] @ e.T).T + ts[k], atol=1e-5)

    def test_stream_matches_groundtruth(self):
        frames = list(synthetic.synthetic_stream(
            n_frames=3, image_size=(64, 96), seed=2))
        gt = synthetic.synthetic_groundtruth(
            n_frames=3, image_size=(64, 96), seed=2)
        assert len(frames) == 3
        assert gt.shape == (3, 7)
        t, img, intr = frames[0]
        assert img.shape == (1, 64, 96, 3) and img.dtype == np.uint8
        # same seed => same trajectory => re-rendering frame 0 from gt pose
        # must reproduce the streamed image
        rng = np.random.default_rng(2)
        scene_seed = int(rng.integers(1, 2 ** 20))
        Rs, ts_ = synthetic.random_trajectory(3, rng, step=0.10,
                                              rot_step=0.03)
        re_img, _ = synthetic.render_view(Rs[0], ts_[0], intr, (64, 96),
                                          seed=scene_seed)
        assert np.abs(re_img.astype(np.float32)
                      - img[0].astype(np.float32)).max() <= 1.0
