"""MotionFilter: per-frame admission gate + feature extraction.

Parity with /root/reference/droid_slam/motion_filter.py:19-91: run fnet on
every incoming frame, estimate flow vs the last keyframe with a single
zero-flow GRU iteration over the correlation volume, and admit the frame as a
keyframe when the mean flow-correction magnitude exceeds the threshold.
Feature nets run in bf16 (the reference's CUDA autocast islands,
motion_filter.py:39-51); geometry stays fp32.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..geom import projective as pops
from ..models import nets
from ..ops import corr as corr_ops
from ..lie import se3


@partial(jax.jit, static_argnames=())
def _encode_all(params, images_bgr):
    """fnet+cnet on a (possibly stereo) frame stack [C,H,W,3] uint8."""
    fmap, net, inp = nets.extract_features(params, images_bgr,
                                           compute_dtype=jnp.bfloat16)
    return fmap, net, inp


def _encode_fnet_raw(params, images_bgr):
    x = nets.normalize_images(images_bgr).astype(jnp.bfloat16)
    return nets.basic_encoder(params, "fnet", x, "instance")


_encode_fnet = jax.jit(_encode_fnet_raw)


@jax.jit
def _encode_and_delta(params, images_bgr, fmap_prev, net_prev, inp_prev):
    """fnet on the incoming frame + one zero-flow update iteration against
    the last keyframe (motion_filter.py:66-81), fused into one dispatch.
    Returns (gmap [C,h,w,128], mean ||delta||)."""
    gmap = _encode_fnet_raw(params, images_bgr)
    h, w = gmap.shape[1], gmap.shape[2]
    coords0 = pops.coords_grid(h, w)[None]
    pyramid = corr_ops.build_pyramid(fmap_prev[None].astype(jnp.float32),
                                     gmap[0][None].astype(jnp.float32))
    corr = corr_ops.lookup_pyramid(pyramid, coords0).astype(jnp.bfloat16)
    _, delta, _ = nets.update_module(params, net_prev[None], inp_prev[None],
                                     corr)
    return gmap, jnp.mean(jnp.linalg.norm(delta.astype(jnp.float32), axis=-1))


class MotionFilter:
    def __init__(self, params, video, thresh: float = 2.5):
        self.params = params
        self.video = video
        self.thresh = thresh
        self.count = 0
        self.fmap = None
        self.net = None
        self.inp = None

    def track(self, tstamp, image, depth=None, intrinsics=None):
        """image: [C,H,W,3] uint8 BGR host array (C=1 mono, 2 stereo);
        intrinsics: [4] full-resolution (divided by 8 on store,
        motion_filter.py:72)."""
        image = np.asarray(image)
        if image.ndim == 3:
            image = image[None]
        img_dev = jnp.asarray(image)

        if self.video.counter == 0:
            gmap = _encode_fnet(self.params, img_dev)  # [C,h,w,128]
            _, net, inp = _encode_all(self.params, img_dev[:1])
            self.fmap, self.net, self.inp = gmap, net[0], inp[0]
            # first frame always admitted: pose=Id, disp=1 (mf.py:69-72)
            self.video.append(
                tstamp, image=image[0], pose=se3.identity(),
                disp=1.0, depth=depth,
                intrinsics=np.asarray(intrinsics) / 8.0,
                fmap=gmap, net=net[0], inp=inp[0])
            return

        gmap, delta = _encode_and_delta(self.params, img_dev, self.fmap[0],
                                        self.net, self.inp)
        delta = float(delta)
        if delta > self.thresh:
            self.count = 0
            _, net, inp = _encode_all(self.params, img_dev[:1])
            self.fmap, self.net, self.inp = gmap, net[0], inp[0]
            self.video.append(
                tstamp, image=image[0], pose=None, disp=None, depth=depth,
                intrinsics=np.asarray(intrinsics) / 8.0,
                fmap=gmap, net=net[0], inp=inp[0])
        else:
            self.count += 1
