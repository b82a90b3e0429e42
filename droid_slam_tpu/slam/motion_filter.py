"""MotionFilter: per-frame admission gate + feature extraction.

Parity with /root/reference/droid_slam/motion_filter.py:19-91: run fnet on
every incoming frame, estimate flow vs the last keyframe with a single
zero-flow GRU iteration over the correlation volume, and admit the frame as a
keyframe when the mean flow-correction magnitude exceeds the threshold.
Feature nets run in bf16 (the reference's CUDA autocast islands,
motion_filter.py:39-51); geometry stays fp32.

Pipelining: the admission decision for frame t is *dispatched* when frame t
arrives but *resolved* when frame t+1 arrives (`track_begin` / `track_finish`
split, driven by the Droid facade). The result vector is copied to the host
asynchronously while the device works on the next frontend update, so the
blocking read a frame later is nearly free — the tunnel deployment pays
~30-100 ms for a cold host sync but ~3 ms for a prefetched one.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..geom import projective as pops
from ..models import nets
from ..ops import corr as corr_ops
from ..lie import se3


@jax.jit
def _encode_all(params, images_bgr):
    """fnet+cnet on a (possibly stereo) frame stack [C,H,W,3] uint8."""
    fmap, net, inp = nets.extract_features(params, images_bgr,
                                           compute_dtype=jnp.bfloat16)
    return fmap, net, inp


def _encode_fnet_raw(params, images_bgr):
    x = nets.normalize_images(images_bgr).astype(jnp.bfloat16)
    return nets.basic_encoder(params, "fnet", x, "instance")


_encode_fnet = jax.jit(_encode_fnet_raw)


def _encode_delta_traced(params, images_bgr, fmap_prev, net_prev, inp_prev):
    """fnet/cnet encode + zero-flow admission delta (no distance probe):
    the encode half of `_encode_and_delta_traced`, used by the split
    frame pipeline where the probe runs with the update."""
    gmap = _encode_fnet_raw(params, images_bgr)
    x = nets.normalize_images(images_bgr[:1]).astype(jnp.bfloat16)
    cmap = nets.basic_encoder(params, "cnet", x, "none")
    net_c, inp_c = jnp.split(cmap, 2, axis=-1)
    net, inp = jnp.tanh(net_c), jax.nn.relu(inp_c)

    h, w = gmap.shape[1], gmap.shape[2]
    coords0 = pops.coords_grid(h, w)[None]
    # bf16 volume + lookup (the reference's CUDA autocast island,
    # motion_filter.py:39-51); the zero-flow lookup feeds a bf16 GRU anyway
    pyramid = corr_ops.build_pyramid(fmap_prev[:1].astype(jnp.bfloat16),
                                     gmap[0][None].astype(jnp.bfloat16))
    corr = corr_ops.lookup_pyramid(pyramid, coords0).astype(jnp.bfloat16)
    _, delta, _ = nets.update_module(params, net_prev[None], inp_prev[None],
                                     corr)
    dn = jnp.mean(jnp.linalg.norm(delta.astype(jnp.float32), axis=-1))
    return gmap, net[0], inp[0], dn


def _encode_and_delta_traced(params, images_bgr, fmap_prev, net_prev,
                             inp_prev, poses, disps, intr0, pair_ii, pair_jj,
                             beta):
    """ONE dispatch per incoming frame (motion_filter.py:62-88 fused):
      * fnet on the (possibly stereo) frame stack;
      * cnet on the primary view (needed only if the frame is admitted —
        computing it unconditionally costs ~3 ms but saves a dispatch and
        a second encode on the admit path);
      * one zero-flow update iteration against the last keyframe -> mean
        ||delta|| admission statistic;
      * the proximity frame-distance probe the frontend will need if this
        frame is admitted (speculative; avoids another sync round trip).

    Returns (gmap [C,h,w,128], net [h,w,128], inp [h,w,128],
    merged [1+P]) where merged[0] is the mean ||delta|| and merged[1:] the
    pairwise distances.

    All indexing of persistent device state (last-keyframe fmap stack,
    intrinsics row 0) happens INSIDE this program: eager indexing on the
    host would each cost a ~15-20 ms dispatch on the tunnel deployment."""
    gmap, net, inp, dn = _encode_delta_traced(params, images_bgr, fmap_prev,
                                              net_prev, inp_prev)

    from ..geom import distance as gdist
    d = gdist.frame_distance(poses, disps, intr0[0], pair_ii, pair_jj, beta,
                             bidirectional=True)
    return gmap, net, inp, jnp.concatenate([dn[None], d])


_encode_and_delta = jax.jit(_encode_and_delta_traced)


class MotionFilter:
    def __init__(self, params, video, thresh: float = 2.5,
                 proximity_probe=None):
        self.params = params
        self.video = video
        self.thresh = thresh
        self.count = 0
        self.fmap = None
        self.net = None
        self.inp = None
        # callable () -> (pair_ii, pair_jj, beta) for the frontend's next
        # proximity proposal; the distances are computed speculatively in the
        # same dispatch as the admission test (one sync instead of two)
        self.proximity_probe = proximity_probe
        self.pending_distance = None
        self._pending = None
        self._pb_bucket = 64  # sticky pair-table bucket (compile stability)

    def _pair_tables(self):
        """Padded probe tables (sticky bucket for compile stability)."""
        if self.proximity_probe is not None:
            pair_ii, pair_jj, beta = self.proximity_probe()
        else:
            pair_ii, pair_jj, beta = np.zeros(1, np.int64), \
                np.zeros(1, np.int64), 0.3
        n_pairs = len(pair_ii)
        while self._pb_bucket < n_pairs:
            self._pb_bucket *= 2
        pb = self._pb_bucket
        pi = np.zeros(pb, np.int64); pi[:n_pairs] = pair_ii
        pj = np.zeros(pb, np.int64); pj[:n_pairs] = pair_jj
        return pi, pj, np.float32(beta), n_pairs

    def track_begin(self, tstamp, image, depth=None, intrinsics=None,
                    defer=False):
        """Dispatch the admission test (fnet+cnet + zero-flow GRU +
        speculative proximity distances) WITHOUT syncing — resolved by
        track_finish when the NEXT frame arrives. With `defer`, the encode
        inputs are returned for the single-dispatch frame program and the
        caller completes the stash via track_begin_complete."""
        image = np.asarray(image)
        if image.ndim == 3:
            image = image[None]

        if self.video.counter == 0 and self._pending is None:
            gmap = _encode_fnet(self.params, image)  # [C,h,w,128]
            _, net, inp = _encode_all(self.params, image[:1])
            self.fmap, self.net, self.inp = gmap, net[0], inp[0]
            # first frame always admitted: pose=Id, disp=1 (mf.py:69-72)
            self.video.append(
                tstamp, image=image[0], pose=se3.identity(),
                disp=1.0, depth=depth,
                intrinsics=np.asarray(intrinsics) / 8.0,
                fmap=gmap, net=net[0], inp=inp[0])
            return None

        pi, pj, beta, n_pairs = self._pair_tables()
        if defer:
            self._pending = (tstamp, image, depth, intrinsics, None, None,
                             None, None, n_pairs)
            return image, pi, pj, beta

        buf = self.video.buf
        gmap, net, inp, merged = _encode_and_delta(
            self.params, image, self.fmap, self.net, self.inp,
            buf.poses, buf.disps, buf.intrinsics,
            pi, pj, beta)
        try:
            merged.copy_to_host_async()
        except Exception:
            pass
        self._pending = (tstamp, image, depth, intrinsics, gmap, net, inp,
                         merged, n_pairs)
        return None

    def track_begin_dispatch(self, enc):
        """Run the deferred encode eagerly (fallback path)."""
        image, pi, pj, beta = enc
        buf = self.video.buf
        gmap, net, inp, merged = _encode_and_delta(
            self.params, image, self.fmap, self.net, self.inp,
            buf.poses, buf.disps, buf.intrinsics, pi, pj, beta)
        self.track_begin_complete(gmap, net, inp, merged)

    def track_begin_complete(self, gmap, net, inp, merged=None):
        """Fill the deferred stash with the frame program's outputs
        (merged=None when the caller owns the combined readback vector)."""
        (tstamp, image, depth, intrinsics, _, _, _, _, n_pairs) = self._pending
        self._pending = (tstamp, image, depth, intrinsics, gmap, net, inp,
                         merged, n_pairs)
        if merged is not None:
            try:
                merged.copy_to_host_async()
            except Exception:
                pass

    def track_finish(self, defer=False, resolved=None):
        """Resolve the pending admission test (prefetched sync) and append
        the frame when admitted. Returns True when a keyframe was added, or
        with `defer` the (index, values, fields) write tables for the
        single-dispatch frame program (index = sentinel when rejected, so
        the fused write is dropped and the compile key stays stable).
        `resolved`: (delta, distances) already read back by the caller."""
        if self._pending is None:
            admitted = self.video.counter > 0 and self.count == 0
            return None if defer else admitted
        (tstamp, image, depth, intrinsics, gmap, net, inp, merged,
         n_pairs) = self._pending
        self._pending = None

        if resolved is not None:
            delta, dists = resolved
        else:
            merged = np.asarray(merged)  # ONE (prefetched) sync round trip
            delta = float(merged[0])
            dists = merged[1:]
        self.pending_distance = np.asarray(dists)[:n_pairs]
        if delta > self.thresh:
            self.count = 0
            self.fmap, self.net, self.inp = gmap, net, inp
            out = self.video.append(
                tstamp, image=image[0], pose=None, disp=None, depth=depth,
                intrinsics=np.asarray(intrinsics) / 8.0,
                fmap=gmap, net=net, inp=inp, defer=defer)
            return out if defer else True
        self.count += 1
        if defer:
            # rejected: identical fields, out-of-range index (write dropped)
            index, values, fields = self.video.set_frame(
                self.video.counter, tstamp, pose=None, disp=None,
                depth=depth, intrinsics=np.asarray(intrinsics) / 8.0,
                fmap=gmap, net=net, inp=inp, defer=True)
            self.video.counter -= 1  # set_frame bumped it; undo
            self.video.dirty[index] = False
            return self.video.buffer + 1, values, fields
        return False

    def track(self, tstamp, image, depth=None, intrinsics=None):
        """motion_filter.py:52-91 (non-pipelined convenience wrapper)."""
        self.track_begin(tstamp, image, depth, intrinsics)
        self.track_finish()
