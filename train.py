"""Training CLI: data-parallel DroidNet training on TartanAir.

Parity with /root/reference/train.py (flags at train.py:147-170), re-expressed
for a TPU device mesh: the DDP/NCCL loop becomes one jitted shard_map step
with psum-averaged gradients over the 'dp' mesh axis.
"""

import argparse
import os
import pickle
import time

import numpy as np


def _np_pose_inv(g):
    """Numpy SE3 inverse ([tx..tz,qx..qz,qw]), same math as lie.se3.inv —
    kept on the host so collate never issues an eager device op: an eager
    dispatch queues behind the in-flight train step on the single chip and
    would serialize the data pipeline against device compute."""
    qv, w = g[..., 3:6], g[..., 6:7]
    v = g[..., :3]
    uv = 2.0 * np.cross(-qv, v)
    t = -(v + w * uv + np.cross(-qv, uv))
    return np.concatenate([t, -qv, w], axis=-1).astype(np.float32)


def collate(samples, edges_ii, edges_jj):
    images = np.stack([s[0] for s in samples])  # [B,N,H,W,3] BGR f32
    poses_c2w = np.stack([s[1] for s in samples])
    disps = np.stack([s[2] for s in samples])
    intrinsics = np.stack([s[3] for s in samples])
    # Ps = w2c (train.py:83)
    Ps = _np_pose_inv(poses_c2w)
    return {
        "images": images.astype(np.uint8),
        "poses": Ps.astype(np.float32),
        "disps": disps.astype(np.float32),
        "intrinsics": intrinsics.astype(np.float32),
        "ii": np.asarray(edges_ii),
        "jj": np.asarray(edges_jj),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", default="droid_tpu")
    parser.add_argument("--ckpt", help="checkpoint to restore")
    parser.add_argument("--datasets", nargs="+", default=["tartan"])
    parser.add_argument("--datapath", default="datasets/TartanAir")
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--iters", type=int, default=15)
    parser.add_argument("--steps", type=int, default=250000)
    parser.add_argument("--lr", type=float, default=0.00025)
    parser.add_argument("--clip", type=float, default=2.5)
    parser.add_argument("--n_frames", type=int, default=7)
    parser.add_argument("--w1", type=float, default=10.0)
    parser.add_argument("--w2", type=float, default=0.01)
    parser.add_argument("--w3", type=float, default=0.05)
    parser.add_argument("--fmin", type=float, default=8.0)
    parser.add_argument("--fmax", type=float, default=96.0)
    parser.add_argument("--edges", type=int, default=24)
    parser.add_argument("--restart_prob", type=float, default=0.2)
    parser.add_argument("--devices", type=int, default=None)
    parser.add_argument("--synthetic_clips", type=int, default=64,
                        help="clip-bank size for --datasets synthetic")
    parser.add_argument("--synthetic_step", type=float, default=0.22,
                        help="synthetic camera translation step "
                             "(motion difficulty)")
    parser.add_argument("--synthetic_rot_step", type=float, default=0.05,
                        help="synthetic camera rotation step")
    parser.add_argument("--image_size", type=int, nargs=2,
                        default=[384, 512],
                        help="clip resolution for --datasets synthetic")
    parser.add_argument("--ckpt_every", type=int, default=10000)
    parser.add_argument("--resume",
                        help="full train-state .pkl to resume from "
                             "(params + optimizer + step)")
    parser.add_argument("--state_every", type=int, default=250,
                        help="resumable train-state checkpoint interval")
    parser.add_argument("--log_every", type=int, default=25,
                        help="per-step progress print interval (the Logger's "
                             "running means print every 100 regardless)")
    args = parser.parse_args()

    import jax
    from droid_slam_tpu.data.graph_utils import (build_frame_graph,
                                                 graph_to_edge_list)
    from droid_slam_tpu.data.tartan import TartanAir
    from droid_slam_tpu.models import weights as weights_io
    from droid_slam_tpu.parallel.mesh import (data_parallel_mesh, replicate,
                                              shard_batch)
    from droid_slam_tpu.train.logger import Logger
    from droid_slam_tpu.train.trainer import (TrainConfig, init_train_state,
                                              make_train_step)

    cfg = TrainConfig(lr=args.lr, steps=args.steps, iters=args.iters,
                      clip=args.clip, n_frames=args.n_frames, w1=args.w1,
                      w2=args.w2, w3=args.w3, edges=args.edges,
                      restart_prob=args.restart_prob, fmin=args.fmin,
                      fmax=args.fmax)

    mesh = data_parallel_mesh(args.devices)
    start_step = 0
    if args.resume and os.path.exists(args.resume):
        params, opt_state, start_step = weights_io.load_train_state(
            args.resume)
        print(f"resumed {args.resume} at step {start_step}", flush=True)
    else:
        params = weights_io.load(args.ckpt) if args.ckpt else None
        params, opt_state = init_train_state(cfg, params=params)
    step_fn, _ = make_train_step(mesh, cfg)
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)

    if "synthetic" in args.datasets:
        # procedural exact-geometry scenes (no dataset download needed);
        # see droid_slam_tpu/data/synthetic.py
        from droid_slam_tpu.data.synthetic import SyntheticBox
        db = SyntheticBox(n_clips=args.synthetic_clips,
                          n_frames=args.n_frames,
                          image_size=tuple(args.image_size),
                          step=args.synthetic_step,
                          rot_step=args.synthetic_rot_step)
    else:
        # crop_size <- --image_size (reference train.py crops TartanAir to
        # 384x512; smaller values give reduced-res runs e.g. for fixtures);
        # the covisibility index cache lives WITH the dataset so switching
        # --datapath can never pick up a stale index
        db = TartanAir(datapath=args.datapath, n_frames=args.n_frames,
                       fmin=args.fmin, fmax=args.fmax,
                       crop_size=tuple(args.image_size),
                       cache_dir=os.path.join(args.datapath, ".index_cache"))
    rng = np.random.default_rng(12345)
    logger = Logger(args.name)
    os.makedirs("checkpoints", exist_ok=True)

    def save_state(tag):
        weights_io.save_train_state(
            f"checkpoints/{args.name}_state_{tag}.pkl",
            jax.device_get(params), jax.device_get(opt_state), total_steps)

    N = args.n_frames
    total_steps = start_step

    # frame-graph cache: only valid when db[idx] is deterministic per index
    # (SyntheticBox caches its rendered clips). TartanAir draws a random
    # covisibility walk + augmentation per call, so a cached graph would
    # describe a DIFFERENT sampled clip and break the fmin/fmax flow bounds
    # the reference guarantees by rebuilding per step (train.py:88-94).
    graph_cache: dict = {}
    graph_cache_ok = "synthetic" in args.datasets

    def prepare_batch():
        idx = rng.integers(0, len(db), size=args.batch)
        samples = [db[int(i)] for i in idx]
        # randomize frame graph (train.py:86-94) — shared across the batch
        # so edge lists stay static per step
        if rng.random() < 0.5:
            k = int(idx[0])
            graph = graph_cache.get(k) if graph_cache_ok else None
            if graph is None:
                s0 = samples[0]
                graph = build_frame_graph(s0[1], s0[2], s0[3],
                                          num=args.edges)
                if graph_cache_ok:
                    graph_cache[k] = graph
        else:
            graph = {i: [j for j in range(N) if i != j and abs(i - j) <= 2]
                     for i in range(N)}
        ii, jj, _ = graph_to_edge_list(graph)

        batch = collate(samples, ii, jj)
        sb = shard_batch(mesh, {k: batch[k] for k in
                                ("images", "poses", "disps", "intrinsics")})
        sb["ii"] = replicate(mesh, batch["ii"])
        sb["jj"] = replicate(mesh, batch["jj"])
        return sb

    sb = prepare_batch()
    while total_steps < args.steps:
        key = jax.random.PRNGKey(total_steps)
        t0 = time.perf_counter()
        try:
            params, opt_state, metrics = step_fn(params, opt_state, sb, key)
            # prepare the NEXT batch while the dispatched step runs on
            # device (the metrics float() below is the completion sync)
            if total_steps + 1 < args.steps:
                sb = prepare_batch()
            host_metrics = {k: float(v) for k, v in metrics.items()}
        except Exception:
            # device/tunnel failure mid-run: persist a resumable state
            # before dying so hours of training survive the crash
            try:
                save_state("crash")
                print(f"saved crash state at step {total_steps}", flush=True)
            except Exception:
                pass
            raise
        logger.push(host_metrics)
        total_steps += 1
        if total_steps <= 5 or total_steps % args.log_every == 0:
            print(f"step {total_steps:6d}  loss {host_metrics['loss']:.4f}  "
                  f"rot {host_metrics['rot_error']:.3f}  "
                  f"f_err {host_metrics['f_error']:.3f}  "
                  f"nanfrac {host_metrics.get('grad_nanfrac', 0.0):.4f}  "
                  f"{time.perf_counter() - t0:.2f}s", flush=True)

        if total_steps % args.ckpt_every == 0:
            weights_io.save_npz(f"checkpoints/{args.name}_{total_steps:06d}"
                                ".npz", jax.device_get(params))
        if total_steps % args.state_every == 0:
            save_state("latest")

    weights_io.save_npz(f"checkpoints/{args.name}_final.npz",
                        jax.device_get(params))
    save_state("final")


if __name__ == "__main__":
    main()
