"""droid_slam_tpu — a TPU-native deep visual SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
princeton-vl/DROID-SLAM (reference mounted read-only at /root/reference).
The compute path is jitted XLA + Pallas kernels; dynamic structures of the
reference (factor graphs, keyframe ring buffers) are recast as fixed-capacity
padded arrays so the hot loop compiles once and stays on-device.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):
  lie/     pure-JAX SE3/Sim3 quaternion Lie groups   (replaces lietorch CUDA)
  geom/    projective geometry + analytic Jacobians  (geom/projective_ops.py)
  ba/      dense bundle adjustment as masked static-shape linear algebra
           (replaces src/droid_kernels.cu + geom/ba.py — ONE implementation)
  models/  feature/context encoders, ConvGRU update operator (modules/*)
  ops/     correlation pyramid + lookup kernels      (src/*corr*.cu)
  state/   padded DepthVideo + FactorGraph           (depth_video.py, factor_graph.py)
  slam/    motion filter, frontend, backend, trajectory filler, Droid facade
  train/   losses, data-parallel trainer             (train.py, geom/losses.py)
  data/    dataset readers + augmentation            (data_readers/*)
  eval/    ATE/RPE metrics + evaluation harnesses    (evaluation_scripts/*)
"""

__version__ = "0.1.0"


def _honor_cpu_platform_request():
    """If the environment asks for the CPU platform, enforce it through
    jax.config as well: the deployment's tunneled-TPU plugin ignores
    JAX_PLATFORMS, and merely initializing that backend (which happens on
    the first jax.devices()/compute even when env vars request CPU) hangs
    indefinitely while the tunnel is unreachable. Harmless when jax is
    already initialized or no CPU request is present."""
    import os

    if "cpu" not in (os.environ.get("JAX_PLATFORM_NAME", ""),
                     os.environ.get("JAX_PLATFORMS", "")):
        return
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def _enable_compilation_cache():
    """Persistent XLA compilation cache (opt-out via JAX_NO_COMPILE_CACHE=1).

    On the tunneled-TPU deployment a single compile costs 15 s - 5 min of
    remote AOT; caching executables on disk lets train/eval/bench processes
    reuse each other's compiles. Defaults to a repo-local directory;
    JAX_COMPILATION_CACHE_DIR overrides.

    Only configures jax when it is ALREADY imported (every entry script
    imports jax before this package) or when a CPU platform is requested:
    importing jax here would touch the axon plugin, which blocks while the
    tunnel is down — `import droid_slam_tpu` alone must never hang."""
    import os
    import sys

    if os.environ.get("JAX_NO_COMPILE_CACHE"):
        return
    cpu_requested = "cpu" in (os.environ.get("JAX_PLATFORM_NAME", ""),
                              os.environ.get("JAX_PLATFORMS", ""))
    if "jax" not in sys.modules and not cpu_requested:
        return
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.isdir(os.path.join(repo_root, ".git")):
        default_cache = os.path.join(repo_root, ".jax_cache")
    else:  # installed (site-packages) — use a user cache dir instead
        default_cache = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "droid_slam_tpu", "jax_cache")
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", default_cache)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


_honor_cpu_platform_request()
_enable_compilation_cache()
