"""Platform / device selection helpers.

The reference selects CPU vs GPU with --gpu (heat_dynamics.py:65-68). Here the
equivalent switch is --platform {tpu,cpu,default}: 'default' keeps whatever the
ambient JAX configuration picked (on this image, the axon TPU plugin)."""

from __future__ import annotations


def force_platform(platform: str) -> None:
    if not platform or platform == "default":
        return
    # Both are needed on this image: the env var steers plugin discovery when jax
    # has not been imported yet, the config update when a sitecustomize already
    # imported (but not yet initialized) the axon TPU plugin.
    import os

    os.environ["JAX_PLATFORMS"] = platform
    import jax

    jax.config.update("jax_platforms", platform)


def enable_compile_cache(path: str = "/tmp/ndcn_jax_cache") -> None:
    """Persistent XLA compilation cache — compiles of grad-of-scan graphs take
    minutes through the axon TPU tunnel; cache them across processes."""
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        # without these, the large train executables never land in the cache
        # (verified: 42 s cold compile -> 11 s cache hit in a fresh process)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


def set_matmul_precision(precision: str) -> None:
    """TPU MXU precision: 'default' truncates f32 matmul inputs to bf16 (one
    MXU pass, fast); 'high' runs 3-pass bf16 (~f32-accurate products at 3x
    pass cost); 'highest' keeps full f32 (use for numerical-parity runs).
    NB: JAX accepts 'float32' but maps it to HIGHEST, not the 3-pass mode.

    Note for adaptive solves at tight tolerances: single-pass bf16 truncation
    noise in the RHS perturbs the embedded error estimate, which can cost
    extra solver steps. On the 400-node flagship config, --precision high cuts
    attempts 4 -> 3 (matching the reference CPU run) and nets +9% train
    throughput on v5e-1 (1738 -> 1894 steps/s); at loose tolerances / big
    matmuls (cora dgnn, rtol .1, hidden 256) 'default' loses no steps and
    stays 2.2x faster. Measured in bench.py."""
    if precision and precision != "default":
        import jax

        jax.config.update("jax_default_matmul_precision", precision)


def add_platform_flag(parser) -> None:
    parser.add_argument("--platform", type=str, default="default",
                        choices=["default", "tpu", "cpu"],
                        help="JAX platform override (reference: --gpu -1 == cpu)")
    parser.add_argument("--precision", type=str, default="default",
                        choices=["default", "high", "float32", "highest"],
                        help="matmul precision on the MXU (high = 3-pass bf16, "
                             "highest = full f32, float32 = alias of highest; "
                             "'high' can cut adaptive-solver steps at tight "
                             "tolerances — see set_matmul_precision)")
