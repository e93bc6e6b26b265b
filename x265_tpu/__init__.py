"""x265_tpu — a TPU-native HEVC (H.265) encoder/decoder framework.

Built from scratch in JAX/XLA/Pallas with the capability bar of x265 1.9
(reference: /root/reference/x265_1.9) plus a libde265-class conformant
decoder for closed-loop verification.  See SURVEY.md at the repo root for
the structural blueprint.

Architecture (TPU-first, not a port):
  - ``x265_tpu.ops``      — batched kernel library (jnp reference impls +
                            Pallas TPU kernels), replacing the reference's
                            function-pointer ``EncoderPrimitives`` table
                            (x265_1.9/source/common/primitives.h:196).
  - ``x265_tpu.common``   — params/presets, bitstream writer, NAL assembly,
                            parameter-set structures, spec constant tables.
  - ``x265_tpu.cabac``    — CABAC entropy engine (encode + decode) and the
                            full HEVC syntax layer.
  - ``x265_tpu.encoder``  — frame encoders built as wavefront lattice scans
                            (lax.scan over anti-diagonals) instead of the
                            reference's thread-pool WPP runtime.
  - ``x265_tpu.decoder``  — conformant decoder (syntax parse on host,
                            reconstruction on device with the same kernels).
  - ``x265_tpu.parallel`` — device-mesh sharding (GOP x tile) via
                            jax.sharding / shard_map.
  - ``x265_tpu.io``       — Y4M/YUV readers and writers.
"""

__version__ = "0.1.0"

X265_TPU_BUILD = 1


def _enable_compile_cache():
    """Persistent XLA compilation cache: the wavefront scans are expensive
    to compile (minutes on a small host), and the JAX_COMPILATION_CACHE_DIR
    env var is not honored on this JAX version — set it via jax.config.
    Opt out with X265_TPU_NO_COMPILE_CACHE=1."""
    import os
    if os.environ.get("X265_TPU_NO_COMPILE_CACHE"):
        return
    cache = os.environ.get("X265_TPU_COMPILE_CACHE",
                           os.path.join(os.path.expanduser("~"), ".cache",
                                        "x265_tpu", "jax"))
    try:
        import jax
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:   # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()
