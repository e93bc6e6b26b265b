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
