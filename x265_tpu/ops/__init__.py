"""Batched kernel library — the TPU-native replacement for the reference's
``EncoderPrimitives`` function-pointer table (x265_1.9/source/common/primitives.h).

Every kernel family exists in (at least) two forms, mirroring the reference's
C-reference-vs-assembly testbench design (SURVEY.md §4.1):

  * a plain numpy per-block implementation following ITU-T H.265 clause by
    clause (the correctness oracle), and
  * a batched jnp/Pallas implementation operating on ``[num_blocks, ...]``
    tensors (the production path).

All HEVC kernel math is bit-exact integer arithmetic; the batched paths use
int32 accumulation (or f32 where the dynamic range provably fits in the
24-bit mantissa, e.g. intra prediction as an MXU matmul).
"""
