"""x265-tpu: a TPU-native HEVC (H.265) encoder framework.

A from-scratch re-design of the capabilities of the x265 encoder
(reference: videolan/x265) for TPU hardware:

- compute path: JAX / XLA / Pallas — dense, batched candidate evaluation
  over whole frames instead of per-CTU recursive pruning
  (reference: source/encoder/analysis.cpp compressCTU recursion)
- serial path: CABAC bin coding + bitstream assembly in native C++ with
  a pure-Python reference implementation
  (reference: source/encoder/entropy.cpp, source/common/bitstream.cpp)
- scale-out: GOP/frame sharding over a jax.sharding.Mesh
  (reference analog: frame threads + WPP, source/encoder/frameencoder.cpp)
"""

__version__ = "0.1.0"
