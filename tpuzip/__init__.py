"""tpuzip — a TPU-native lossless compression framework.

A from-scratch JAX/XLA/Pallas re-expression of the codec family of
``rusty-shell/rust-compress`` (LZ4, DEFLATE/zlib, BWT+MTF/DC, RLE, adaptive
arithmetic coding, Adler-32), designed TPU-first:

- each codec operates on *batches of independent blocks* (the data-parallel
  axis of lossless compression), vectorized lane-wise on-chip;
- sequential coder state machines (range coder, LZ token scans, MTF) run as
  ``lax.scan`` / Pallas kernels *inside* a block, ``vmap``/``shard_map``
  *across* blocks;
- multi-chip / multi-host scaling via ``jax.sharding.Mesh`` with XLA
  collectives (table broadcast over ICI, ordered ragged gather of compressed
  payloads);
- a pure-CPU ``oracle`` package provides the bit-exactness contract
  (validated against system ``zlib`` and ``liblz4``).

See SURVEY.md for the layer map of the reference and the build plan.
"""

__version__ = "0.1.0"

from tpuzip.core.config import CodecConfig, Config  # noqa: F401
