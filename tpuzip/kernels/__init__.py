"""Pallas TPU kernels for the hot sequential codecs.

The framework's central kernel pattern is the **lane-parallel multi-stream
scan**: TPU grid cells execute sequentially on a core, so single-chip
throughput for inherently-serial coder loops (MTF, the range coder) comes
from processing LANES=128 independent blocks per VPU step, with all
per-stream state held as (state, 128) arrays in VMEM and every update
expressed as one-hot masked vector ops (no gathers).  The grid streams the
block length in chunks; scratch persists across grid steps.

Every kernel has interpret-mode support so tests run CPU-hermetic.
"""
