"""Host-side runtime: job orchestration, checkpoint/resume, error taxonomy.

(The C++ native runtime lives in csrc/ and is loaded via
tpuzip.runtime.native when built.)
"""
