"""Test harness: force an 8-device virtual CPU mesh so all sharding logic is
exercised without TPU hardware (the driver dry-runs the multi-chip path the
same way).

IMPORTANT: this image's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon (the remote TPU tunnel, single-client).  Setting
os.environ here is therefore too late — the override must go through
jax.config, which still works before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

import jax

jax.config.update("jax_platforms", "cpu")
# (Measured round 5: the persistent compile cache does NOT shorten this
# suite — the InterpretParams kernel computations bypass it (identical
# 11-min test_kernels.py reruns with the cache configured), and the other
# tests' compiles are all short.  So no cache config here.)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0x7A91)


def corpus_samples(rng, sizes=(0, 1, 2, 7, 64, 255, 1000, 4096, 65536)):
    """A spread of adversarial inputs: empty, tiny, runs, random, text-like."""
    out = []
    for n in sizes:
        out.append(bytes(rng.integers(0, 256, n, dtype=np.uint8)))
    out.append(b"a" * 1000)
    out.append(b"abcabcabcabc" * 100)
    out.append(bytes(range(256)) * 16)
    out.append(b"the quick brown fox jumps over the lazy dog " * 64)
    # low-entropy biased bytes (compressible, exercises entropy models)
    out.append(bytes(rng.choice([0, 1, 2, 255], size=8192,
                                p=[0.7, 0.15, 0.1, 0.05]).astype(np.uint8)))
    return out


@pytest.fixture(scope="session")
def samples(rng):
    return corpus_samples(rng)
