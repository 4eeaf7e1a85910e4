import pytest

from tpuzip.dist import mesh as meshlib, runner
from tpuzip.runtime import checkpoint


def test_job_checkpoint_resume(tmp_path):
    mesh = meshlib.make_mesh(8)
    data = (b"checkpointable corpus content, again and again. " * 600)
    wd = str(tmp_path / "job")

    # data = 7+ blocks of 4096; batches of 4 -> starts {0, 4}; batch 4 fails
    with pytest.raises(RuntimeError, match="injected failure"):
        checkpoint.run_job(data, wd, codec="lz4", block_size=4096,
                           batch_blocks=4, mesh=mesh, fail_batches={4})
    man = checkpoint.Manifest.load(wd + "/manifest.json")
    assert 0 in man.completed          # first batch landed
    assert 4 not in man.completed      # failed batch did not

    # resume completes the job; result must equal the uninterrupted pipeline
    container = checkpoint.run_job(data, wd, codec="lz4", block_size=4096,
                                   batch_blocks=4, mesh=mesh)
    direct = runner.compress(data, codec="lz4", block_size=4096, mesh=mesh)
    assert container == direct         # deterministic, bitwise-identical
    assert runner.decompress(container, mesh=mesh) == data


def test_job_fresh_run_matches_runner(tmp_path):
    mesh = meshlib.make_mesh(8)
    data = b"tiny"
    container = checkpoint.run_job(data, str(tmp_path / "j2"), codec="lz4",
                                   block_size=4096, mesh=mesh)
    assert runner.decompress(container, mesh=mesh) == data


def test_error_taxonomy(tmp_path):
    import numpy as np

    from tpuzip.runtime.errors import (BlockLengthError, ChecksumError,
                                       HeaderError)

    mesh = meshlib.make_mesh(8)
    data = b"taxonomy test corpus " * 300
    container = runner.compress(data, codec="lz4", block_size=4096, mesh=mesh)

    with pytest.raises(HeaderError, match="magic"):
        runner.decompress(b"JUNK" + container[4:], mesh=mesh)
    with pytest.raises(HeaderError, match="unknown codec"):
        runner.decompress(container[:4] + b"\x99" + container[5:], mesh=mesh)
    with pytest.raises(BlockLengthError):
        runner.decompress(container[: len(container) // 2], mesh=mesh)
    # flip one payload byte -> corpus checksum mismatch (or corrupt stream)
    bad = bytearray(container)
    bad[-3] ^= 0x40
    with pytest.raises((ChecksumError, Exception)):
        runner.decompress(bytes(bad), mesh=mesh)
