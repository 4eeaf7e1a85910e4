"""Real multi-process test of tpuzip.dist.multihost (VERDICT round-1 item 7).

Spawns N jax.distributed-initialized CPU processes on localhost and checks
that compress_corpus_multihost produces the identical container on every
process, that the container decodes back to the corpus, and that the ordered
ragged gather path (process_allgather with ragged per-host block counts and
host-local padding blocks dropped) is actually exercised with
process_count > 1.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _corpus(nblocks: int) -> bytes:
    return bytes((i * 31 + 7) % 256 for i in range(nblocks * 1000))


def _run_job(nproc: int, local_devs: int, nblocks: int, tmp_path,
             extra: list[str] | None = None,
             read_outputs: bool = True) -> list[bytes]:
    coord = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"container_{p}.tpz") for p in range(nproc)]
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    repo_root = os.path.dirname(os.path.dirname(_WORKER))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coord, str(nproc), str(p),
             str(local_devs), str(nblocks), outs[p]] + (extra or []),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for p in range(nproc)
    ]
    fail = []
    for p, proc in enumerate(procs):
        try:
            _, err = proc.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"multihost worker {p} timed out")
        if proc.returncode != 0:
            fail.append(f"worker {p} rc={proc.returncode}:\n"
                        f"{err.decode(errors='replace')[-2000:]}")
    assert not fail, "\n".join(fail)
    if not read_outputs:
        return []
    return [open(o, "rb").read() for o in outs]


def test_two_process_ragged_ranges(tmp_path):
    # 9 blocks over 2 hosts: host 0 owns ceil(9/2)=5, host 1 owns 4.
    # 5 is not a multiple of the 2 local devices -> the local runner pads
    # with a zero-length block whose size/payload entries must be dropped
    # before the gather (the round-1 interleaving bug).
    containers = _run_job(2, 2, 9, tmp_path)
    assert containers[0] == containers[1]

    from tpuzip.dist import runner

    assert runner.decompress(containers[0]) == _corpus(9)


def test_three_process_ragged_tail(tmp_path):
    # 10 blocks over 3 hosts: ranges 4/4/2 — ragged per-host counts force
    # the padded-table + counts exchange in gather_ragged_payloads.
    containers = _run_job(3, 2, 10, tmp_path)
    assert containers[0] == containers[1] == containers[2]

    from tpuzip.dist import runner

    assert runner.decompress(containers[0]) == _corpus(10)


@pytest.mark.parametrize(
    "codec", ["lz4", "ari", "bwt", "bwtdc", "deflate", "lz4p", "bin",
              "apm"])
def test_two_process_every_codec(codec, tmp_path):
    # VERDICT r2 item 1: the merged header must propagate the staged-payload
    # flag bits (2/8) and decode cleanly for the ari family, not just rle.
    containers = _run_job(2, 2, 9, tmp_path, extra=[codec])
    assert containers[0] == containers[1]

    from tpuzip.dist import runner

    if codec in ("ari", "bwt", "bwtdc"):
        assert containers[0][5] & 2, "staged flag bit must survive the merge"
    assert runner.decompress(containers[0]) == _corpus(9)
    # distributed DECODE: the per-rank local ranges written by the workers
    # must concatenate back to the corpus (decompress_corpus_multihost,
    # global adler verified via the DCN combine inside the workers)
    parts = b"".join(
        open(str(tmp_path / f"container_{p}.tpz.dec{p}"), "rb").read()
        for p in range(2))
    assert parts == _corpus(9)


def test_two_process_ari_knobs_and_checksums(tmp_path):
    # non-default ari increment/threshold (flag bit 4 trailer) + per-block
    # checksum table (flag bit 1) through the multi-process merge.
    containers = _run_job(2, 2, 9, tmp_path,
                          extra=["ari", "1", "16", str(1 << 12)])
    assert containers[0] == containers[1]
    assert containers[0][5] & 7 == 7  # checksums + staged + knob trailer

    from tpuzip.dist import runner

    assert runner.decompress(containers[0]) == _corpus(9)


# ---- failure paths (VERDICT r3 task 6): each worker EXPECTS its taxonomy
# error and exits 0 only when it was raised — rc!=0 means the guard did
# not fire, produced garbage, or a peer deadlocked in a collective.

def test_two_process_differing_config_refused(tmp_path):
    """Ranks with different ari knobs: the flags/trailer allgather guard
    must refuse the merge with ValueError('...differing...') on EVERY
    host (the guard that replaced the round-2 silent-corruption bug)."""
    _run_job(2, 2, 9, tmp_path,
             extra=["ari", "0", "-", "-", "differ_knobs"],
             read_outputs=False)


def test_two_process_corrupt_merged_payload(tmp_path):
    """One flipped payload byte in the merged container: the owning host
    raises its block-level error, the peer raises via the (-1,0) sentinel
    on the checksum allgather (RemoteDecodeError) or the combined-adler
    ChecksumError — never garbage, never a hang."""
    _run_job(2, 2, 9, tmp_path,
             extra=["rle", "0", "-", "-", "corrupt_payload"],
             read_outputs=False)


def test_three_process_truncated_container(tmp_path):
    """A container cut mid-payload: tail hosts hit the explicit
    BlockLengthError truncation check, earlier hosts fail via the
    sentinel — all three processes exit with the expected taxonomy
    error."""
    _run_job(3, 2, 10, tmp_path,
             extra=["rle", "0", "-", "-", "truncate_payload"],
             read_outputs=False)
