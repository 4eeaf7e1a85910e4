"""Worker process for the real multi-process multihost test.

Launched by tests/test_multihost_mp.py via subprocess with argv:
    coordinator_address num_processes process_id num_local_devices out_path

Each worker joins the jax.distributed job on CPU, compresses the shared
deterministic corpus through tpuzip.dist.multihost.compress_corpus_multihost,
and writes the merged container to out_path (every process must produce the
identical container — SURVEY.md §5 "Distributed communication backend").
"""

import os
import sys


def main() -> None:
    coord, nproc, pid, ndev, nblocks, out_path = sys.argv[1:7]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpuzip.dist import multihost

    multihost.initialize(coord, int(nproc), int(pid))
    assert jax.process_count() == int(nproc)

    # nblocks chosen by the test so host ranges are NOT multiples of the
    # local device count, exercising the padding-block truncation and the
    # ragged-count gather in compress_corpus_multihost.
    data = bytes((i * 31 + 7) % 256 for i in range(int(nblocks) * 1000))
    container = multihost.compress_corpus_multihost(
        data, codec="rle", block_size=1000)
    with open(out_path, "wb") as f:
        f.write(container)


if __name__ == "__main__":
    main()
