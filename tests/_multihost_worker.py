"""Worker process for the real multi-process multihost test.

Launched by tests/test_multihost_mp.py via subprocess with argv:
    coordinator_address num_processes process_id num_local_devices
    nblocks out_path [codec] [block_checksums] [ari_increment ari_threshold]

Each worker joins the jax.distributed job on CPU, compresses the shared
deterministic corpus through tpuzip.dist.multihost.compress_corpus_multihost,
and writes the merged container to out_path (every process must produce the
identical container — SURVEY.md §5 "Distributed communication backend").
"""

import os
import sys


def main() -> None:
    coord, nproc, pid, ndev, nblocks, out_path = sys.argv[1:7]
    codec = sys.argv[7] if len(sys.argv) > 7 else "rle"
    block_checksums = len(sys.argv) > 8 and sys.argv[8] == "1"
    inc_thr = None
    if len(sys.argv) > 10 and sys.argv[9] != "-":
        inc_thr = (int(sys.argv[9]), int(sys.argv[10]))
    # failure-injection mode (VERDICT r3 task 6): the worker EXPECTS the
    # matching taxonomy error and exits 0 only when it was raised on this
    # host; any other outcome exits 3 so the test fails loudly.
    failmode = sys.argv[11] if len(sys.argv) > 11 else None
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpuzip.dist import multihost

    multihost.initialize(coord, int(nproc), int(pid))
    assert jax.process_count() == int(nproc)

    config = None
    if inc_thr is not None:
        from tpuzip.core.config import Config

        config = Config()
        config.codec.ari.increment, config.codec.ari.threshold = inc_thr

    if failmode == "differ_knobs":
        # ranks disagree on the ari model knobs: the flags/trailer
        # allgather guard in compress_corpus_multihost must refuse the
        # merge on EVERY host rather than emit a lying merged header
        from tpuzip.core.config import Config

        config = Config()
        config.codec.ari.increment = 1 + int(pid)  # rank-dependent knob
        config.codec.ari.threshold = 1 << 12

    # nblocks chosen by the test so host ranges are NOT multiples of the
    # local device count, exercising the padding-block truncation and the
    # ragged-count gather in compress_corpus_multihost.
    data = bytes((i * 31 + 7) % 256 for i in range(int(nblocks) * 1000))
    if failmode == "differ_knobs":
        try:
            multihost.compress_corpus_multihost(
                data, codec=codec, block_size=1000, config=config)
        except ValueError as e:
            assert "differing" in str(e), e
            sys.exit(0)
        sys.exit(3)  # the guard did not fire

    container = multihost.compress_corpus_multihost(
        data, codec=codec, block_size=1000,
        block_checksums=block_checksums, config=config)
    with open(out_path, "wb") as f:
        f.write(container)

    if failmode in ("corrupt_payload", "truncate_payload"):
        from tpuzip.runtime.errors import ChecksumError, CorruptStreamError

        if failmode == "corrupt_payload":
            # flip one payload byte in the MERGED container: the owning
            # host sees a block-level error, every OTHER host must still
            # fail via the DCN-combined global adler (ChecksumError)
            bad = bytearray(container)
            bad[-100] ^= 0x41
            bad = bytes(bad)
        else:
            # drop the container tail: some host's block range is
            # incomplete — a taxonomy error, never garbage output
            bad = container[: len(container) - len(container) // 4]
        try:
            multihost.decompress_corpus_multihost(bad, config=config)
        except (ChecksumError, CorruptStreamError, ValueError) as e:
            assert repr(e)
            sys.exit(0)
        sys.exit(3)  # corruption slipped through

    # decode side: this host decodes its block range of the merged
    # container; the corpus adler verifies via the DCN combine
    local, lo, hi = multihost.decompress_corpus_multihost(container,
                                                          config=config)
    with open(out_path + f".dec{pid}", "wb") as f:
        f.write(local)


if __name__ == "__main__":
    main()
