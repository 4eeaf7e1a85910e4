import json
import os

from tpuzip.cli.tpz import main as tpz_main
from tpuzip.utils.metrics import RunMetrics, device_timer


def test_cli_all_subcommands(tmp_path):
    src = tmp_path / "in.bin"
    data = b"cli coverage corpus " * 400
    src.write_bytes(data)
    comp = tmp_path / "out.tpz"
    back = tmp_path / "back.bin"

    assert tpz_main(["compress", "-c", "lz4", "-b", "4096",
                     str(src), str(comp)]) == 0
    assert tpz_main(["info", str(comp)]) == 0
    assert tpz_main(["decompress", str(comp), str(back)]) == 0
    assert back.read_bytes() == data
    assert tpz_main(["roundtrip", "-c", "rle", "-b", "4096", str(src)]) == 0


def test_cli_info_rejects_junk(tmp_path):
    junk = tmp_path / "junk.bin"
    junk.write_bytes(b"\x00" * 64)
    assert tpz_main(["info", str(junk)]) == 1


def test_run_metrics_phases():
    m = RunMetrics()
    with m.phase("encode", bytes_in=1000, blocks=2):
        pass
    with m.phase("encode", bytes_in=500, blocks=1):
        pass
    rep = json.loads(m.report())
    assert rep["encode"]["in"] == 1500
    assert rep["encode"]["blocks"] == 3
    assert rep["encode"]["s"] >= 0


def test_device_timer():
    with device_timer() as t:
        sum(range(1000))
    assert t["seconds"] >= 0


def test_cli_superbatch_roundtrip(tmp_path):
    from tpuzip.cli import tpz

    src = tmp_path / "in.bin"
    comp = tmp_path / "out.tpzc"
    back = tmp_path / "back.bin"
    data = open("/root/repo/SURVEY.md", "rb").read() * 10
    src.write_bytes(data)
    assert tpz.main(["compress", "-c", "lz4", "--superbatch", "1",
                     str(src), str(comp)]) == 0
    assert comp.read_bytes()[:4] == b"TPZC"
    assert tpz.main(["decompress", str(comp), str(back)]) == 0
    assert back.read_bytes() == data


def test_cli_trace_flag(tmp_path):
    """--trace captures a jax.profiler trace directory during compress."""
    import os

    from tpuzip.cli import tpz

    src = tmp_path / "in.bin"
    comp = tmp_path / "out.tpz"
    tdir = tmp_path / "trace"
    src.write_bytes(b"trace me " * 2000)
    assert tpz.main(["compress", "-c", "rle", "--trace", str(tdir),
                     str(src), str(comp)]) == 0
    # profiler writes a plugins/profile/<ts>/ tree
    found = [p for p, _, fs in os.walk(tdir) for f in fs]
    assert found, "trace directory is empty"


def test_cli_info_corpus(tmp_path, capsys):
    from tpuzip.cli import tpz

    src = tmp_path / "in.bin"
    comp = tmp_path / "out.tpzc"
    src.write_bytes(b"corpus info " * 2000)
    assert tpz.main(["compress", "-c", "rle", "--superbatch", "1",
                     str(src), str(comp)]) == 0
    assert tpz.main(["info", str(comp)]) == 0
    out = capsys.readouterr().out
    assert "tpz corpus container" in out and "superbatches" in out


def test_cli_bin_apm_model_pick(tmp_path):
    """--codec bin/apm with --bin-bits/--bin-rate knobs (VERDICT r2 item 7:
    CLI-reachable binary/APM model pick)."""
    src = tmp_path / "in.bin"
    data = bytes([0, 0, 0, 7]) * 2000 + b"apm cli corpus " * 100
    src.write_bytes(data)
    comp = tmp_path / "out.tpz"
    back = tmp_path / "back.bin"
    assert tpz_main(["compress", "-c", "apm", "-b", "2048",
                     "--bin-rate", "4", str(src), str(comp)]) == 0
    assert comp.read_bytes()[5] & 4  # knob trailer recorded
    assert tpz_main(["decompress", str(comp), str(back)]) == 0
    assert back.read_bytes() == data
    assert tpz_main(["roundtrip", "-c", "bin", "-b", "2048",
                     "--bin-bits", "11", str(src)]) == 0
