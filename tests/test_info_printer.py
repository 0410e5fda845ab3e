"""InfoPrinter rendering and ordered block-event release
(src/app/InfoPrinter.cpp:76-151)."""

import io

from kanzi_tpu.app.info_printer import (COMPRESSION, DECOMPRESSION, INFO,
                                        InfoPrinter)
from kanzi_tpu.core.events import Event, EventType


def _block_events(bid, sizes=(100, 60, 55)):
    return [Event(EventType.BEFORE_TRANSFORM, bid, sizes[0]),
            Event(EventType.AFTER_TRANSFORM, bid, sizes[1]),
            Event(EventType.BEFORE_ENTROPY, bid, sizes[1]),
            Event(EventType.AFTER_ENTROPY, bid, sizes[2])]


def test_blocks_released_in_id_order():
    out = io.StringIO()
    p = InfoPrinter(4, COMPRESSION, out=out)
    # block 2 completes before block 1 (concurrent tasks)
    for e in _block_events(2):
        p(e)
    assert out.getvalue() == ""          # held until block 1 completes
    for e in _block_events(1):
        p(e)
    lines = [ln for ln in out.getvalue().splitlines() if ln]
    assert lines[0].startswith("Block 1:")
    assert lines[1].startswith("Block 2:")
    assert "(55%)" in lines[0]


def test_verbosity5_json_and_block_info():
    out = io.StringIO()
    p = InfoPrinter(5, DECOMPRESSION, out=out)
    p(Event(EventType.BLOCK_INFO, 1, 55, offset=192, skip_flags=0b11100000))
    s = out.getvalue()
    assert '"offset":192' in s and '"skipFlags":"11100000"' in s


def test_info_table():
    out = io.StringIO()
    p = InfoPrinter(4, INFO, out=out)
    p(Event(EventType.AFTER_HEADER_DECODING, 0, 4096, header_info={
        "bsVersion": 6, "checksum": 32, "blockSize": 4096,
        "entropy": "ANS0", "transform": "BWT+RANK+ZRLT",
        "originalSize": 10000, "fileSize": 4000,
        "inputName": "/tmp/x/sample.knz"}))
    s = out.getvalue()
    assert "File Name" in s and "sample.knz" in s and "ANS0" in s


def test_cli_verbosity_and_info(tmp_path, capsys):
    import numpy as np
    from kanzi_tpu.app.cli import main
    rng = np.random.default_rng(0)
    src = tmp_path / "f.bin"
    src.write_bytes(rng.integers(0, 64, 120000, dtype=np.uint8).tobytes())
    knz = tmp_path / "f.knz"
    dec = tmp_path / "f.out"
    assert main(["-c", "-f", "-i", str(src), "-o", str(knz), "-l", "1",
                 "-b", "32k", "-v", "5"]) == 0
    assert main(["-d", "-f", "-i", str(knz), "-o", str(dec), "-v", "4"]) == 0
    assert dec.read_bytes() == src.read_bytes()
    assert main(["-y", "-i", str(knz), "-v", "4"]) == 0
    cap = capsys.readouterr()
    assert "File Name" in cap.out
