"""Progress-bar semantics (src/common.hpp:46-94) and ReadLoader byte
position (abismal.cpp:160-162)."""

import gzip
import io
import os


def test_progress_bar_format_and_cadence():
    from abismal_tpu.utils.progress import ProgressBar

    bar = ProgressBar(1000, "mapping reads")
    out = io.StringIO()
    for i in (0, 5, 250, 999):
        if bar.time_to_report(i):
            bar.report(out, i)
    s = out.getvalue()
    # reports at 1%, 25%, 100%; none at 0%; newline only when i >= total
    assert s.count("\r") == 3 and not s.endswith("\n")
    assert "|  1%]" in s and "| 25%]" in s and "|100%]" in s
    # bar glyph layout: [message|<bar>|pct%]
    seg = s.split("\r")[1]
    assert seg.startswith("[mapping reads|") and seg.endswith("%]")
    # total width: [ + msg + | + bar + | + 3-digit pct + %] == 72
    assert len(seg) == 72
    bar.report(out, 1000)
    assert out.getvalue().endswith("%]\n")


def test_readloader_current_byte(tmp_path):
    from abismal_tpu.io.fastq import ReadLoader

    rec = b"@r\nACGTACGTAAACGTACGTACGTACGTACGTACGTACGTACGTACGTA\n+\nB\n"
    plain = tmp_path / "t.fq"
    plain.write_bytes(rec * 100)
    rl = ReadLoader(str(plain), 10)
    rl.load_batch()
    assert rl.current_byte == 10 * len(rec)

    gz = tmp_path / "t.fq.gz"
    with gzip.open(gz, "wb") as f:
        f.write(rec * 100)
    rl = ReadLoader(str(gz), 10)
    rl.load_batch()
    assert 0 < rl.current_byte <= os.path.getsize(gz)
