"""Circular line-capped file logging (reference CircularLogFile,
file_logger.cc:70-115: truncate-via-temp-file every 1000 lines)."""

import logging

from tpu_engine.utils.logger import CircularFileHandler


def test_circular_truncation(tmp_path):
    path = str(tmp_path / "engine.log")
    h = CircularFileHandler(path, max_lines=50)
    lg = logging.getLogger("circ-test")
    lg.addHandler(h)
    lg.setLevel(logging.INFO)
    try:
        for i in range(2300):  # crosses two 1000-line check intervals
            lg.info("line %d", i)
    finally:
        lg.removeHandler(h)
        h.close()
    lines = open(path).read().splitlines()
    assert len(lines) <= 50 + 1000  # capped at max + check interval slack
    assert lines[-1].endswith("line 2299")
    # the retained suffix is contiguous
    first_kept = int(lines[0].rsplit(" ", 1)[1])
    assert [l.rsplit(" ", 1)[1] for l in lines] == [
        str(i) for i in range(first_kept, 2300)]


def test_small_volume_untouched(tmp_path):
    path = str(tmp_path / "small.log")
    h = CircularFileHandler(path, max_lines=100)
    lg = logging.getLogger("circ-small")
    lg.addHandler(h)
    lg.setLevel(logging.INFO)
    try:
        for i in range(10):
            lg.info("m%d", i)
    finally:
        lg.removeHandler(h)
        h.close()
    assert len(open(path).read().splitlines()) == 10
