"""Progress line behavior (the indicatif analog, io.rs:392-410)."""

import io

from sharkmer_tpu.utils.progress import Progress


def test_disabled_off_tty(monkeypatch):
    buf = io.StringIO()
    monkeypatch.setattr("sys.stderr", buf)
    p = Progress(enabled=None)  # StringIO.isatty() is False
    p.tick("hello", force=True)
    p.finish()
    assert buf.getvalue() == ""


def test_tick_rewrites_one_line(monkeypatch):
    buf = io.StringIO()
    monkeypatch.setattr("sys.stderr", buf)
    p = Progress(enabled=True, min_interval=0.0)
    p.tick("12 reads")
    p.tick("3 reads")  # shorter: must blank the leftover tail
    out = buf.getvalue()
    assert out.count("\n") == 0
    assert out == "\r12 reads" + "\r3 reads" + " " * (len("12 reads") - len("3 reads"))
    p.finish()
    assert buf.getvalue().endswith("\r" + " " * len("3 reads") + "\r")


def test_throttling(monkeypatch):
    buf = io.StringIO()
    monkeypatch.setattr("sys.stderr", buf)
    p = Progress(enabled=True, min_interval=3600.0)
    p.tick("a")
    p.tick("b")  # inside the throttle window: dropped
    assert buf.getvalue() == "\ra"
    p.tick("c", force=True)
    assert buf.getvalue() == "\ra\rc"
