"""Async ring-buffer logger tests (common/log.cpp analog)."""

import io
import time

from tpullama.logging import RingLogger


def test_ring_and_levels():
    buf = io.StringIO()
    lg = RingLogger(capacity=4, level="info", colors=False, stream=buf)
    lg.debug("hidden %d", 1)
    for i in range(6):
        lg.info("m%d", i)
    lg.flush()
    tail = [e.msg for e in lg.tail()]
    assert tail == ["m2", "m3", "m4", "m5"]  # ring capacity 4, debug dropped
    out = buf.getvalue()
    assert "m5" in out and "hidden" not in out


def test_callback_redirect():
    got = []
    lg = RingLogger(level="debug", colors=False, stream=io.StringIO())
    lg.set_callback(lambda level, text: got.append((level, text)))
    lg.warn("w1")
    lg.error("e %s", "x")
    lg.flush()
    for _ in range(100):
        if len(got) == 2:
            break
        time.sleep(0.01)
    assert got == [("warn", "w1"), ("error", "e x")]


def test_producer_never_blocks():
    class Slow(io.StringIO):
        def write(self, s):
            time.sleep(0.05)
            return super().write(s)

    lg = RingLogger(level="info", colors=False, stream=Slow())
    t0 = time.perf_counter()
    for i in range(50):
        lg.info("burst %d", i)
    assert time.perf_counter() - t0 < 0.5  # queued, not written inline
