"""Native frame pump: ordered delivery, backpressure, error reporting."""

import os

import numpy as np
import pytest

from lzzx_nerf_tpu.native import FramePump, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no g++ toolchain to build the pump")

FRAME = 64 * 64 * 3


def test_pump_writes_frames_in_order(tmp_path):
    path = tmp_path / "frames.raw"
    fd = os.open(str(path), os.O_WRONLY | os.O_CREAT, 0o644)
    pump = FramePump(fd, FRAME, capacity=4)
    frames = [bytes([i]) * FRAME for i in range(20)]
    for f in frames:
        pump.push(f)
    n = pump.close()
    os.close(fd)
    assert n == 20
    data = path.read_bytes()
    assert len(data) == 20 * FRAME
    for i in range(20):
        chunk = data[i * FRAME:(i + 1) * FRAME]
        assert chunk == frames[i], f"frame {i} out of order"


def test_pump_backpressure_blocks_then_drains(tmp_path):
    """With a tiny ring and a slow consumer (pipe), pushes must block until
    drained — never drop or reorder."""
    r, w = os.pipe()
    pump = FramePump(w, FRAME, capacity=2)
    import threading

    received = []

    def reader():
        while True:
            buf = b""
            while len(buf) < FRAME:
                chunk = os.read(r, FRAME - len(buf))
                if not chunk:
                    return
                buf += chunk
            received.append(buf[0])

    t = threading.Thread(target=reader)
    t.start()
    for i in range(50):
        pump.push(bytes([i % 251]) * FRAME)
    assert pump.close() == 50
    os.close(w)
    t.join(timeout=10)
    os.close(r)
    assert received == [i % 251 for i in range(50)]


def test_pump_reports_broken_sink(tmp_path):
    r, w = os.pipe()
    pump = FramePump(w, FRAME, capacity=2)
    pump.push(b"\0" * FRAME)
    os.close(r)  # kill the consumer
    with pytest.raises(BrokenPipeError):
        # the first push may land in the ring before the writer hits EPIPE;
        # keep pushing until the error surfaces (bounded)
        for _ in range(10):
            pump.push(b"\0" * FRAME)
        pump.close()
    os.close(w)


def test_pump_wrong_size_rejected(tmp_path):
    fd = os.open(str(tmp_path / "x.raw"), os.O_WRONLY | os.O_CREAT, 0o644)
    pump = FramePump(fd, FRAME)
    with pytest.raises(ValueError):
        pump.push(b"123")
    pump.close()
    os.close(fd)


def test_pump_use_after_close_raises(tmp_path):
    """push()/pending()/close() after close() must raise/no-op, never hand
    a NULL handle to C (which would SIGSEGV the interpreter)."""
    fd = os.open(str(tmp_path / "y.raw"), os.O_WRONLY | os.O_CREAT, 0o644)
    pump = FramePump(fd, FRAME)
    pump.push(b"\0" * FRAME)
    assert pump.close() == 1
    with pytest.raises(ValueError):
        pump.push(b"\0" * FRAME)
    assert pump.pending() == 0
    assert pump.close() == 0  # idempotent
    os.close(fd)


def test_pump_close_bounded_when_consumer_stalls():
    """fp_close must return even when the consumer NEVER reads (stalled
    encoder / RTMP zero-window): the writer uses non-blocking writes +
    poll and close() aborts after ~5 s without progress. Regression: a
    blocking ::write pinned the worker, join() never returned, and the
    serving process wedged permanently."""
    import threading
    import time

    r, w = os.pipe()
    pump = FramePump(w, FRAME, capacity=2)

    filled = threading.Event()

    def producer():
        # fill pipe buffer + ring; pushes beyond that block on backpressure
        for i in range(64):
            try:
                pump.push(bytes([i % 251]) * FRAME)
            except (BrokenPipeError, OSError):
                break
            if i == 2:
                filled.set()
        filled.set()

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    assert filled.wait(timeout=10)
    time.sleep(0.3)  # let the writer wedge against the full pipe
    start = time.monotonic()
    # must NOT hang (progress-based 5 s abort) and must REPORT the give-up
    with pytest.raises(BrokenPipeError):
        pump.close()
    elapsed = time.monotonic() - start
    assert elapsed < 20, f"close() took {elapsed:.1f}s — unbounded drain"
    os.close(w)
    os.close(r)


def test_pump_close_drains_slow_but_healthy_sink():
    """fp_close's drain patience is BYTE-progress-based: a sink that
    accepts bytes steadily but takes >5 s per FRAME (a ~6 MB 1080p rgb24
    frame on a ~1 MB/s encoder) must be drained fully on close, not
    aborted mid-frame. Regression: patience was measured in whole frames
    written, so one slow frame tripped the 5 s no-progress abort and
    close() raised BrokenPipeError on a healthy sink, losing the queued
    tail and finalizing the mp4 from the kill path."""
    import threading
    import time

    big = 1024 * 1024
    r, w = os.pipe()
    pump = FramePump(w, big, capacity=2)
    pump.push(b"\xab" * big)

    stop = threading.Event()
    got = bytearray()

    def dripper():
        # ~64 KB per 0.4 s => the 1 MB frame takes >= ~6 s to drain:
        # longer than the 5 s patience window, so the old frame-count
        # progress check would abort mid-frame
        while not stop.is_set() and len(got) < big:
            chunk = os.read(r, 64 * 1024)
            if not chunk:
                break
            got.extend(chunk)
            time.sleep(0.4)

    t = threading.Thread(target=dripper, daemon=True)
    t.start()
    start = time.monotonic()
    written = pump.close()            # must drain, not raise
    elapsed = time.monotonic() - start
    assert written == 1
    assert elapsed > 4.5, f"drain took only {elapsed:.1f}s — scenario " \
                          f"no longer exceeds the old patience window"
    # close() returns once every byte is in the pipe; the tail may still
    # sit in the pipe buffer — let the reader finish before comparing
    t.join(timeout=15)
    stop.set()
    assert bytes(got) == b"\xab" * big
    os.close(r)
