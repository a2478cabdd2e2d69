"""Progress/ETA formatter parity with the reference's Timer
(itmo:statistics/Timer.java:17-69) and ProcessTimer remaining-time rule."""
import logging

from metacherchant_tpu.progress import (
    Progress, time_to_string, time_to_string_without_ms,
    to_clock_like_string)


def test_time_to_string_java_exact():
    assert time_to_string(0) == "0 ms"
    assert time_to_string(500) == "500 ms"
    assert time_to_string(1500) == "1 s 500 ms"
    assert time_to_string(90_000) == "1 min 30 s"
    assert time_to_string(3_660_000) == "1 h 1 min"
    assert time_to_string(25 * 3_600_000) == "1 day 1 h"
    assert time_to_string(49 * 3_600_000) == "2 days 1 h"


def test_time_to_string_without_ms():
    assert time_to_string_without_ms(59_400) == "59 s"
    # Java Math.round half-up: 59.6s -> 60s -> "1 min 0 s"
    assert time_to_string_without_ms(59_600) == "1 min 0 s"
    assert time_to_string_without_ms(0) == "0 s"


def test_to_clock_like_string():
    assert to_clock_like_string(3_723_000) == "1:02:03"
    assert to_clock_like_string(0) == "0:00:00"
    assert to_clock_like_string(59_000) == "0:00:59"


def test_progress_eta_line(caplog):
    p = Progress(total=100, label="pairs", log_every=10)
    p.t0 -= 10.0  # pretend 10s elapsed
    with caplog.at_level(logging.INFO, logger="metacherchant"):
        p.update(50)
    assert "Progress: 50.0%" in caplog.text
    # elapsed/frac - elapsed = 10s at 50% -> "10 s"
    assert "remaining time: 10 s" in caplog.text


def test_progress_bytes_fraction(caplog):
    p = Progress(label="reads", log_every=5, total_bytes=1000)
    p.advance_bytes(250)
    with caplog.at_level(logging.INFO, logger="metacherchant"):
        p.update(5)
    assert "Progress: 25.0%" in caplog.text


def test_progress_rate_only(caplog):
    p = Progress(label="reads", log_every=5)
    with caplog.at_level(logging.INFO, logger="metacherchant"):
        p.update(5)
    assert "done" in caplog.text
    assert "Progress:" not in caplog.text
