"""Heartbeat watchdog (fairseq DistributedTimeoutWrapper analogue)."""
import time

import pytest

from efficient_attention_tpu.utils.watchdog import HeartbeatWatchdog


def test_fires_without_heartbeat():
    fired = []
    wd = HeartbeatWatchdog(0.2, on_timeout=lambda e, t: fired.append(e),
                           poll_interval=0.05)
    wd.start()
    time.sleep(0.6)
    wd.stop()
    assert wd.fired and fired and fired[0] > 0.2


def test_heartbeats_keep_it_alive():
    wd = HeartbeatWatchdog(0.3, on_timeout=lambda e, t: None,
                           poll_interval=0.05)
    wd.start()
    for _ in range(6):
        time.sleep(0.1)
        wd.beat()
    wd.stop()
    assert not wd.fired


def test_context_manager_and_validation():
    with pytest.raises(ValueError):
        HeartbeatWatchdog(0)
    with HeartbeatWatchdog(5.0, on_timeout=lambda e, t: None) as wd:
        wd.beat()
    assert not wd.fired


def test_paused_suspends_timeout():
    """A pause longer than the timeout must not fire (validation /
    checkpoint writes are not training-step stalls — ADVICE r3)."""
    wd = HeartbeatWatchdog(0.2, on_timeout=lambda e, t: None,
                           poll_interval=0.05)
    wd.start()
    with wd.paused():
        time.sleep(0.6)
    # heartbeat was reset on resume; stop before it can expire again
    wd.stop()
    assert not wd.fired


def test_maybe_paused_none_is_noop():
    from efficient_attention_tpu.utils.watchdog import maybe_paused

    with maybe_paused(None):
        pass


def test_pause_is_reentrant():
    wd = HeartbeatWatchdog(0.2, on_timeout=lambda e, t: None,
                           poll_interval=0.05)
    wd.start()
    with wd.paused():
        with wd.paused():
            time.sleep(0.3)
        time.sleep(0.3)
    wd.stop()
    assert not wd.fired
