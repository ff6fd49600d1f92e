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
