"""utils/deviceprobe: the outage-proof bounded-probe helper used by
bench.py and __graft_entry__ (a transient relay outage must not forfeit
a round's TPU artifact — VERDICT r3 items 1/3/7).

The real-subprocess path is exercised by the driver itself (bench.py /
dryrun_multichip) and cannot be unit-tested here: the axon sitecustomize
force-registers the relay backend in every child regardless of env, so
a probe subprocess on a worker-down rig hangs by design (that hang is
the thing the bounded timeout exists for).  These tests pin the retry
WINDOW semantics with a mocked single probe.
"""
import time

from nmf_toolbox_tpu.utils import deviceprobe as dp


def test_retry_window_succeeds_after_transient_outage(monkeypatch):
    calls = {"n": 0}

    def flaky(timeout=None):
        calls["n"] += 1
        return (None, 0) if calls["n"] < 3 else ("tpu", 1)

    monkeypatch.setattr(dp, "probe_once", flaky)
    t0 = time.monotonic()
    plat, n = dp.probe_with_retry(window_s=60, interval_s=0.01)
    assert (plat, n) == ("tpu", 1) and calls["n"] == 3
    assert time.monotonic() - t0 < 5


def test_retry_window_gives_up_at_deadline(monkeypatch):
    calls = {"n": 0}

    def dead(timeout=None):
        calls["n"] += 1
        return None, 0

    monkeypatch.setattr(dp, "probe_once", dead)
    plat, n = dp.probe_with_retry(window_s=0.05, interval_s=0.02)
    assert (plat, n) == (None, 0)
    assert calls["n"] >= 2  # retried at least once before surrendering
