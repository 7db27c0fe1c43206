"""Outage-proof device probing for the relay-attached TPU backend.

When the axon relay worker is down, even ``jax`` backend init hangs with
no output at all (verify SKILL.md), so any probe must run in a BOUNDED
subprocess.  Worker outages routinely last 20+ minutes and recover on
their own, so a single probe that gives up forfeits the round's on-chip
evidence even if the worker comes back an hour later — the probe
therefore retries inside a deadline window before surrendering.

Used by bench.py (the driver's perf artifact) and __graft_entry__.py's
``dryrun_multichip`` so both share one hardened path.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

# One bounded probe: long enough for a healthy-but-cold backend init
# (tunnel warmup of the PLUGIN, not a compile, is a few seconds; 60 s is
# generous), short enough that a dead worker doesn't eat the window.
PROBE_TIMEOUT_S = float(os.environ.get("NMF_TPU_PROBE_TIMEOUT_S", 60))
# Total retry window before falling back (driver-facing callers).  A
# transient outage at the minute the driver fires should not forfeit the
# whole round's TPU artifact.
RETRY_WINDOW_S = float(os.environ.get("NMF_TPU_PROBE_WINDOW_S", 1500))
RETRY_INTERVAL_S = float(os.environ.get("NMF_TPU_PROBE_INTERVAL_S", 120))

_PROBE_SRC = (
    "import jax; d = jax.devices(); "
    "print(d[0].platform, len(d))"
)

# Cross-process probe cache: a dead-worker probe burns its full timeout
# (the backend hangs with NO output), so every caller re-discovering the
# same outage wastes minutes — the driver's dryrun_multichip alone paid
# 240 s per invocation (round-4 verdict).  Each probe writes its result
# here; cached_probe() short-circuits when a result is fresh enough.
CACHE_PATH = os.environ.get("NMF_TPU_PROBE_CACHE",
                            "/tmp/nmf_tpu_probe_cache.json")
CACHE_MAX_AGE_S = float(os.environ.get("NMF_TPU_PROBE_CACHE_AGE_S", 600))


def _cache_write(plat, n, timeout=None) -> None:
    try:
        import json
        if plat is None and timeout is not None:
            # A fresh dead verdict REFRESHES the strongest recent one:
            # the gate's routine 60-s probes must not keep demoting a
            # 240-s caller's dead entry (which would make that caller
            # re-pay its long probe every invocation).  Sound because a
            # worker that recovered would answer even the short probe.
            prev = _cache_read(CACHE_MAX_AGE_S)
            if (prev is not None and prev[0] is None
                    and prev[2] is not None and float(prev[2]) > timeout):
                timeout = float(prev[2])
        tmp = f"{CACHE_PATH}.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"ts": time.time(), "platform": plat, "n": n,
                       "timeout": timeout}, f)
        os.replace(tmp, CACHE_PATH)
    except OSError:
        pass


def _cache_read(max_age_s):
    try:
        import json
        with open(CACHE_PATH) as f:
            d = json.load(f)
        if time.time() - float(d["ts"]) <= max_age_s:
            return d["platform"], int(d["n"]), d.get("timeout")
    except (OSError, ValueError, KeyError):
        pass
    return None


def probe_once(timeout: float = PROBE_TIMEOUT_S):
    """One bounded subprocess probe.

    Returns ``(platform, n_devices)`` or ``(None, 0)`` if the backend is
    dead/hung.  The subprocess inherits the environment, so it sees the
    same plugin search path (PYTHONPATH=/root/.axon_site) and XLA flags
    as the caller.
    """
    try:
        p = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                           capture_output=True, text=True, timeout=timeout)
        if p.returncode == 0 and p.stdout.strip():
            plat, n = p.stdout.strip().splitlines()[-1].split()
            _cache_write(plat, int(n), timeout)
            return plat, int(n)
    except Exception as e:
        print(f"device probe failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    _cache_write(None, 0, timeout)
    return None, 0


def cached_probe(timeout: float = PROBE_TIMEOUT_S,
                 max_age_s: float = CACHE_MAX_AGE_S):
    """probe_once, short-circuited ONLY by a fresh cross-process DEAD
    entry written by a probe whose budget was at least ours — so during
    one outage, repeated callers skip re-paying the dead-worker timeout
    without a 60-s probe's failure ever overriding a 240-s caller's
    budget.  A cached LIVE entry is NEVER trusted: the worker may have
    died since, and a caller acting on a stale LIVE verdict would hand
    its unguarded jax backend init an unbounded hang — re-confirming a
    genuinely live backend costs only seconds."""
    hit = _cache_read(max_age_s)
    if hit is not None:
        plat, n, t = hit
        if plat is None and t is not None and float(t) >= timeout:
            print(f"device probe cache hit: worker dead "
                  f"(probed with {t:.0f}s budget)", file=sys.stderr)
            return None, 0
    return probe_once(timeout)


def probe_with_retry(window_s: float = RETRY_WINDOW_S,
                     interval_s: float = RETRY_INTERVAL_S,
                     probe_timeout_s: float = PROBE_TIMEOUT_S):
    """Probe repeatedly until the backend answers or the window closes.

    Returns ``(platform, n_devices)`` on success, ``(None, 0)`` after the
    deadline.  Progress lines go to stderr so a driver log shows the
    probe is alive, not hung.
    """
    deadline = time.monotonic() + window_s
    attempt = 0
    while True:
        attempt += 1
        plat, n = probe_once(probe_timeout_s)
        if plat is not None:
            if attempt > 1:
                print(f"device probe recovered on attempt {attempt}: "
                      f"{plat} x{n}", file=sys.stderr)
            return plat, n
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print(f"device probe gave up after {attempt} attempts "
                  f"({window_s:.0f}s window)", file=sys.stderr)
            return None, 0
        wait = min(interval_s, remaining)
        print(f"device probe attempt {attempt} found no live backend; "
              f"retrying in {wait:.0f}s ({remaining:.0f}s left in window)",
              file=sys.stderr)
        time.sleep(wait)


def probe_auto(no_wait: bool = False, timeout: float = PROBE_TIMEOUT_S):
    """The harness entry-point policy in one place: a single bounded
    probe for interactive runs (``no_wait``), the full driver retry
    window otherwise.  Returns ``(platform, n_devices)``."""
    return probe_once(timeout) if no_wait else probe_with_retry()
