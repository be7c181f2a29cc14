"""Watchdog for device->host fetches over an unreliable transport.

The dev transport this framework trains over (a tunneled PJRT client)
intermittently wedges a device->host RPC forever: the fetch never
completes, never errors, and — because the service serializes requests —
every later fetch from the process queues behind it (observed repeatedly:
PERF_LOG round-4 outage note; round-5 fern runs 1-2 died at an i_print
loss pull and the initial mask-bbox pull with zero CPU and all threads in
futex/ep_poll). Killing the wedged client frees the service for the next
one, so the correct recovery is: abort the process with a distinctive
exit code and let a wrapper relaunch it to resume from the last
checkpoint (tools/resilient_run.py).

Opt-in via ``DVGO_FETCH_WATCHDOG=<seconds>`` (unset/0 = every guard is a
no-op — unit tests and healthy local backends never see a watchdog
thread). Each guarded fetch registers a deadline; a daemon thread scans
every 2 s and calls ``os._exit(EXIT_WEDGED)`` when any active fetch
overruns. ``os._exit`` is deliberate: the wedged RPC holds process locks
(the PJRT client's), so a clean shutdown would itself hang.

No analogue in the reference (its device is local PCIe); this subsystem
exists because the TPU path is remote.
"""

import os
import sys
import threading
import time

EXIT_WEDGED = 17

_state = {
    "lock": threading.Lock(),
    "active": {},      # key -> (t_start, timeout_s, label)
    "thread": None,
    "n": 0,
    "on_abort": None,  # callback run (bounded, host-side only) before exit
}


def set_abort_callback(fn):
    """Register a host-side-only callback the watchdog runs right before
    ``os._exit`` — e.g. bench.py prints its partially-accumulated JSON so
    a wedge mid-bench still yields an artifact. The callback MUST NOT
    touch the device (any device call would queue behind the wedge)."""
    _state["on_abort"] = fn


def timeout_default():
    """Configured watchdog seconds (0 = disabled)."""
    try:
        return float(os.environ.get("DVGO_FETCH_WATCHDOG", "0") or "0")
    except ValueError:
        return 0.0


def _watch():
    while True:
        time.sleep(2.0)
        now = time.time()
        with _state["lock"]:
            items = list(_state["active"].items())
        for _key, (t0, tmo, label) in items:
            if now - t0 > tmo:
                print(
                    f"fetchguard: device->host fetch '{label}' stuck "
                    f"{now - t0:.0f} s (> {tmo:.0f} s): transport fetch "
                    f"path wedged; aborting for resume (exit {EXIT_WEDGED})",
                    file=sys.stderr, flush=True)
                cb = _state["on_abort"]
                if cb is not None:
                    try:
                        cb(label)
                    except Exception as e:  # never let the callback wedge us
                        print(f"fetchguard: abort callback failed: {e!r}",
                              file=sys.stderr, flush=True)
                try:
                    sys.stdout.flush()
                except Exception:
                    pass
                os._exit(EXIT_WEDGED)


class guarded:
    """Context manager marking a device->host fetch the watchdog covers.

    ``timeout`` overrides ``DVGO_FETCH_WATCHDOG`` for this fetch (large
    pulls — checkpoints, eval frames — deserve a bigger budget than a
    4-byte loss pull)."""

    def __init__(self, label, timeout=None):
        self.timeout = timeout_default() if timeout is None else timeout
        self.label = label
        self.key = None

    def __enter__(self):
        if self.timeout <= 0:
            return self
        with _state["lock"]:
            _state["n"] += 1
            self.key = _state["n"]
            _state["active"][self.key] = (
                time.time(), self.timeout, self.label)
            if _state["thread"] is None:
                th = threading.Thread(
                    target=_watch, daemon=True, name="fetchguard")
                _state["thread"] = th
                th.start()
        return self

    def __exit__(self, *exc):
        if self.key is not None:
            with _state["lock"]:
                _state["active"].pop(self.key, None)
        return False


def guarded_get(x, label, timeout=None):
    """``jax.device_get`` under the watchdog."""
    import jax
    with guarded(label, timeout):
        return jax.device_get(x)
