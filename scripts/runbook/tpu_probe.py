"""One fresh-process TPU tunnel probe with a hard in-process deadline.

The axon TPU tunnel (stdio relay on ports 8082-8117) tolerates exactly ONE
client at a time and stalls spontaneously (observed: 45 min to >17 h).
A client that dials a dead relay HANGS in backend init rather than raising,
so the probe runs `jax.devices()` on a daemon thread and converts a hang
into a bounded failure. `os._exit` (not sys.exit) because axon init spawns
non-daemon threads that would otherwise keep a zombie TPU client alive —
violating the one-client rule and blocking recovery.

Exit codes: 0 = tunnel OK, 1 = error or hang. Run in a loop (probe_loop.sh);
always a FRESH process per attempt — jax caches a failed backend in-process.
"""

import os
import threading
import time

result = {}


def probe():
    try:
        import jax

        result["devices"] = str(jax.devices())
    except Exception as e:  # noqa: BLE001 - report any init failure
        result["err"] = repr(e)


t = threading.Thread(target=probe, daemon=True)
t0 = time.time()
t.start()
t.join(240)
if "devices" in result:
    print(f"PROBE_OK {result['devices']} in {time.time() - t0:.1f}s", flush=True)
    os._exit(0)
elif "err" in result:
    print(f"PROBE_ERR after {time.time() - t0:.1f}s: {result['err']}", flush=True)
    os._exit(1)
else:
    print(f"PROBE_TIMEOUT (hang) after {time.time() - t0:.1f}s", flush=True)
    os._exit(1)
