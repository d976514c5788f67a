"""Regression tests for bench.py's backend-acquisition hardening.

Round 3 lost its driver-verified perf number to a single unguarded
``jax.devices()`` call (BENCH_r03.json rc=1). These tests pin the retry
contract: raising backends re-exec a fresh process with a bumped attempt
counter, hangs are converted to retries by the watchdog, and the final
attempt exits rc=1 (hard exit — a plain raise would hang interpreter
shutdown when axon leaves non-daemon threads behind).

Each scenario runs in a subprocess so the monkeypatching (and os._exit)
cannot leak into the test session.
"""

import subprocess
import sys
import textwrap
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)


def _run(body: str) -> subprocess.CompletedProcess:
    code = textwrap.dedent(f"""
        import os, sys
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, {REPO!r})
        import bench
        {textwrap.indent(textwrap.dedent(body), '        ').strip()}
    """)
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=180,
    )


def test_raise_schedules_fresh_process_retry():
    r = _run("""
        calls = {}
        bench.time.sleep = lambda s: calls.setdefault("slept", s)
        def fake_execv(exe, argv):
            print("EXECV attempt=" + os.environ["MSYNTH_BENCH_ATTEMPT"],
                  "slept=" + str(calls["slept"]))
            os._exit(0)
        os.execv = fake_execv
        bench.jax.devices = lambda *a: (_ for _ in ()).throw(
            RuntimeError("UNAVAILABLE: tunnel"))
        os.environ.pop("MSYNTH_BENCH_ATTEMPT", None)
        bench.acquire_device()
    """)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "EXECV attempt=1 slept=60" in r.stdout
    assert "UNAVAILABLE" in r.stderr


def test_hang_is_converted_to_retry_by_watchdog():
    r = _run("""
        import threading
        bench._BENCH_INIT_DEADLINE_S = 0.5
        bench.time.sleep = lambda s: None
        def fake_execv(exe, argv):
            print("EXECV_ON_HANG")
            os._exit(0)
        os.execv = fake_execv
        ev = threading.Event()
        bench.jax.devices = lambda *a: ev.wait(300)  # hang past deadline
        os.environ.pop("MSYNTH_BENCH_ATTEMPT", None)
        bench.acquire_device()
    """)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "EXECV_ON_HANG" in r.stdout
    assert "tunnel stall" in r.stderr


def test_first_light_hang_retries_despite_healthy_init():
    # Round-4 pathology: the tunnel serves device enumeration but every
    # compile RPC stalls. Init-only probing returns a device and the first
    # real jit then hangs the whole capture; the first-light gate must
    # convert that into the same fresh-process retry as an init hang.
    r = _run("""
        import threading
        bench._BENCH_INIT_DEADLINE_S = 0.5
        bench._BENCH_LIGHT_DEADLINE_S = 0.5
        bench.time.sleep = lambda s: None
        def fake_execv(exe, argv):
            print("EXECV_ON_LIGHT_HANG")
            os._exit(0)
        os.execv = fake_execv
        ev = threading.Event()
        class FakeDev:
            platform = "cpu"
        bench.jax.devices = lambda *a: [FakeDev()]   # enumeration healthy
        bench.jax.jit = lambda f: lambda x: ev.wait(300)  # compile stalls
        os.environ.pop("MSYNTH_BENCH_ATTEMPT", None)
        bench.acquire_device()
    """)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "EXECV_ON_LIGHT_HANG" in r.stdout
    assert "tunnel stall" in r.stderr
    # The two-phase deadline must classify this as a compile-phase stall
    # (advisor r4: init hang vs compile stall were indistinguishable).
    assert "first-light compile" in r.stderr


def test_total_budget_exhaustion_hard_exits_rc1():
    # Advisor r4: the retry loop could burn ~50 min of the driver's capture
    # window. A total wall budget across re-execs must cap it even when
    # attempts remain.
    r = _run("""
        import time
        bench.jax.devices = lambda *a: (_ for _ in ()).throw(
            RuntimeError("UNAVAILABLE: tunnel"))
        os.environ.pop("MSYNTH_BENCH_ATTEMPT", None)   # attempts remain
        os.environ["MSYNTH_BENCH_FIRST_TS"] = repr(
            time.time() - bench._BENCH_TOTAL_BUDGET_S - 1)
        bench.acquire_device()
        print("NOT REACHED")
    """)
    assert r.returncode == 1
    assert "budget" in r.stderr
    assert "NOT REACHED" not in r.stdout


def test_final_attempt_hard_exits_rc1():
    r = _run("""
        bench.jax.devices = lambda *a: (_ for _ in ()).throw(
            RuntimeError("UNAVAILABLE: tunnel"))
        os.environ["MSYNTH_BENCH_ATTEMPT"] = str(bench._BENCH_ATTEMPTS - 1)
        bench.acquire_device()
        print("NOT REACHED")
    """)
    assert r.returncode == 1
    assert "final attempt" in r.stderr
    assert "NOT REACHED" not in r.stdout


def test_healthy_backend_returns_device():
    r = _run("""
        os.environ.pop("MSYNTH_BENCH_ATTEMPT", None)
        dev = bench.acquire_device()
        print("PLATFORM=" + dev.platform)
    """)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PLATFORM=cpu" in r.stdout
