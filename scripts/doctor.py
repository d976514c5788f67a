#!/usr/bin/env python
"""Environment doctor: diagnose the TPU tunnel, zoo, and corpora.

  python scripts/doctor.py            # full check (dials the TPU once)
  python scripts/doctor.py --skip-tpu # host-side checks only

Encodes the tunnel-stall protocol that round 3/4 learned the hard way
(ROADMAP "Infrastructure notes"):

- The single v5e chip is reached through an stdio relay listening on
  localhost ports 8082-8117. NOTHING listening there means the relay
  process is gone and only the remote side can re-dial — no local
  action helps except patient probing.
- A TPU probe is itself a TPU client, and the tunnel tolerates exactly
  ONE client. The probe here runs in a subprocess with a hard deadline
  and `os._exit` (axon spawns non-daemon threads; a plain timeout leaves
  a zombie client that blocks recovery).
- Verdicts: OK (device answered), HANG (init blocked past the deadline —
  the classic stall), ERROR (init raised — a different failure).
"""

import argparse
import socket
import subprocess
import sys
import textwrap
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPO = Path(__file__).resolve().parents[1]

PROBE_SRC = textwrap.dedent("""
    import os, sys, threading
    def work():
        import jax
        # The axon plugin ignores JAX_PLATFORMS from the env; honor it via
        # the config API so CPU-forced drives of this probe stay off-tunnel.
        p = os.environ.get("JAX_PLATFORMS")
        if p:
            jax.config.update("jax_platforms", p)
        d = jax.devices()[0]
        x = jax.numpy.ones((128, 128))
        v = float((x @ x).sum())
        print(f"PROBE_OK {d.platform}/{d.device_kind} checksum={v}",
              flush=True)
        os._exit(0)
    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(%f)
    print("PROBE_HANG", flush=True)
    os._exit(3)
""")


def check_relay() -> tuple[bool, str]:
    """Is anything listening on the relay port range?"""
    open_ports = []
    for port in range(8082, 8118):
        s = socket.socket()
        s.settimeout(0.2)
        try:
            s.connect(("127.0.0.1", port))
            open_ports.append(port)
        except OSError:
            pass
        finally:
            s.close()
    if open_ports:
        return True, f"relay listening on {len(open_ports)} ports " \
                     f"(e.g. {open_ports[:3]})"
    return False, ("NOTHING listening on 8082-8117 — relay process gone; "
                   "only the remote side can re-dial. Probe patiently.")


def check_tpu(deadline_s: float) -> tuple[bool, str]:
    """One fresh-process probe with a hard in-process deadline."""
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c", PROBE_SRC % deadline_s],
            capture_output=True, text=True, timeout=deadline_s + 60)
    except subprocess.TimeoutExpired:
        return False, "probe subprocess itself wedged (killed)"
    out = r.stdout.strip().splitlines()
    last = out[-1] if out else ""
    dt = time.time() - t0
    if last.startswith("PROBE_OK"):
        return True, f"{last} ({dt:.0f}s)"
    if last.startswith("PROBE_HANG"):
        return False, (f"init HANG past {deadline_s:.0f}s — the classic "
                       "tunnel stall; keep ONE patient probe loop, never "
                       "stack clients")
    return False, f"init ERROR: {(r.stderr or '').strip()[-200:]}"


def check_zoo() -> tuple[bool, str]:
    from music_synthesis_tpu import zoo

    names = zoo.list_pretrained()
    if not names:
        return False, "zoo is empty"
    for n in names:
        zoo.load_pretrained(n)  # raises on card/params mismatch
    return True, f"{len(names)} entries load clean: {names}"


def check_corpora() -> tuple[bool, str]:
    roots = sorted((REPO / "runs").glob("corpus*"))
    if not roots:
        return False, "no corpus dirs under runs/"
    parts = []
    for r in roots:
        n = len(list(r.glob("*.wav")))
        parts.append(f"{r.name}: {n} clips")
    return True, "; ".join(parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-tpu", action="store_true",
                    help="host-side checks only (no TPU client dialed)")
    ap.add_argument("--tpu-timeout", type=float, default=240.0)
    args = ap.parse_args()

    checks = [("relay listener", check_relay),
              ("model zoo", check_zoo),
              ("corpora", check_corpora)]
    if not args.skip_tpu:
        checks.insert(1, ("tpu probe",
                          lambda: check_tpu(args.tpu_timeout)))

    failures = 0
    for name, fn in checks:
        try:
            ok, detail = fn()
        except Exception as e:  # a check crashing is itself a finding
            ok, detail = False, f"check crashed: {e}"
        print(f"[{'OK' if ok else '!!'}] {name}: {detail}")
        failures += 0 if ok else 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
