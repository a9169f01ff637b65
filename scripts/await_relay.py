"""Block until the TPU relay answers, then exec a command.

The axon relay dies silently for stretches (observed: ~80 min), during
which every dispatch blocks forever.  ``require_backend`` makes jobs fail
fast; this is the other half — queue the job and start it the moment the
relay recovers:

  python scripts/await_relay.py -- python scripts/eval_farsi.py ...

Each probe is a FRESH subprocess: a hung in-process axon client never
recovers even after the relay does, so polling must not reuse one.
"""

import argparse
import os
import subprocess
import sys
import time

PROBE = ("import jax, numpy as np; "
         "print(float(np.asarray(jax.numpy.ones((8, 8)).sum())))")


def relay_up(timeout_s: float = 60.0) -> bool:
    try:
        r = subprocess.run([sys.executable, "-c", PROBE],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0 and b"64.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poll-s", type=float, default=90.0,
                    help="seconds between probes while the relay is down")
    ap.add_argument("--max-wait-s", type=float, default=4 * 3600.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="command to exec once the relay answers "
                         "(prefix with --)")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given")
    t0 = time.time()
    n = 0
    while time.time() - t0 < args.max_wait_s:
        n += 1
        if relay_up():
            print(f"[await_relay] relay up after {time.time() - t0:.0f}s "
                  f"({n} probes); exec: {' '.join(cmd)}", flush=True)
            os.execvp(cmd[0], cmd)
        print(f"[await_relay] down ({time.time() - t0:.0f}s)", flush=True)
        time.sleep(args.poll_s)
    print(f"[await_relay] gave up after {args.max_wait_s:.0f}s", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
