"""Supervise a TPU job across relay outages.

The axon relay dies silently for stretches (observed: ~80 min) and also
FLAPS — one probe answers, the next dispatch hangs.  ``require_backend``
makes jobs fail fast; this is the other half: wait for a STABLE relay
(several consecutive good probes), launch the job, and relaunch it if it
dies early (its own fail-fast probe tripping counts as "relay flapped,
try again"):

  python scripts/await_relay.py -- python scripts/eval_farsi.py ...

Each probe is a FRESH subprocess: a hung in-process axon client never
recovers even after the relay does, so polling must not reuse one.

The relay also has a DEGRADED-BUT-UP state (observed after a >2 h outage):
the first dispatch of every fresh client takes 30-150 s (handshake/remote
compile), after which dispatches are normal speed.  A 60 s probe timeout
reads that state as "down" forever, even though a long-lived job would run
fine — hence the generous --probe-timeout-s default; the probe burns its
budget only when the relay really is down or degraded.
"""

import argparse
import subprocess
import sys
import time

PROBE = ("import jax, numpy as np; "
         "print(float(np.asarray(jax.numpy.ones((8, 8)).sum())))")

# One default, used by both relay_up() and --probe-timeout-s (they drifted
# apart once already): must cover the degraded-relay first-dispatch cost.
PROBE_TIMEOUT_S = 210.0
# After the FIRST good probe the client-handshake cost is known paid-able;
# follow-up stability probes only confirm the relay isn't flapping, so they
# can use a tighter deadline instead of burning 210 s each on a flap.
STABLE_PROBE_TIMEOUT_S = 90.0


def relay_up(timeout_s: float = PROBE_TIMEOUT_S) -> bool:
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
    ap.add_argument("--probe-timeout-s", type=float,
                    default=PROBE_TIMEOUT_S,
                    help="per-probe dispatch deadline.  Must cover the "
                         "degraded-relay first-dispatch cost (30-150 s "
                         "measured) or every probe of an UP relay fails; "
                         "stability re-probes after the first success use "
                         f"the tighter {STABLE_PROBE_TIMEOUT_S:.0f}s")
    ap.add_argument("--stable-probes", type=int, default=3,
                    help="consecutive good probes (spaced --stable-gap-s) "
                         "required before launching — one good probe does "
                         "NOT mean the relay will survive the next dispatch")
    ap.add_argument("--stable-gap-s", type=float, default=30.0)
    ap.add_argument("--retries", type=int, default=6,
                    help="relaunches after the job dies within --early-s "
                         "(a crash that fast is a relay flap, not the job)")
    ap.add_argument("--early-s", type=float, default=600.0)
    ap.add_argument("--max-wait-s", type=float, default=6 * 3600.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="command to run once the relay is stable "
                         "(prefix with --)")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given")
    t0 = time.time()
    launches = 0
    good = 0
    while time.time() - t0 < args.max_wait_s:
        timeout = (min(args.probe_timeout_s, STABLE_PROBE_TIMEOUT_S)
                   if good else args.probe_timeout_s)
        if relay_up(timeout):
            good += 1
            if good < args.stable_probes:
                time.sleep(args.stable_gap_s)
                continue
            launches += 1
            print(f"[await_relay] relay stable ({good} probes, "
                  f"{time.time() - t0:.0f}s); launch #{launches}: "
                  f"{' '.join(cmd)}", flush=True)
            ts = time.time()
            rc = subprocess.call(cmd)
            ran_s = time.time() - ts
            if rc == 0:
                print(f"[await_relay] job done rc=0 ({ran_s:.0f}s)",
                      flush=True)
                return 0
            if rc == 2 and ran_s < 30.0:
                # argparse exits 2 on a usage error, near-instantly —
                # retrying would loop forever on a typo'd flag (observed:
                # a negative flag value without the `=` form)
                print(f"[await_relay] job rc=2 after {ran_s:.0f}s — "
                      "usage error (argparse), not a relay flap; "
                      "aborting", flush=True)
                return rc
            if ran_s > args.early_s or launches > args.retries:
                print(f"[await_relay] job rc={rc} after {ran_s:.0f}s — "
                      "not retrying (ran past --early-s or out of "
                      "retries)", flush=True)
                return rc
            print(f"[await_relay] job rc={rc} after {ran_s:.0f}s — "
                  "relay flap suspected, re-awaiting", flush=True)
            good = 0
        else:
            good = 0
            print(f"[await_relay] down ({time.time() - t0:.0f}s)",
                  flush=True)
            time.sleep(args.poll_s)
    print(f"[await_relay] gave up after {args.max_wait_s:.0f}s", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
