"""Failure handling: retries and training checkpoint/resume.

The reference's only integrity machinery is MD5-mismatch redownload
(SURVEY.md §5.3); that survives in :mod:`ocrfa_tpu.api`.  This module adds
the production pieces the reference lacks:

* ``with_retries`` — bounded exponential-backoff retry for transient device
  / transfer failures (the axon relay occasionally drops a round trip).
* ``backend_alive`` — bounded liveness probe: the relay can die such that
  every dispatch blocks FOREVER (no error); long jobs must fail fast
  instead of hanging silently at step 0.
* ``CheckpointManager`` — periodic Orbax snapshots of (params, opt_state,
  step) with resume-from-latest, for long training runs.
"""

from __future__ import annotations

import logging
import os
import time

LOGGER = logging.getLogger(__name__)


def backend_alive(timeout_s: float | None = None) -> bool:
    """True once a trivial dispatch round-trips within ``timeout_s``.

    The observed failure mode (CLAUDE.md): the relay tunnel dies and every
    subsequent dispatch blocks indefinitely with no exception.  The probe
    runs on a daemon thread so a hung dispatch cannot hang the caller.
    Long-running jobs (trainers, benches) should call this first and fail
    fast — a silent step-0 hang wastes the whole allocation.

    ``timeout_s`` defaults to ``$OCRFA_BACKEND_PROBE_S`` or 120.  Raise it
    when another dispatch-heavy job shares the relay: a healthy but busy
    relay can starve the trivial probe past 120 s (observed), and a false
    negative kills a job that would have run fine.
    """
    import os
    import threading

    if timeout_s is None:
        timeout_s = float(os.environ.get("OCRFA_BACKEND_PROBE_S", "120"))

    ok: list = []

    def probe():
        ok.append(_probe_dispatch())

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def _probe_dispatch() -> float:
    """One trivial device round trip (module-level so tests can stub a
    deterministically slow/hung probe — a warm CPU dispatch finishes in
    microseconds, faster than any join() timeout meant to expire first)."""
    import jax
    import numpy as np

    return float(np.asarray(jax.numpy.ones((8, 8)).sum()))


def require_backend(timeout_s: float | None = None) -> None:
    """``backend_alive`` or raise RuntimeError (for script entry points)."""
    if not backend_alive(timeout_s):
        raise RuntimeError(
            "no dispatch completed within the probe window — device "
            "backend unreachable (relay down?); refusing to start a job "
            "that would hang at step 0.  If another job is hammering the "
            "relay, raise OCRFA_BACKEND_PROBE_S instead."
        )


def with_retries(fn, *args, retries: int = 3, backoff_s: float = 0.5,
                 retriable=(RuntimeError, OSError), **kwargs):
    """Call ``fn``; on a retriable error, back off and retry up to
    ``retries`` times before re-raising."""
    attempt = 0
    while True:
        try:
            return fn(*args, **kwargs)
        except retriable as exc:
            attempt += 1
            if attempt > retries:
                raise
            delay = backoff_s * (2 ** (attempt - 1))
            LOGGER.warning(
                "retriable failure in %s (attempt %d/%d): %s — retrying in %.1fs",
                getattr(fn, "__name__", fn), attempt, retries, exc, delay,
            )
            time.sleep(delay)


class CheckpointManager:
    """Periodic training snapshots + resume.

    Layout: ``<root>/step_<n>/{params,opt_state}`` via Orbax; ``latest``
    marker file points at the newest complete snapshot.
    """

    def __init__(self, root: str, every_steps: int = 1000, keep: int = 3):
        self.root = root
        self.every_steps = every_steps
        self.keep = keep
        os.makedirs(root, exist_ok=True)

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.root, f"step_{step}")

    def maybe_save(self, step: int, params, opt_state) -> bool:
        if step % self.every_steps != 0:
            return False
        self.save(step, params, opt_state)
        return True

    def save(self, step: int, params, opt_state) -> None:
        from ocrfa_tpu.checkpoints import save_pytree

        d = self._step_dir(step)
        save_pytree(os.path.join(d, "params"), params)
        save_pytree(os.path.join(d, "opt_state"), opt_state)
        with open(os.path.join(self.root, "latest"), "w") as f:
            f.write(str(step))
        self._gc()

    def latest_step(self):
        marker = os.path.join(self.root, "latest")
        if not os.path.exists(marker):
            return None
        return int(open(marker).read().strip())

    def restore(self, step: int | None = None, params_like=None,
                opt_state_like=None):
        """Returns ``(step, params, opt_state)`` or None if no snapshot.

        Pass ``opt_state_like`` (e.g. a freshly-initialised optimizer state)
        when the optimizer state contains NamedTuples — Orbax needs the
        structure template to rebuild them."""
        from ocrfa_tpu.checkpoints import load_pytree

        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        d = self._step_dir(step)
        if not os.path.isdir(d):
            return None  # e.g. garbage-collected snapshot
        return (
            step,
            load_pytree(os.path.join(d, "params"), like=params_like),
            load_pytree(os.path.join(d, "opt_state"), like=opt_state_like),
        )

    def _gc(self) -> None:
        steps = sorted(
            int(n.split("_")[1]) for n in os.listdir(self.root)
            if n.startswith("step_")
        )
        import shutil

        for old in steps[:-self.keep]:
            shutil.rmtree(self._step_dir(old), ignore_errors=True)
