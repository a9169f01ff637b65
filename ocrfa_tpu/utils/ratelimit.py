"""Token-bucket rate limiting + API-key auth policy for the serving
front-ends (HTTP ``server.py`` and gRPC ``server_grpc.py``).

The reference has no serving layer at all; this is production hardening
for the TPU-side servers: a shared :class:`AuthPolicy` checks a bearer
API key and applies a per-key (or per-client) token bucket, so one noisy
client cannot monopolise the single device dispatcher.
"""

from __future__ import annotations

import threading
import time


class TokenBucket:
    """Classic token bucket: ``rate`` tokens/s, capacity ``burst``.

    Thread-safe; ``clock`` is injectable for tests.
    """

    def __init__(self, rate: float, burst: float, clock=time.monotonic):
        if rate <= 0 or burst <= 0:
            raise ValueError("rate and burst must be positive")
        self.rate = float(rate)
        self.burst = float(burst)
        self._clock = clock
        self._tokens = float(burst)
        self._last = clock()
        self._lock = threading.Lock()

    def try_acquire(self, n: float = 1.0) -> bool:
        with self._lock:
            now = self._clock()
            self._tokens = min(self.burst,
                               self._tokens + (now - self._last) * self.rate)
            self._last = now
            if self._tokens >= n:
                self._tokens -= n
                return True
            return False


class KeyedRateLimiter:
    """One token bucket per caller key (API key or client address)."""

    def __init__(self, rate: float, burst: float, clock=time.monotonic,
                 max_keys: int = 4096):
        self.rate = rate
        self.burst = burst
        self._clock = clock
        self._buckets: dict[str, TokenBucket] = {}
        self._lock = threading.Lock()
        self._max_keys = max_keys

    def try_acquire(self, key: str) -> bool:
        with self._lock:
            bucket = self._buckets.get(key)
            if bucket is None:
                if len(self._buckets) >= self._max_keys:
                    # drop the stalest entries wholesale; refilling from
                    # full burst is the safe failure direction
                    self._buckets.clear()
                bucket = TokenBucket(self.rate, self.burst, self._clock)
                self._buckets[key] = bucket
        return bucket.try_acquire()


class AuthPolicy:
    """API-key auth + per-caller rate limit, front-end agnostic.

    Args:
      api_keys: iterable of accepted bearer keys; ``None`` disables auth.
      rate/burst: per-caller token bucket; ``rate=None`` disables limiting.

    ``check(token, caller)`` returns ``None`` when the request may
    proceed, else one of ``"unauthenticated"`` / ``"rate_limited"``.
    """

    def __init__(self, api_keys=None, rate: float | None = None,
                 burst: float | None = None, clock=time.monotonic):
        self.api_keys = frozenset(api_keys) if api_keys is not None else None
        self.limiter = (
            KeyedRateLimiter(rate, burst if burst is not None else max(1.0, rate),
                             clock)
            if rate is not None else None
        )

    @staticmethod
    def bearer(value: str | None) -> str | None:
        """Extract the key from an ``Authorization`` header/metadata value
        (accepts both ``Bearer <key>`` and a bare key)."""
        if not value:
            return None
        if value.lower().startswith("bearer "):
            return value[7:].strip()
        return value.strip()

    def check(self, token: str | None, caller: str = "") -> str | None:
        if self.api_keys is not None and token not in self.api_keys:
            return "unauthenticated"
        if self.limiter is not None:
            # bucket key: the token only once it has been VALIDATED against
            # api_keys (above) — with auth disabled, keying on a
            # client-supplied token would let callers rotate tokens for a
            # fresh bucket each request, so fall back to the caller address
            key = token if self.api_keys is not None else (
                caller or "anonymous")
            if not self.limiter.try_acquire(key):
                return "rate_limited"
        return None
