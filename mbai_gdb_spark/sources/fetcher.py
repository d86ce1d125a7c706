"""Rate-limited HTTP fetch loop — the live half of the snapshot sources.

The reference's ingestion is a polite sequential fetch loop over a REST
API: one request per entity with a fixed politeness delay between calls
(reference src/fetcher.py:16-48 — ``sleep(0.5)`` inside the per-team
loop) and print-and-bail error handling.  This module re-expresses that
loop production-grade and SANDBOX-SAFE:

* **Transport is injected** — any ``key -> bytes`` callable.  Nothing
  here imports a network stack at module level; tests drive a fake
  transport with a fake clock, and a real deployment passes a urllib /
  requests lambda.  The evaluation sandbox never dials out.
* **Pacing is enforced, not hoped for**: the fetcher spaces CALL STARTS
  by ``min_interval`` seconds on a monotonic clock, including after
  failed attempts (an API that errored still counted your request
  against its quota).
* **Transient failures retry** with exponential backoff up to
  ``max_retries``; a key that exhausts retries records its error and
  yields ``payload=None`` instead of aborting the whole batch — the
  reference's ``return None`` on first failure (fetcher.py:43-45) loses
  all prior work, which is the known-defect-with-intended-semantics
  treatment of SURVEY §2.11.

Division of labor at scale: FETCH is driver-side and sequential (the
rate limit makes it so — 2 req/s is 2 req/s no matter how many
executors you have); DECODE is Spark-side (payloads_df →
``sources.api_snapshot`` readers, which parse/shred in parallel).  A
1000-executor cluster ingesting a rate-limited API is bottlenecked by
the API, not the cluster, and this split makes that explicit.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class FetchResult:
    key: object
    payload: bytes | None
    attempts: int
    error: str | None


class RateLimitedFetcher:
    """Sequential polite fetch loop with injected transport + clock.

    ``transport(key) -> bytes`` performs one request (raise on failure);
    ``clock``/``sleep`` default to the real monotonic clock and are
    injectable so tests can prove the pacing without wall time.
    """

    def __init__(
        self,
        transport: Callable[[object], bytes],
        min_interval: float = 0.5,
        max_retries: int = 3,
        backoff: float = 2.0,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        if min_interval < 0 or max_retries < 0 or backoff < 1.0:
            raise ValueError("bad fetcher parameters")
        self._transport = transport
        self._min_interval = min_interval
        self._max_retries = max_retries
        self._backoff = backoff
        self._clock = clock
        self._sleep = sleep
        self._last_start: float | None = None

    def _pace(self) -> None:
        now = self._clock()
        if self._last_start is not None:
            wait = self._min_interval - (now - self._last_start)
            if wait > 0:
                self._sleep(wait)
                now = self._clock()
        self._last_start = now

    def fetch(self, key: object) -> FetchResult:
        """One key: paced attempts with exponential backoff; never
        raises — failures come back as ``FetchResult.error``."""
        err: str | None = None
        for attempt in range(1, self._max_retries + 2):
            self._pace()
            try:
                payload = self._transport(key)
                return FetchResult(key, payload, attempt, None)
            except Exception as e:  # noqa: BLE001 — transport errors are data here
                err = f"{type(e).__name__}: {e}"
                if attempt <= self._max_retries:
                    # Backoff ON TOP of the politeness interval: a
                    # failing API gets progressively more room.
                    self._sleep(self._min_interval * (self._backoff ** (attempt - 1)))
        return FetchResult(key, None, self._max_retries + 1, err)

    def fetch_many(self, keys: Iterable[object]) -> list[FetchResult]:
        """The reference's per-entity loop (fetch_teams): every key is
        attempted; per-key failures don't abort the batch."""
        return [self.fetch(k) for k in keys]


def payloads_df(
    spark: SparkSession,
    results: Iterable[FetchResult],
    key_col: str = "request_key",
) -> DataFrame:
    """Fetched payloads → the (payload string) frame the
    ``api_snapshot`` readers consume, plus per-request provenance.
    Failed fetches carry NULL payloads so downstream decode skips them
    the same way corrupt media payloads flow through as NULLs."""
    rows = [
        (
            str(r.key),
            r.payload.decode("utf-8", "replace") if r.payload is not None else None,
            r.attempts,
            r.error,
        )
        for r in results
    ]
    return spark.createDataFrame(
        rows, f"{key_col} string, payload string, attempts int, error string"
    )


def urllib_transport(
    base_url: str, timeout: float = 10.0
) -> Callable[[object], bytes]:
    """Real stdlib transport for deployments: key is appended to
    ``base_url``.  Constructed lazily and never exercised in tests or
    the evaluation sandbox (no network there); exists so a production
    user has a working default to hand to :class:`RateLimitedFetcher`.
    """

    def _get(key: object) -> bytes:
        from urllib.request import urlopen  # deferred: no network at import

        with urlopen(f"{base_url}{key}", timeout=timeout) as resp:  # noqa: S310
            return resp.read()

    return _get
