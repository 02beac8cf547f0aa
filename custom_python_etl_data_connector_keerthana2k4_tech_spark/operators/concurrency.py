"""Driver-side job overlap for independent Spark actions.

Spark's scheduler runs jobs submitted from several driver threads
concurrently (FIFO: later jobs back-fill executors the earlier job's
tail frees). Store maintenance verbs issue several INDEPENDENT actions
back to back — the postings leg and the doclen sidecar leg of one
generation, or the two staged payloads of one paired intent — and
running them sequentially leaves the cluster idle through every job's
scheduling/commit tail. ``run_jobs`` submits them from a small thread
pool instead: same jobs, same results, overlapped wall clock.

Semantics: every thunk runs to completion (no cancellation on sibling
failure — a half-written temp dir is swept by the caller's normal crash
path); the FIRST exception re-raises after all threads finish, so error
behavior matches the sequential loop a caller is replacing.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor


def run_jobs(thunks: Sequence[Callable[[], object]]) -> list:
    """Run independent Spark actions concurrently; returns their results
    in input order. One thunk is run inline (no pool for the degenerate
    case)."""
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        results, first_err = [], None
        for f in futures:
            try:
                results.append(f.result())
            except BaseException as e:  # noqa: BLE001 - re-raised below
                if first_err is None:
                    first_err = e
                results.append(None)
        if first_err is not None:
            raise first_err
        return results
