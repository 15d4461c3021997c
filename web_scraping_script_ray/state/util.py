"""Actor-RPC resilience: under full CPU load (every core busy in fetch /
parse tasks) a zero-CPU state actor can be starved past Ray's 30 s
ordered-call timeout, surfacing ``ActorUnavailableError`` ("timed out
waiting for an earlier seq_no") even though the actor is healthy.

``retry_actor_get(factory)`` re-issues the calls; callers must be
idempotent — seen-set add/probe are set-semantics (safe to repeat),
politeness ``advance`` is guarded by a per-round token on the shard.
"""

from __future__ import annotations

import time


def retry_actor_get(factory, attempts: int = 4, delay: float = 2.0):
    """``factory()`` → list of ObjectRefs (or one); returns ``ray.get`` of
    them, retrying the WHOLE batch on transient actor unavailability."""
    import ray
    from ray.exceptions import ActorUnavailableError, GetTimeoutError

    last = None
    for i in range(attempts):
        try:
            return ray.get(factory())
        except (ActorUnavailableError, GetTimeoutError) as e:  # transient
            last = e
            time.sleep(delay * (i + 1))
    raise last
