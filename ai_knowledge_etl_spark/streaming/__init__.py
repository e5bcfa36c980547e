"""Streaming / iterative dataflow (SURVEY §2.J).

The reference's crawl loop is a stateful work queue, not an event-time
stream; its Spark re-expression is a batch-iterative frontier loop
(frontier.py). Event-time semantics (windows, watermarks, sessions) enter
via the north-star `events` table (events.py). Politeness pacing becomes a
deterministic per-domain schedule plus an executor-side token bucket
(politeness.py).
"""
