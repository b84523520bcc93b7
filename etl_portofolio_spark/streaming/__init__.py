"""Incremental & streaming runtime (SURVEY.md §2.8).

Two interchangeable execution modes over the same transforms:

- :mod:`incremental` — the reference's hand-rolled micro-batch loop
  (driver `while` over fixed time windows) as a reusable, idempotent
  runner with partition-layout watermarks.
- :mod:`structured` — the same semantics on Structured Streaming:
  tumbling windows + watermarks + foreachBatch dynamic-overwrite sink.
"""
