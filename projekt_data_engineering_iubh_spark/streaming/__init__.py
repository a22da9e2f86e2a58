"""Structured Streaming variants of the batch semantics (SURVEY.md §2.9).

The reference is daily batch only; these are the latent streaming
semantics it implies, built on event-time processing:

* hourly rollup → watermark + 1-hour tumbling window;
* marker-bounded cycle sessionization → ``applyInPandasWithState``
  (``session_window`` is gap-based and cannot express Cycle_Start/End
  markers);
* idempotent summary sink → ``foreachBatch`` + per-partition overwrite.
"""
