"""True Structured Streaming formulations of the reference's pipeline.

The batch-equivalent (oracle-checked) forms live in ``operators/``; these
modules run the same semantics through ``readStream`` micro-batches —
watermarks, windows, stateful dedup, keyed state with timers, and the
broadcast-state-mutation emulation (SURVEY.md §2.E, §7 hard parts).
"""
