"""Experimental / measured-negative-result code, quarantined from the
default import surface.

Nothing here is imported unless explicitly opted into via config flags
(e.g. ``WaveMambaConfig(conv_impl='fused')``). See each module's docstring
for the measured numbers and the BENCH_NOTES.md entry that closed the
corresponding perf thread.
"""
