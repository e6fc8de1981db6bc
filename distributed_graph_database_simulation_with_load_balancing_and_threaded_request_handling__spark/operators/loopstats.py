"""Shared superstep instrumentation: iterative operators record their
MEASURED round counts here (cleared by callers before a run); the
bench harness and the 100x gate read it to put iteration-floor
evidence next to wall times.  Lives in its own leaf module so both
traverse.py and graphalgs.py can write to it without an import cycle.
"""

LOOP_STATS: dict[str, dict] = {}
