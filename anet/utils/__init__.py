"""Host-side utilities: pacing, error aggregation."""

from anet.utils.pacing import LeakyBucket, SimulatedClock
from anet.utils.errors import CombinedError, do_all_and_raise_combined

__all__ = [
    "LeakyBucket",
    "SimulatedClock",
    "CombinedError",
    "do_all_and_raise_combined",
]
