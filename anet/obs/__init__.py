"""Observability: metrics registry + status indicator."""

from anet.obs.metrics import MetricsRegistry
from anet.obs.status import StatusIndicator, SystemState

__all__ = ["MetricsRegistry", "StatusIndicator", "SystemState"]
