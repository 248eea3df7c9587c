"""Production serving: continuous-batching engine for AR decode."""

from .engine import ServingEngine

__all__ = ["ServingEngine"]
