"""Production serving: continuous-batching engine for AR decode (whisper
family) and sliding-window streaming transcription (CTC families)."""

from .engine import ServingEngine
from .streaming import (
    StreamingConfig,
    StreamingPool,
    StreamingResult,
    StreamingTranscriber,
)

__all__ = [
    "ServingEngine",
    "StreamingConfig",
    "StreamingPool",
    "StreamingResult",
    "StreamingTranscriber",
]
