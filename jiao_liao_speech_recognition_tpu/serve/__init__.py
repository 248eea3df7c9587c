"""Production serving: continuous-batching engine for AR decode (whisper
family) and sliding-window streaming transcription (CTC families)."""

from .engine import ServingEngine
from .streaming import StreamingConfig, StreamingResult, StreamingTranscriber

__all__ = [
    "ServingEngine",
    "StreamingConfig",
    "StreamingResult",
    "StreamingTranscriber",
]
