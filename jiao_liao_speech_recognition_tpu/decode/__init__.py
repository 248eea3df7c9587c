"""Decoding: CTC greedy / prefix beam search, Whisper AR generate.

TPU-native replacement for SpeechBrain CTC searchers and
WhisperGenerationMixin.generate (SURVEY.md C14). No external LM fusion —
faithful to the reference, whose lockfile has no kenlm/pyctcdecode.
"""

from .ctc import ctc_greedy_decode, ctc_prefix_beam_search  # noqa: F401
