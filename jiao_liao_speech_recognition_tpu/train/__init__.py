"""Training engine: optax fine-tuning with frozen-backbone param masking,
grad accumulation, pjit DP/FSDP sharding, orbax checkpoints, multi-dialect
schedules.

TPU-native replacement for the reference's accelerate + HF Trainer /
speechbrain.Brain fit loop (SURVEY.md C13, C19): gradient all-reduce falls
out of sharding annotations instead of a DDP wrapper.
"""
