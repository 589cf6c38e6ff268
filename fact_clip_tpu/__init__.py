"""fact_clip_tpu: a TPU-native (JAX/XLA/Pallas/pjit) temporal action
segmentation framework with the capabilities of the FACT / FACT_CLIP
reference (frame-action cross-attention temporal modeling + open-vocabulary
CLIP text-embedding head).

Subpackages
-----------
configs   yacs-compatible config tree + CLI assembly (schema-identical to ref)
ops       TPU compute primitives: dilated TCN stacks, cross-attention that
          exposes probabilities/logits, masked bidirectional GRU, static-shape
          segment pooling (TDU), Pallas kernels for the hot paths
models    FACT blocks and models as flax modules over padded, batched videos
data      host-side dataset registry, feature/label IO, bucketed batching
parallel  device mesh + data/sequence-parallel sharding helpers
engine    train state, jitted train/eval steps, checkpointing, train loop
utils     host-side metrics, segment utilities, results store
"""

__version__ = "0.1.0"
