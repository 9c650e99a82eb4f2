"""tcresnet_tpu — a TPU-native keyword-spotting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
hyperconnect/TC-ResNet (TF-1.13 reference): Google Speech Commands
training/eval/export for 12 small-footprint KWS CNN families, redesigned
TPU-first:

- The MFCC/log-mel DSP front end is expressed as batched MXU matmuls
  (framing -> windowed real-DFT matmul -> mel matmul -> log -> DCT matmul)
  with an optional fused Pallas kernel (`tcresnet_tpu.ops.pallas`).
- Augmentation (time shift, background-noise mixing, silence injection)
  runs *inside* the jitted train step with keyed randomness
  (reference: datasets/augmentation_factory.py did this per-element on
  CPU threads via tf.data).
- The whole dataset lives in HBM as int16; the steady-state train loop
  is purely device-side (no host in the loop).
- Data parallelism via jax.sharding.Mesh + jit shardings; gradient
  all-reduce is emitted by XLA over ICI.
"""

__version__ = "0.1.0"
