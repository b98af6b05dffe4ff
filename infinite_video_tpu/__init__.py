"""infinite_video_tpu — TPU-native rebuild of ∞-Video (deep-spin/Infinite-Video).

A training-free long-video understanding framework: chunked video features are
consolidated into a fixed-size continuous-time long-term memory (LTM) via ridge
regression onto basis functions, queried with continuous attention (numerical
integration of a Gibbs density over time), updated across unbounded chunks with
τ-contraction and sticky-memory resampling, and blended with discrete
cross-attention inside a BLIP-2 style Q-former feeding a frozen LLM.

Design (TPU-first, not a port):
  - LTM state is an explicit pytree threaded through `jax.lax.scan` — constant
    HBM footprint for unbounded video (reference keeps mutable state inside
    nn.Module: infty-Video-LLaMA/InfVideoLLaMA/models/long_term_attention_gibbs.py:59).
  - Ridge-fit G matrices are pure functions of static config, precomputed on
    host and baked as trace-time constants (reference rebuilds + inverts an
    N×N matrix every forward: long_term_attention_gibbs.py:67-165).
  - Continuous attention is expressed as dense matmuls with trapezoid weights
    folded in — maps directly onto the MXU; hot path optionally fused in Pallas.
  - Multi-chip scaling via jax.sharding Mesh + explicit collectives, not NCCL.
"""

__version__ = "0.1.0"
