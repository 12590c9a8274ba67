"""TPU-native generic attention-model explainability framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
hila-chefer/Transformer-MM-Explainability (ICCV 2021): bi-modal and
encoder-decoder transformer explainability via gradient-weighted attention
relevancy propagation, plus the instrumented model zoo (ViT, CLIP,
VisualBERT, LXMERT, DETR), LRP relevance propagation, and the quantitative
perturbation / segmentation evaluation harnesses.

Architecture (TPU-first, not a port):
  * Attention capture is functional: every attention layer consumes an
    additive "tap" on its post-softmax probabilities and returns the
    probabilities as an auxiliary output. One jitted fwd+bwd trace
    (``jax.grad`` w.r.t. the taps) yields the per-layer attention
    gradients that the PyTorch reference collects with
    ``register_hook`` — no hooks, no per-layer autograd calls.
  * The paper's relevancy-update rules run as ``lax.scan`` chains over
    stacked ``[L, H, S, S]`` attention/gradient arrays, with fused
    Pallas kernels for the hot rollout matmul chain.
  * LRP ("relprop") is an explicit reverse interpreter over a functional
    activation tape instead of stateful module hooks.
  * Batch/device scaling uses ``jax.sharding.Mesh`` + NamedSharding; all
    collectives are XLA ops over ICI.
"""

__version__ = "0.1.0"

from transformer_mm_explainability_tpu.ops import relevancy  # noqa: F401
