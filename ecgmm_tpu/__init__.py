"""ecgmm_tpu — TPU-native multimodal ECG classification framework.

A ground-up JAX / Flax / optax / orbax / Pallas rebuild of the capabilities of
the reference PyTorch research codebase (hyeeiin/ECG-Multimodal-Model):
trimodal (image / 1-D signal / clinical tabular) ECG classification with
attention fusion, a sharded data-parallel training engine, cross-validation
harnesses, explainability (Grad-CAM / gradient-SHAP / LIME / TabNet masks),
external-dataset tasks (PTB-XL, PhysioNet/CinC 2017), and an inference
serving layer.

Design principles (TPU-first, not a port):
  * all compute-path code is functional JAX compiled via jit/pjit; batch
    parallelism is expressed with ``jax.sharding`` over a device ``Mesh``
    and XLA-inserted collectives, never host loops;
  * preprocessing is materialised offline into HBM-resident arrays (the
    reference's per-__getitem__ scipy work is the CPU bottleneck there);
  * hot fused ops (SE gating, scale-concat-LayerNorm fusion head, focal
    loss) have Pallas TPU kernels with XLA fallbacks;
  * models are channels-last (NLC / NHWC) to map onto MXU tiling.
"""

__version__ = "0.1.0"

from ecgmm_tpu import config as config  # noqa: F401
