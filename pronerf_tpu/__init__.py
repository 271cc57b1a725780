"""pronerf_tpu — a TPU-native JAX framework with the capabilities of ProNeRF.

ProNeRF (IEEE Access 2024) renders LLFF forward-facing scenes with only 8
samples per ray by *learning where to sample*: a Pluecker-encoded sampler MLP
predicts sparse candidate depths, the candidates are projected into neighboring
training views (epipolar inverse warping) to fetch source colors, a refinement
MLP adjusts the depths inside per-sample bins, and a vanilla NeRF MLP is
alpha-composited over the refined points with the sampler's density-correction
terms folded in.

This package is a ground-up TPU-first redesign (reference behavior documented
in SURVEY.md; reference implementation is PyTorch/CUDA/TensorRT):

- all compute-path math is pure-functional JAX compiled by XLA with static
  shapes (one jitted train step per (stage, branch));
- the epipolar warp is an einsum + vectorized bilinear gather (replacing
  ``torch.nn.functional.grid_sample``), and only the per-ray selected
  neighbor views are warped (the reference warps every training view and
  gathers afterwards);
- dynamic sample-count "exploration" is a masked static-width graph instead
  of data-dependent shapes;
- full-frame inference is an AOT-compiled XLA executable over fixed-size ray
  tiles (replacing the ONNX -> TensorRT FP16 engine path);
- multi-chip scaling is data-parallelism over rays on a
  ``jax.sharding.Mesh`` with XLA collectives (the reference is strictly
  single-GPU).
"""

__version__ = "0.1.0"
