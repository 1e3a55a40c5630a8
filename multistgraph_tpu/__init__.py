"""multistgraph_tpu — a TPU-native spatio-temporal graph forecasting framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
Multi-ATGCN reference stack (SonghuaHu-UMD/MultiSTGraph): LibCity-style atomic
dataset loading (.geo/.rel/.dyna/.ext/.static/.gbst), multi-view graph
construction (OD / distance / semantic / learned adaptive adjacency),
multi-head temporal sampling (closeness/period/trend) with learned gated
fusion, an adaptive-graph-convolution GRU encoder, a jit-compiled training
executor, and per-horizon masked-metric evaluation with group-based
destandardization — scaling from one TPU chip to multi-host meshes via
`jax.sharding` and Pallas SpMM/SDDMM kernels.

Layer map (mirrors reference SURVEY.md §1, re-designed TPU-first):
    config/    — layered config-precedence engine (ref: libcity/config/config_parser.py)
    data/      — atomic files, scalers, MTH windowing, device-resident batches
    graph/     — Laplacians, haversine geometry, multi-view adjacency
    models/    — flax modules; MultiATGCN with lax.scan recurrence
    ops/       — masked losses/metrics, Pallas SpMM/SDDMM kernels
    executor/  — jitted train/eval loops, optax optimizers, checkpoints
    evaluator/ — per-horizon metric accumulation + group retransform
    parallel/  — mesh construction, shardings, hyperparameter trial runner
"""

__version__ = "0.1.0"
