"""tlie_tpu — TPU-native sequence-model eigenvalue spectroscopy framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``IntelligentControlSystems/Task-Level-Insights-from-Eigenvalues-across-Sequence-Models``
(arXiv:2510.09379): train six families of sequence models (softmax / linear /
norm attention, Mamba-2/SSD, S4, S5, LRU) on five task families (MQAR,
WikiText LM, sequential CIFAR, LRA ListOps, char-IMDB), then extract the
eigenvalues of each model's effective state-transition operator at init and
after training, binned into radius/phase histograms.

Everything runs on TPU: recurrences are parallel-in-time scans (XLA
associative scan + Pallas chunked kernels), attention is a Pallas flash
kernel, training is a single jitted functional step, sweeps map onto a
``jax.sharding.Mesh``, and the eigen analysis is jitted and batched
on-device.

Package layout (reference layer map in SURVEY.md §1):
  config/    YAML config schema + sweep expansion      (ref launch.py)
  data/      task datasets, device-resident batches    (ref dataloaders/)
  ops/       compute kernels: scans, SSD, attention    (ref 3rd-party CUDA/Triton)
  models/    model families on a unified flax backbone (ref models/)
  training/  jitted train/eval steps, optax groups     (ref jax_helpers/, train.py)
  analysis/  eigenvalue extractors + threshold binning (ref analysis/eval_eig.py)
  parallel/  mesh sweeps, data parallelism             (new: TPU-native capability)
  utils/     logging, profiling
"""

__version__ = "0.1.0"
