"""Device-mesh parallelism: SNP-sharding, psum-merged MMt, collective
argmax forward selection (SURVEY.md §3.4, §6.8). The rebuild's distribution
layer — the reference has none (OpenMP threads only); this is the
tpu-native answer: named meshes + XLA collectives, no hand-rolled
transport."""
