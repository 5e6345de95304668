"""Test harness configuration.

Runs the whole suite on CPU with 8 virtual XLA devices so the sharded
(SNP-sharded / collective-argmax) code paths are exercised without TPU
hardware, per SURVEY.md §5 ("Multi-host without a cluster"). Set
EAGLE_TEST_TPU=1 to run the suite on the real accelerator instead.

Note: this environment's sitecustomize imports jax at interpreter startup
(so JAX_PLATFORMS is already snapshotted into jax.config before conftest
runs); jax.config.update still works because backends initialize lazily,
and XLA_FLAGS is read at backend-init time.
"""

import os

if os.environ.get("EAGLE_TEST_TPU", "") != "1":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
