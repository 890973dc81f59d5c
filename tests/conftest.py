"""Test configuration.

Tests run on a virtual 8-device CPU mesh so the multi-chip sharding paths
compile and execute without TPU hardware (the driver separately dry-runs
the multi-chip path; bench.py runs on the real chip).

NOTE: this environment's sitecustomize registers the remote-TPU ("axon")
backend and pins it regardless of JAX_PLATFORMS in the process env; only
``jax.config.update("jax_platforms", ...)`` after import actually wins, so
we do both.  Set AHSOKA_TEST_TPU=1 to run the suite against the real chip.
"""

import os

if os.environ.get("AHSOKA_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
