"""Test environment: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware.

Note: plain env vars are NOT enough here — the image's sitecustomize
registers the axon (TPU) PJRT plugin at interpreter start and the platform
choice must be overridden through jax.config before first backend use.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
