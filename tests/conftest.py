"""Test configuration: run on host CPU with a virtual 8-device mesh.

The container's sitecustomize imports jax and registers the remote 'axon' TPU
backend at interpreter startup, so env vars set here are too late — use
jax.config instead (works as long as no computation ran yet).
"""
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # older jax: fall back to env (only works if set pre-python)
    pass
jax.config.update("jax_enable_x64", False)
