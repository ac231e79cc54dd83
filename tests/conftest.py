"""Test harness: force JAX onto CPU with 8 virtual devices so sharding /
multi-chip code paths are exercised without TPU hardware.

Note: this environment pre-imports jax via sitecustomize (PYTHONPATH
/root/.axon_site), so env vars are too late — use jax.config, which
works as long as the backend has not been initialized yet.
"""
import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Don't export/serialize every trainer step the suite builds — the AOT
# cache is for CLI restart latency, not tests (test_aot.py re-enables it).
os.environ.setdefault("DFNET_TPU_NO_AOT", "1")
