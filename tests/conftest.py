"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware."""

import os

# jax is pre-imported by the environment's sitecustomize with
# JAX_PLATFORMS=axon (the remote TPU tunnel, high per-op latency); force the
# CPU backend via the config API, which works post-import as long as no
# backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache makes repeat suite runs fast (first run pays)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402
from pathlib import Path  # noqa: E402

REFERENCE_DATA = Path("/root/reference/data")
DEMO1_SEQ = "24520ce8-038f-4e5e-a455-8c06877504ab"


@pytest.fixture(scope="session")
def demo1_paths():
    seq_dir = REFERENCE_DATA / DEMO1_SEQ
    return {
        "map": seq_dir / f"log_map_archive_{DEMO1_SEQ}.json",
        "scenario": seq_dir / f"scenario_{DEMO1_SEQ}.parquet",
        "seq_id": DEMO1_SEQ,
    }


@pytest.fixture(scope="session")
def demo1_map(demo1_paths):
    from mind_tpu.data import SemanticMap

    return SemanticMap().load_from_argo2(demo1_paths["map"])


@pytest.fixture(scope="session")
def demo1_trajs(demo1_paths, demo1_map):
    from mind_tpu.data import ArgoAgentLoader

    return ArgoAgentLoader(demo1_paths["scenario"]).get_trajs_info(demo1_map)
