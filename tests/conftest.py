"""Test configuration: force CPU with 8 virtual devices so sharding and
collective logic is exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the environment pins JAX_PLATFORMS=axon (TPU tunnel); tests run on the
# host CPU with 8 virtual devices regardless
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402

from vllm_rs_tpu.config import (  # noqa: E402
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)


@pytest.fixture(scope="session")
def tiny_config() -> ModelConfig:
    return ModelConfig(
        model_type="llama",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=512,
        rope_theta=10000.0,
        eos_token_ids=(0,),
    )


@pytest.fixture(scope="session")
def tiny_engine_config(tiny_config) -> EngineConfig:
    return EngineConfig(
        model=tiny_config,
        cache=CacheConfig(block_size=4, num_blocks=128),
        scheduler=SchedulerConfig(
            max_num_seqs=8,
            chunk_size=32,
            max_model_len=128,
            prefill_buckets=(8, 16, 32),
        ),
        prefill_buckets=(8, 16, 32),
        decode_buckets=(4, 8),
    )
