from vllm_rs_tpu.transfer.pd import PdClient, PdServer  # noqa: F401
