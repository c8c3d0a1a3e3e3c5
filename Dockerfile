# Serving image for Cloud TPU VMs (reference Dockerfile.* analog).
#
#   docker build -t vllm-rs-tpu .
#   docker run --privileged --net=host \
#     -v /path/to/models:/models vllm-rs-tpu \
#     --model /models/Meta-Llama-3.1-8B-Instruct --quant int4 --port 8000
#
# --privileged + host networking are the standard Cloud TPU container
# requirements (the TPU driver is reached through /dev and libtpu).
FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

# libtpu-backed jax for TPU VMs; CPU wheels land otherwise (dev/testing)
RUN pip install --no-cache-dir "jax[tpu]" \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax

WORKDIR /opt/vllm_rs_tpu
COPY pyproject.toml README.md ./
COPY csrc ./csrc
COPY vllm_rs_tpu ./vllm_rs_tpu
RUN pip install --no-cache-dir ".[hub,serve]"

EXPOSE 8000
ENTRYPOINT ["python", "-m", "vllm_rs_tpu.server"]
CMD ["--help"]
