# Deployment image — counterpart of the reference's Dockerfile
# (tensorflow 1.15 GPU base there; a JAX TPU base here). On Cloud TPU VMs
# the host libtpu is mounted in; for CPU smoke runs the image works as-is.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential cmake ninja-build zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace/vnet_tpu

COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY . .
# native host runtime
RUN cmake -B csrc/build -G Ninja csrc && ninja -C csrc/build

# data, config, logs and checkpoints ride volumes like the reference image
VOLUME ["/workspace/vnet_tpu/data", "/workspace/vnet_tpu/configs", \
        "/workspace/vnet_tpu/tmp/log", "/workspace/vnet_tpu/tmp/ckpt"]

# TensorBoard
EXPOSE 6006

CMD ["python", "main.py", "-p", "train", "--config_json", "configs/config.json"]
