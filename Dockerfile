# TPU-VM image for the sensorium_tpu framework.
# Mirrors the reference's container story (/root/reference/Dockerfile:1-4 —
# a CUDA torch base plus pip requirements) for the JAX/TPU stack: the
# official jax TPU wheel set on a slim Python base, plus a native toolchain
# for the C++ host runtime (native/sensorium_host.cpp).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workdir
COPY pyproject.toml pyproject.toml
COPY sensorium_tpu sensorium_tpu
COPY native native
COPY configs configs
COPY scripts scripts
RUN pip3 install --no-cache-dir -e ".[tpu]" && make -C native
