# TPU-host image for retrieval_based_object_detection_tpu.
#
# The reference shipped a python:3.10 + OpenCV-deps container with the repo
# bind-mounted (its Dockerfile:7-20) plus a separate Qdrant server
# container; here one image carries the whole framework — the gallery is
# in-process, so there is no database container to orchestrate.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

# JAX for the target platform: swap the extra for your accelerator
# (jax[tpu] on Cloud TPU VMs; plain jax for CPU smoke runs).
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax orbax-checkpoint einops numpy pillow \
        pandas scikit-learn matplotlib seaborn pytest

COPY pyproject.toml .
COPY retrieval_based_object_detection_tpu retrieval_based_object_detection_tpu
COPY bench.py __graft_entry__.py ./

RUN pip install --no-cache-dir -e .

# Pre-build the C++ host runtime so first use doesn't pay the compile.
RUN python -c "from retrieval_based_object_detection_tpu import native; \
               assert native.available()"

ENTRYPOINT ["python", "-m", "retrieval_based_object_detection_tpu.cli"]
CMD ["--help"]
