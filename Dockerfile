# videosd_tpu backend image.
#
# The reference builds on nvcr.io tritonserver (CUDA/TensorRT,
# reference: Dockerfile:1-6); the TPU equivalent is a slim Python image with
# the libtpu-bundled JAX release — TPU access comes from the host TPU VM
# (privileged + /dev/accel*), not from the image.

FROM python:3.12-slim-bookworm

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libgl1 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY videosd_tpu/ videosd_tpu/
COPY client/ client/
COPY config.yaml .

# prebuild the native runtime library
RUN python -c "from videosd_tpu.runtime.framequeue import native_available; \
               assert native_available(), 'native build failed'"

EXPOSE 8080
CMD ["python3", "-m", "videosd_tpu.server.app", "--port", "8080"]
