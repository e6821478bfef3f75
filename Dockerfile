# motion-estimated-video-trimmer-tpu — deployment image for TPU VM hosts.
#
# The reference ships a multi-stage image that compiles FFmpeg 8.0 and
# jemalloc from source (reference Dockerfile:8-114); on a TPU VM the distro
# FFmpeg libraries suffice for decode/remux, and the TPU runtime (libtpu)
# comes from the jax[tpu] wheel.  Build context = repo root.
#
#   docker build -t mvtrim-tpu .
#   docker run --privileged --net=host \
#     -v /data/input:/input:ro -v /data/output:/output \
#     --env-file config/motion_trim.env mvtrim-tpu /input /output
#
# (--privileged/--net=host are the usual TPU-VM device-access requirements.)

FROM python:3.12-slim-bookworm AS build

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make pkg-config \
        libavformat-dev libavcodec-dev libavutil-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY native/ native/
RUN make -C native

FROM python:3.12-slim-bookworm

RUN apt-get update && apt-get install -y --no-install-recommends \
        libavformat59 libavcodec59 libavutil57 \
    && rm -rf /var/lib/apt/lists/*

# TPU-enabled JAX (pulls libtpu); pin to the tested minor.
RUN pip install --no-cache-dir "jax[tpu]>=0.9,<0.11" numpy \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

WORKDIR /app
COPY mvtrim_tpu/ mvtrim_tpu/
COPY config/ config/
COPY pyproject.toml README.md ./
COPY --from=build /app/native/libmvtrim_host.so native/libmvtrim_host.so
RUN pip install --no-cache-dir --no-deps .

ENV MVT_NATIVE_LIB=/app/native/libmvtrim_host.so \
    PYTHONUNBUFFERED=1

ENTRYPOINT ["motion_trim"]
