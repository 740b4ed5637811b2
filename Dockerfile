# vtd_tpu serving image.
#
# Unlike the reference's GPU image (CUDA base + Postgres + Redis + Celery
# side-cars), a vtd_tpu node is self-contained: the API server, the
# worker thread pool, and the TPU runtime live in one process per host.
# On Cloud TPU VMs the base image should be a libtpu-enabled JAX image.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ ffmpeg libgl1 libglib2.0-0 && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /srv/vtd
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY vtd_tpu ./vtd_tpu
COPY pyproject.toml bench.py ./

# Pre-build the native tier (CTC beam decoder)
RUN python -c "from vtd_tpu.native import build; build()"

ENV VTD_HOST=0.0.0.0 VTD_PORT=8000
EXPOSE 8000 9090

HEALTHCHECK --interval=30s --timeout=5s \
    CMD python -c "import urllib.request as u; u.urlopen('http://localhost:8000/health', timeout=3)"

CMD ["python", "-m", "vtd_tpu.serve", "--host", "0.0.0.0", "--port", "8000"]
