# rassengine-tpu serving image.
# The reference needed three containers (opensearch + ollama + app,
# docker-compose.yml:4-51); this framework is one process — the index and the
# encoder live in-process on the accelerator.
FROM python:3.12-slim

WORKDIR /srv/rassengine

# jax[tpu] is provided by the TPU VM base image in production; the plain CPU
# wheel keeps this image self-contained for functional testing.
COPY requirements.txt ./
RUN pip install --no-cache-dir -r requirements.txt

COPY pyproject.toml ./
COPY rassengine_tpu ./rassengine_tpu
RUN pip install --no-cache-dir --no-build-isolation -e .

# shipped model checkpoints: production 1024-d bi-encoder (the reference
# serves mxbai-embed-large via ollama, main.py:67) + NLU fine-tunes
COPY encoder_model_prod ./encoder_model_prod
COPY intent_model ./intent_model
COPY ner_model ./ner_model

ENV PORT=8000 UPLOAD_PORT=8001 DATABASE_PATH=/data/rass_chat.db \
    UPLOAD_DIR=/data/uploads ENCODER_WEIGHTS_PATH=./encoder_model_prod
VOLUME /data
EXPOSE 8000 8001

CMD ["python", "-m", "rassengine_tpu.serve.app"]
