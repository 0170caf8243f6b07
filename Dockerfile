# Serve the FragNet-TPU interpretability app — analog of the reference
# Dockerfile (python:3.11-slim serving the Streamlit app on :8501).
FROM python:3.11-slim

WORKDIR /app
COPY pyproject.toml README.md ./
COPY fragnet_tpu ./fragnet_tpu
COPY configs ./configs

# CPU JAX is enough for serving; the chem engine falls back to the bundled
# pure-Python minichem when rdkit is absent (install .[chem] for RDKit).
RUN pip install --no-cache-dir -e .[viz]

EXPOSE 8501
HEALTHCHECK CMD python -c "import urllib.request; \
    urllib.request.urlopen('http://localhost:8501/_stcore/health')"

ENTRYPOINT ["streamlit", "run", "fragnet_tpu/interp/app.py", \
            "--server.port=8501", "--server.address=0.0.0.0"]
