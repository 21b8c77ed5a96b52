#!/usr/bin/env bash
# Launch a SafeKV-enabled server for the NDSS evaluation harness
# (re-creation of the reference's llama/qwen/deepseek launch scripts).
# Usage: ./launch_safekv_server.sh <model_path> [port] [extra args...]
set -e
MODEL=${1:?usage: launch_safekv_server.sh <model_path> [port]}
PORT=${2:-30000}
shift || true; shift || true
exec python -m sglang_security_tpu.launch_server \
  --model-path "$MODEL" \
  --port "$PORT" \
  --enable-safekv \
  "$@"
