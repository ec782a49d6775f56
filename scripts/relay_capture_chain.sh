#!/bin/bash
# Relay-outage capture chain: poll the axon relay until it answers, then
# run the round's pending TPU work in priority order. Re-armable after VM
# resets (sessions G/H lost the previous instance; the 2026-08-19 reset
# lost session I's).
# Round-5 priorities: (1) a full bench capture — which also WARMS
# /root/jax_cache for the driver's capture of record, (2) the embed
# flush-width MFU probe (VERDICT r4 #7), (3) the full live-TPU suite.
# Usage: nohup bash scripts/relay_capture_chain.sh > /tmp/capture_chain.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
PY=/opt/venv/bin/python

# Probe timeout must cover a COLD-cache remote compile (~3 min observed
# in bad weather); 90 s killed mid-compile forever (and the old assert
# used the wrong closed form: (8,128) ones -> (x @ x.T).sum() is
# 8*8*128, not 8*128*128 — the probe could never pass).
probe() {
  timeout 300 $PY - <<'EOF' >/dev/null 2>&1
import jax, numpy as np
x = jax.device_put(np.ones((8, 128), np.float32))
assert float((x @ x.T).sum()) == 8 * 8 * 128
EOF
}

echo "[chain] $(date -u +%H:%M:%S) polling relay..."
until probe; do
  echo "[chain] $(date -u +%H:%M:%S) relay still down"
  sleep 120
done
echo "[chain] $(date -u +%H:%M:%S) RELAY IS BACK — bench capture (warms /root/jax_cache)"

timeout 3000 $PY bench.py > /tmp/bench_r5.json 2>/tmp/bench_r5.err
echo "[chain] $(date -u +%H:%M:%S) bench done (rc=$?)"
tail -1 /tmp/bench_r5.json

timeout 1800 $PY scripts/ab_embed_width.py > /tmp/ab_embed_width.txt 2>&1
echo "[chain] $(date -u +%H:%M:%S) embed-width A/B done (rc=$?)"

timeout 5400 $PY -m pytest tests/ -q > /tmp/tpu_suite_r5.txt 2>&1
echo "[chain] $(date -u +%H:%M:%S) live-TPU suite done (rc=$?)"
tail -3 /tmp/tpu_suite_r5.txt
