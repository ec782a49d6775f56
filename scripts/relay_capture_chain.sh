#!/bin/bash
# Relay-outage capture chain: poll the axon relay until it answers, then
# run the pending A/B transfer-mode comparison and a full bench capture.
# Re-armable after VM resets (sessions G/H lost the previous instance).
# Usage: nohup bash scripts/relay_capture_chain.sh > /tmp/capture_chain.log 2>&1 &
set -u
cd /root/repo

probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, numpy as np
x = jax.device_put(np.ones((8, 128), np.float32))
assert float((x @ x.T).sum()) == 8 * 128 * 128
EOF
}

echo "[chain] $(date -u +%H:%M:%S) polling relay..."
until probe; do
  echo "[chain] $(date -u +%H:%M:%S) relay still down"
  sleep 180
done
echo "[chain] $(date -u +%H:%M:%S) RELAY IS BACK — running A/B"

timeout 2400 python scripts/ab_stacked_put.py > /tmp/ab_f16.txt 2>&1
echo "[chain] $(date -u +%H:%M:%S) A/B done (rc=$?) — running bench"

timeout 3000 python bench.py > /tmp/bench_r3.json 2>/tmp/bench_r3.err
echo "[chain] $(date -u +%H:%M:%S) bench done (rc=$?)"
tail -1 /tmp/bench_r3.json
