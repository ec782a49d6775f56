#!/bin/bash
# Relay-outage capture chain: poll the axon relay until it answers, then
# run the pending TPU A/Bs (transfer modes, device GBDT) and a full bench
# capture, in priority order. Re-armable after VM resets (sessions G/H
# lost the previous instance; the 2026-08-19 reset lost session I's).
# Usage: nohup bash scripts/relay_capture_chain.sh > /tmp/capture_chain.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache

# Probe timeout must cover a COLD-cache remote compile (~3 min observed
# in bad weather); 90 s killed mid-compile forever (and the old assert
# used the wrong closed form: (8,128) ones -> (x @ x.T).sum() is
# 8*8*128, not 8*128*128 — the probe could never pass).
probe() {
  timeout 300 python - <<'EOF' >/dev/null 2>&1
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
echo "[chain] $(date -u +%H:%M:%S) RELAY IS BACK — transfer-mode A/B"

timeout 1200 python scripts/ab_stacked_put.py 4 > /tmp/ab_f16.txt 2>&1
echo "[chain] $(date -u +%H:%M:%S) transfer A/B done (rc=$?) — GBDT A/B"

timeout 1500 python scripts/ab_gbdt_tpu.py > /tmp/gbdt_ab.txt 2>&1
echo "[chain] $(date -u +%H:%M:%S) GBDT A/B done (rc=$?) — bench"

timeout 3000 python bench.py > /tmp/bench_r3.json 2>/tmp/bench_r3.err
echo "[chain] $(date -u +%H:%M:%S) bench done (rc=$?)"
tail -1 /tmp/bench_r3.json
