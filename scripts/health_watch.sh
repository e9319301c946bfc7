#!/bin/bash
# Poll relay health; when healthy, run the full measurement battery
# (one program per process, serial).  Logs to stdout.
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
for i in $(seq 1 40); do
  out=$(timeout 420 python scripts/tpu_health.py 2>/dev/null | tail -1)
  echo "[watch $(date +%H:%M)] $out"
  if echo "$out" | grep -q HEALTHY; then
    echo "=== RECOVERED - running battery ==="
    echo "--- bench (DGM headline) ---"
    timeout 1800 python bench.py 2>/dev/null | tail -1
    echo "--- HEM step (default accum) ---"
    timeout 1800 python scripts/hem_step_probe.py --mode step 2>/dev/null | tail -1
    echo "--- HEM step accum=1 ---"
    timeout 1800 python scripts/hem_step_probe.py --mode step --accum 1 2>/dev/null | tail -1
    echo "--- HEM step gather warps ---"
    timeout 1800 python scripts/hem_step_probe.py --mode step --warp-method gather 2>/dev/null | tail -1
    echo "--- health after battery ---"
    timeout 420 python scripts/tpu_health.py 2>/dev/null | tail -1
    echo "=== BATTERY DONE ==="
    exit 0
  fi
  sleep 540
done
echo "=== never recovered ==="
exit 1
