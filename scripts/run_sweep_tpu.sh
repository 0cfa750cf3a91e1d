#!/bin/bash
# Full tc/ts radius sweep (16..4096, leg+opt) on the real TPU chip, writing
# the four reference-schema CSVs (include/benchmark.h columns) into
# benchmarks/csv/. Server and client both run on this host; the chip is
# shared between the two processes (protocol stages are jitted and cached,
# so only the first radius pays compiles).
#
# Usage: scripts/run_sweep_tpu.sh [outdir] [profile] [port]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-benchmarks/csv}
PROFILE=${2:-tpu}
PORT=${3:-39411}
mkdir -p "$OUT"
export TPU_WORKER_HOSTNAMES=localhost
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_pplp

timeout 5400 python -m pplp_tpu.cli ts -p "$PORT" --profile "$PROFILE" \
  --out-leg "$OUT/server_leg.csv" --out-opt "$OUT/server_opt.csv" \
  > "$OUT/ts.log" 2>&1 &
TS_PID=$!
# Wait for the server to actually LISTEN (jax import + bind takes ~30s; a
# fixed sleep raced and the client died on ConnectionRefused). Poll the
# kernel socket table — connecting would consume the server's single
# accept().
for i in $(seq 1 90); do
  if python - "$PORT" <<'EOF'
import sys
port = int(sys.argv[1])
hexport = format(port, "04X")
for path in ("/proc/net/tcp", "/proc/net/tcp6"):
    try:
        rows = open(path).read().splitlines()[1:]
    except OSError:
        continue
    for row in rows:
        f = row.split()
        if f[3] == "0A" and f[1].rsplit(":", 1)[1] == hexport:
            sys.exit(0)  # 0A = LISTEN
sys.exit(1)
EOF
  then break; fi
  sleep 5
done
timeout 5400 python -m pplp_tpu.cli tc -p "$PORT" -d 12 -b 40 --profile "$PROFILE" \
  --out-leg "$OUT/client_leg.csv" --out-opt "$OUT/client_opt.csv" \
  > "$OUT/tc.log" 2>&1
RC=$?
wait "$TS_PID"
echo "tc rc=$RC; CSVs:"
ls -la "$OUT"
